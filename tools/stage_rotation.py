"""Print the recommended `_FLAGSHIP_ORDER` prefix for the next round.

The driver grades the first 50 registry entries each round, so the
prefix should be exactly the queries with no driver-oracle row yet
(the round-N sample rotation).  This tool reads every
CORRECTNESS_r0*.json, diffs against the live registry, and prints the
never-graded names in their current relative order — paste the first
50 (or all of them) at the top of `queries/__init__.py::_FLAGSHIP_ORDER`.

Usage: python tools/stage_rotation.py
"""
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.chdir(_REPO)

import __spark_entry__ as e  # noqa: E402
from my_flink_1_10_2_spark.queries import _driver_graded_names  # noqa: E402

# single source of truth: only fully-GREEN rows count (a failed row
# re-enters the prefix so the driver re-grades it after the fix)
graded = _driver_graded_names()

order = list(e.queries())
never = [q for q in order if q not in graded]
print(
    f"# registry {len(order)} | driver-graded ever {len(graded & set(order))} "
    f"| never graded {len(never)}",
    file=sys.stderr,
)
print(f"# prefix staging check: first 50 never-graded? "
      f"{all(q not in graded for q in order[:50])}", file=sys.stderr)
for q in never:
    print(f'    "{q}",')
