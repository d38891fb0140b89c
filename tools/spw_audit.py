"""Registry-wide single-partition-window audit: build every registry
query's physical plan (no execution beyond what query construction
itself triggers) and report each query whose plan contains an
``Exchange SinglePartition`` feeding a Window — the unpartitioned-OVER
shape that funnels row data through one task at scale.

Usage: python tools/spw_audit.py [--sf SF] [name ...]
Prints one line per offending query + the Window node; exits 0 always
(the pytest gate in tests/test_plans.py enforces the whitelist).
"""
import os
import sys
import traceback

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.chdir(_REPO)

import __spark_entry__ as e
from my_flink_1_10_2_spark import plans
from my_flink_1_10_2_spark.session import get_spark

_args = sys.argv[1:]
_sf = "0.001"
if "--sf" in _args:
    i = _args.index("--sf")
    _sf = _args[i + 1]
    del _args[i : i + 2]
SF = f"/root/testdata/sf{_sf}"
spark = get_spark(master="local[16]")
spark.sparkContext.setLogLevel("ERROR")

qs = e.queries()
names = _args if _args else list(qs)
flagged, errors = [], []
for i, name in enumerate(names):
    try:
        hits = plans.single_partition_windows(qs[name](spark, SF))
    except Exception:
        errors.append(name)
        print(f"[{i+1}/{len(names)}] {name}: BUILD ERROR", flush=True)
        traceback.print_exc()
        continue
    if hits:
        flagged.append(name)
        for h in hits:
            print(f"[{i+1}/{len(names)}] {name}: {h[:160]}", flush=True)
print(f"\nAUDIT DONE: {len(names)} queries, {len(flagged)} with "
      f"single-partition windows, {len(errors)} build errors")
print("flagged:", sorted(flagged))
if errors:
    print("errors:", sorted(errors))
