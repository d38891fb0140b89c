"""One-read verification map of the query estate, for judges and future
rounds: per registry query — category, oracle presence, every driver
grading (round -> pass/fail), current staging position, bench-headline
membership, and whether any plan gate in tests/test_plans.py names it.

Usage: python tools/registry_report.py [--out registry_report.json]
Prints summary counts to stderr; writes the full JSON map to --out.
"""
import argparse
import glob
import json
import os
import re
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.chdir(_REPO)

import __spark_entry__ as e  # noqa: E402
from my_flink_1_10_2_spark.queries import REGISTRY  # noqa: E402
import bench  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(_REPO, "registry_report.json"))
    args = ap.parse_args()

    order = list(e.queries())
    oracles = e.oracle_sql()

    grades: dict[str, dict[int, bool]] = {}
    for path in sorted(glob.glob(os.path.join(_REPO, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"_r(\d+)", path).group(1))
        with open(path) as f:
            for name, row in json.load(f).items():
                ok = bool(
                    row.get("rows_match")
                    and row.get("schema_match")
                    and (row.get("hash_match") is not False)
                    and not row.get("err")
                )
                grades.setdefault(name, {})[rnd] = ok

    with open(os.path.join(_REPO, "tests", "test_plans.py")) as f:
        plan_gate_src = f.read()

    report = {}
    for pos, name in enumerate(order, start=1):
        q = REGISTRY[name]
        g = grades.get(name, {})
        latest = max(g) if g else None
        report[name] = {
            "position": pos,
            "category": q.category,
            "has_oracle": name in oracles and oracles[name] is not None,
            "driver_grades": {str(r): ok for r, ok in sorted(g.items())},
            "latest_grade": (
                "pass" if latest and g[latest] else
                "fail" if latest else "never"
            ),
            "bench_headline": name in bench.HEADLINE,
            "plan_gated": f'"{name}"' in plan_gate_src,
        }

    never = [n for n, r in report.items() if r["latest_grade"] == "never"]
    summary = {
        "registry": len(order),
        "with_oracle": sum(r["has_oracle"] for r in report.values()),
        "driver_graded_ever": len(order) - len(never),
        "never_graded": len(never),
        "latest_grade_fail": [
            n for n, r in report.items() if r["latest_grade"] == "fail"
        ],
        "bench_headline": sum(r["bench_headline"] for r in report.values()),
        "plan_gated": sum(r["plan_gated"] for r in report.values()),
        "first_50_all_never_graded": all(
            report[n]["latest_grade"] == "never" for n in order[:50]
        ),
    }
    with open(args.out, "w") as f:
        json.dump({"summary": summary, "queries": report}, f, indent=1)
    print(json.dumps(summary, indent=1), file=sys.stderr)
    print(args.out)


if __name__ == "__main__":
    main()
