"""Exact (hash-style) Spark-vs-DuckDB comparison for one registry query.

Usage: python scripts/exact_compare.py q_math_functions [sf_dir]

Mirrors the driver gate more strictly than tests/conftest.py: no numeric
tolerance — reports every column whose exact values differ after sorting
rows, so ULP-level mismatches that the tolerance comparator hides show up.
"""

from __future__ import annotations

import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from my_flink_1_10_2_spark.session import get_spark  # noqa: E402
import __spark_entry__ as entry  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def main():
    qname = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="exact_compare", master="local[8]")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    q = entry.queries()[qname]
    sql = entry.oracle_sql().get(qname)
    if sql is None:
        print("no oracle for", qname)
        return

    sdf = q(spark, sf_dir).toPandas()
    ddf = con.execute(sql).fetchdf()

    scols, dcols = sorted(sdf.columns), sorted(ddf.columns)
    print("columns equal:", scols == dcols)
    sdf = sdf.reindex(scols, axis=1)
    ddf = ddf.reindex(dcols, axis=1)
    print("rows:", len(sdf), len(ddf))

    key = [c for c in scols]
    s_sorted = sdf.sort_values(key, kind="mergesort").reset_index(drop=True)
    d_sorted = ddf.sort_values(key, kind="mergesort").reset_index(drop=True)
    bad_cols = {}
    for c in scols:
        sv, dv = s_sorted[c], d_sorted[c]
        for i in range(len(sv)):
            a, b = sv.iloc[i], dv.iloc[i]
            if a is None and b is None:
                continue
            try:
                import math

                if isinstance(a, float) and isinstance(b, float):
                    if (math.isnan(a) and math.isnan(b)) or a == b:
                        continue
                elif a == b:
                    continue
                elif repr(a) == repr(b):
                    continue
            except Exception:
                pass
            bad_cols.setdefault(c, []).append((i, repr(a), repr(b), type(a).__name__, type(b).__name__))
    for c, rows in bad_cols.items():
        print(f"\nCOLUMN {c}: {len(rows)} mismatches; first 3:")
        for r in rows[:3]:
            print("  ", r)
    if not bad_cols:
        print("EXACT MATCH")


if __name__ == "__main__":
    main()
