"""Audit every oracle-backed registry query for driver-style strictness.

Runs each queries() entry and its oracle at sf0.01, compares:
  - pandas dtypes per column (a proxy for the driver's typed value hash)
  - exact values after sorting (no tolerance)

Prints one line per query: OK / DTYPE <cols> / VALUE <cols> / ERR.
"""

from __future__ import annotations

import math
import os
import sys
import traceback

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from my_flink_1_10_2_spark.session import get_spark  # noqa: E402
import __spark_entry__ as entry  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def compare(sdf, ddf):
    issues = []
    if sorted(sdf.columns) != sorted(ddf.columns):
        return [f"COLS spark={sorted(sdf.columns)} oracle={sorted(ddf.columns)}"]
    cols = sorted(sdf.columns)
    sdf = sdf.reindex(cols, axis=1)
    ddf = ddf.reindex(cols, axis=1)
    if len(sdf) != len(ddf):
        issues.append(f"ROWS {len(sdf)} vs {len(ddf)}")
        return issues
    dt = [c for c in cols if str(sdf[c].dtype) != str(ddf[c].dtype)]
    if dt:
        issues.append("DTYPE " + ", ".join(f"{c}({sdf[c].dtype}|{ddf[c].dtype})" for c in dt))
    if len(sdf) == 0:
        return issues
    # exact value check on sorted rows
    try:
        skey = sdf.astype(str).apply(lambda r: "\x00".join(r), axis=1)
        dkey = ddf.astype(str).apply(lambda r: "\x00".join(r), axis=1)
        s_sorted = sdf.loc[skey.sort_values(kind="mergesort").index].reset_index(drop=True)
        d_sorted = ddf.loc[dkey.sort_values(kind="mergesort").index].reset_index(drop=True)
        bad = []
        for c in cols:
            sv, dv = s_sorted[c], d_sorted[c]
            n_bad = 0
            for i in range(len(sv)):
                a, b = sv.iloc[i], dv.iloc[i]
                if a is None and b is None:
                    continue
                try:
                    if isinstance(a, float) and isinstance(b, float):
                        if (math.isnan(a) and math.isnan(b)) or a == b:
                            continue
                    elif a == b:
                        continue
                    elif repr(a) == repr(b):
                        continue
                    ok = False
                    try:
                        import numpy as np
                        ok = bool(np.array_equal(a, b))
                    except Exception:
                        ok = False
                    if ok:
                        continue
                except Exception:
                    pass
                n_bad += 1
                if n_bad == 1:
                    first = (i, repr(a)[:40], repr(b)[:40])
            if n_bad:
                bad.append(f"{c}[{n_bad}] e.g.{first}")
        if bad:
            issues.append("VALUE " + "; ".join(bad[:4]))
    except Exception as e:
        issues.append(f"CMPERR {e}")
    return issues


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2:] or None
    spark = get_spark(app_name="audit_exact", master="local[16]")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    qs = entry.queries()
    oracles = entry.oracle_sql()
    n_bad = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"{name:40s} SKIP (no oracle)")
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
            ddf = con.execute(sql).fetchdf()
            issues = compare(sdf, ddf)
        except Exception:
            issues = ["ERR " + traceback.format_exc(limit=2).replace("\n", " | ")[:300]]
        if issues:
            n_bad += 1
            print(f"{name:40s} " + " || ".join(issues))
        else:
            print(f"{name:40s} OK")
        sys.stdout.flush()
    print(f"\n{n_bad} queries with issues")


if __name__ == "__main__":
    main()
