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


def _canon(df):
    """Canonicalize the dtype proxies the driver's value hash already
    tolerates (its hash stringifies values, so int32 vs int64 and
    datetime resolution never affect it): widen integer widths to int64
    and datetime resolutions to microseconds.  Values are converted too,
    so the exact-value pass compares like with like."""
    import numpy as np  # noqa: F401

    df = df.copy()
    for c in df.columns:
        dt = str(df[c].dtype)
        if dt in ("int8", "int16", "int32", "uint8", "uint16", "uint32", "uint64"):
            df[c] = df[c].astype("int64")
        elif dt.startswith("datetime64[") and not dt.startswith("datetime64[us"):
            inner = dt[len("datetime64[") : -1]  # "ns" or "ns, UTC"
            tz = inner.split(",", 1)[1].strip() if "," in inner else None
            df[c] = df[c].astype(f"datetime64[us, {tz}]" if tz else "datetime64[us]")
        elif dt == "float32":
            df[c] = df[c].astype("float64")
    return df


def _cell_eq(a, b):
    """Exact cell equality; ARRAY/LIST cells go through np.array_equal
    FIRST — a bare ``a == b`` on an ndarray returns an elementwise array
    whose truth value raises, which the old code caught and miscounted
    as a mismatch."""
    import numpy as np

    if a is None and b is None:
        return True
    if isinstance(a, (np.ndarray, list, tuple)) or isinstance(b, (np.ndarray, list, tuple)):
        if a is None or b is None:
            return False
        try:
            aa, bb = np.asarray(a), np.asarray(b)
            if aa.dtype.kind == "O" or bb.dtype.kind == "O":
                if aa.shape != bb.shape:
                    return False
                return all(_cell_eq(x, y) for x, y in zip(aa.ravel(), bb.ravel()))
            if aa.dtype.kind == "f" and bb.dtype.kind == "f":
                return bool(np.array_equal(aa.astype("f8"), bb.astype("f8"), equal_nan=True))
            return bool(np.array_equal(aa, bb))
        except Exception:
            return False
    try:
        if isinstance(a, float) and isinstance(b, float):
            return (math.isnan(a) and math.isnan(b)) or a == b
        if a == b:
            return True
        return repr(a) == repr(b)
    except Exception:
        return False


def compare(sdf, ddf):
    issues = []
    if sorted(sdf.columns) != sorted(ddf.columns):
        return [f"COLS spark={sorted(sdf.columns)} oracle={sorted(ddf.columns)}"]
    cols = sorted(sdf.columns)
    sdf = _canon(sdf.reindex(cols, axis=1))
    ddf = _canon(ddf.reindex(cols, axis=1))
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
            first = None
            for i in range(len(sv)):
                a, b = sv.iloc[i], dv.iloc[i]
                if _cell_eq(a, b):
                    continue
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
