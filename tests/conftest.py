"""Shared fixtures: one SparkSession per test session + the DuckDB oracle.

Mirrors the driver's correctness protocol (FIXTURES.md): run the engine
query and the oracle SQL over the identical parquet files, compare row
sets order-insensitively with numeric tolerance.
"""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd
import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


@pytest.fixture(scope="session")
def spark():
    from my_flink_1_10_2_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_TEST_CPUS", "8")
    spark = get_spark(app_name="tests", master=f"local[{cpus}]")
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    yield con
    con.close()


def _canon(v):
    if v is None:
        return None
    try:
        if isinstance(v, float) and math.isnan(v):
            return None
    except (TypeError, ValueError):
        pass
    if isinstance(v, float):
        return round(v, 4)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return tuple(_canon(x) for x in v)
    return v


def _normalize(df: pd.DataFrame) -> tuple[list[str], list[tuple]]:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.astype(object).where(pd.notnull(df), None)
    rows = [tuple(_canon(v) for v in row) for row in df.itertuples(index=False, name=None)]
    return list(df.columns), sorted(rows, key=repr)


def assert_same_results(spark_df, duck_df: pd.DataFrame, rel_tol: float = 1e-6, abs_tol: float = 1e-2):
    """Order-insensitive compare with numeric tolerance (FIXTURES.md:
    0.01 absolute on doubles, per the reference's TpchResultComparator)."""
    left = spark_df.toPandas()
    right = duck_df
    assert sorted(left.columns) == sorted(right.columns), (
        f"column mismatch: spark={sorted(left.columns)} oracle={sorted(right.columns)}"
    )
    assert len(left) == len(right), f"row count: spark={len(left)} oracle={len(right)}"
    lcols, lrows = _normalize(left)
    _, rrows = _normalize(right)
    mismatches = []
    for i, (lrow, rrow) in enumerate(zip(lrows, rrows)):
        for c, (lv, rv) in enumerate(zip(lrow, rrow)):
            if lv == rv:
                continue
            if isinstance(lv, (int, float)) and isinstance(rv, (int, float)) and lv is not None and rv is not None:
                if math.isclose(float(lv), float(rv), rel_tol=rel_tol, abs_tol=abs_tol):
                    continue
            mismatches.append((i, lcols[c], lv, rv))
            if len(mismatches) >= 5:
                break
        if len(mismatches) >= 5:
            break
    assert not mismatches, f"value mismatches (row, col, spark, oracle): {mismatches}"
