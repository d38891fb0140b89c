"""The workhorse: every registered query with an oracle must match DuckDB
on the same parquet — the local mirror of the driver's t2 gate."""

from __future__ import annotations

import pytest

from my_flink_1_10_2_spark.queries import all_queries
from tests.conftest import SF_DIR, assert_same_results

QUERIES = all_queries()
WITH_ORACLE = sorted(n for n, q in QUERIES.items() if q.oracle)
ROWS_ONLY = sorted(n for n, q in QUERIES.items() if not q.oracle)


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_query_matches_oracle(spark, duck, name):
    q = QUERIES[name]
    sdf = q.spark_fn(spark, SF_DIR)
    ddf = duck.execute(q.oracle).fetchdf()
    assert_same_results(sdf, ddf)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, name):
    q = QUERIES[name]
    sdf = q.spark_fn(spark, SF_DIR)
    assert sdf.count() >= 0
    assert len(sdf.schema.fields) > 0
