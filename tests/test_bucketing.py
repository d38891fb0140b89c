"""Bucketed co-located joins (operators/bucketing.py): the plan gates
that prove the Exchange (and Sort) really disappear.

The reference expresses the same intent with partitionByHash + ship-
strategy FORWARD reuse; at 100 TB this is the difference between two
full shuffles per fact-to-fact join per run and zero.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from my_flink_1_10_2_spark import plans
from my_flink_1_10_2_spark.operators.bucketing import read_bucketed, write_bucketed
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def bucketed_pair(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    write_bucketed(
        orders, "b_orders", 8, "o_orderkey",
        sort_by=["o_orderkey"], path=str(base / "o"),
    )
    write_bucketed(
        lineitem, "b_lineitem", 8, "l_orderkey",
        sort_by=["l_orderkey"], path=str(base / "l"),
    )
    yield "b_orders", "b_lineitem"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


@pytest.fixture()
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_has_no_exchange(spark, bucketed_pair, no_broadcast):
    t1, t2 = bucketed_pair
    j = read_bucketed(spark, t1).join(
        read_bucketed(spark, t2),
        F.col("o_orderkey") == F.col("l_orderkey"),
    )
    plan = plans.explain_str(j, mode="simple")
    assert "SortMergeJoin" in plan, plan
    assert plans.num_shuffles(j) == 0, plan


def test_bucketed_write_one_file_per_bucket(spark, bucketed_pair):
    """The pre-repartition in write_bucketed keeps the layout at one
    file per bucket — without it every task writes a sliver of every
    bucket (tasks x buckets files, the small-file failure mode at
    scale)."""
    import re

    from pyspark.sql.catalog import Catalog  # noqa: F401 (catalog warm)

    for table in bucketed_pair:
        loc = (
            spark.sql(f"DESCRIBE TABLE EXTENDED {table}")
            .where(F.col("col_name") == "Location")
            .first()
            .data_type
        )
        files = [
            f
            for f in __import__("os").listdir(loc.removeprefix("file:"))
            if f.endswith(".parquet")
        ]
        buckets = {re.search(r"_(\d{5})\.", f).group(1) for f in files}
        assert len(files) == 8, files
        assert len(buckets) == 8


def test_unbucketed_join_does_shuffle(spark, no_broadcast):
    """Control: the same join off raw parquet pays two Exchanges."""
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    j = orders.join(lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
    assert plans.num_shuffles(j) >= 2


def test_bucketed_groupby_has_no_exchange(spark, bucketed_pair):
    """Aggregation on the bucket key also reuses the layout."""
    t2 = bucketed_pair[1]
    agg = read_bucketed(spark, t2).groupBy("l_orderkey").agg(
        F.sum("l_quantity").alias("q")
    )
    assert plans.num_shuffles(agg) == 0


def test_bucketed_join_matches_unbucketed_results(spark, bucketed_pair, no_broadcast):
    t1, t2 = bucketed_pair
    got = (
        read_bucketed(spark, t1)
        .join(read_bucketed(spark, t2), F.col("o_orderkey") == F.col("l_orderkey"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("l_quantity").cast("bigint")).alias("q"),
        )
        .first()
    )
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    want = (
        orders.join(lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("l_quantity").cast("bigint")).alias("q"),
        )
        .first()
    )
    assert (got.n, got.q) == (want.n, want.q)
