"""Salting equivalence tests: salted plans must return bit-identical
results to their unsalted forms — only the partitioning differs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from my_flink_1_10_2_spark.operators.skew import salted_agg, salted_join
from my_flink_1_10_2_spark.queries import read
from tests.conftest import SF_DIR


def _sorted_rows(df):
    return sorted(map(tuple, df.collect()))


def test_salted_inner_join_equivalent(spark):
    lineitem = read(spark, SF_DIR, "lineitem").select("l_orderkey", "l_partkey", "l_quantity")
    part = read(spark, SF_DIR, "part").select(
        F.col("p_partkey").alias("l_partkey"), "p_brand"
    )
    plain = lineitem.join(part, ["l_partkey"])
    salted = salted_join(lineitem, part, on=["l_partkey"], salt=4)
    assert _sorted_rows(salted.select(*plain.columns)) == _sorted_rows(plain)


def test_salted_left_join_equivalent(spark):
    orders = read(spark, SF_DIR, "orders").select("o_orderkey", "o_custkey")
    # keep only a subset of customers so left-outer nulls actually occur
    cust = (
        read(spark, SF_DIR, "customer")
        .where(F.col("c_custkey") % 3 == 0)
        .select(F.col("c_custkey").alias("o_custkey"), "c_name")
    )
    plain = orders.join(cust, ["o_custkey"], "left")
    salted = salted_join(orders, cust, on=["o_custkey"], how="left", salt=4)
    assert _sorted_rows(salted.select(*plain.columns)) == _sorted_rows(plain)


def test_salted_agg_equivalent(spark):
    lineitem = read(spark, SF_DIR, "lineitem")
    plain = lineitem.groupBy("l_returnflag").agg(
        F.sum("l_quantity").alias("s"),
        F.count("l_quantity").alias("c"),
        F.min("l_discount").alias("mn"),
        F.max("l_discount").alias("mx"),
        F.avg("l_extendedprice").alias("a"),
    )
    salted = salted_agg(
        lineitem,
        ["l_returnflag"],
        {
            "s": ("sum", "l_quantity"),
            "c": ("count", "l_quantity"),
            "mn": ("min", "l_discount"),
            "mx": ("max", "l_discount"),
            "a": ("avg", "l_extendedprice"),
        },
        salt=8,
    )
    got = {r.l_returnflag: r for r in salted.collect()}
    for r in plain.collect():
        g = got[r.l_returnflag]
        assert g.s == pytest.approx(r.s) and g.c == r.c
        assert g.mn == r.mn and g.mx == r.mx
        assert g.a == pytest.approx(r.a)


def test_unsupported_shapes_rejected(spark):
    df = read(spark, SF_DIR, "nation")
    with pytest.raises(ValueError):
        salted_join(df, df, on=["n_nationkey"], how="full")
    with pytest.raises(ValueError):
        salted_agg(df, ["n_regionkey"], {"x": ("collect_list", "n_name")})
