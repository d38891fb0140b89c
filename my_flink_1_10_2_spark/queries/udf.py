"""User-defined aggregation surface (SURVEY §2.11): pandas UDAF,
table-UDAF (flatAggregate), and coGroup — the three reference features
whose Spark expression is Arrow-batched ``applyInPandas``.

These are the *sanctioned* Python paths: per-group logic that built-in
operators can't express. The batch arrives as Arrow (columnar, zero-copy
per batch), the shuffle is the same hash-by-key the reference pays, and
Python cost is O(|groups|) invocations, not O(|rows|).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from my_flink_1_10_2_spark.queries import read, register
from my_flink_1_10_2_spark.table import Table


@register(
    "q_udaf_median",
    oracle="""
    SELECT l_returnflag,
           med_qty,
           v[CAST(floor(h) AS BIGINT) + 1]
             + (h - floor(h)) * (v[CAST(ceil(h) AS BIGINT) + 1]
                                 - v[CAST(floor(h) AS BIGINT) + 1]) AS p90_price,
           n
    FROM (
      SELECT l_returnflag,
             median(l_quantity) AS med_qty,
             list_sort(list(l_extendedprice)) AS v,
             count(*) AS n,
             CAST(count(*) - 1 AS DOUBLE) * CAST(0.9 AS DOUBLE) AS h
      FROM lineitem GROUP BY l_returnflag)
    """,
    category="udf",
)
def q_udaf_median(spark, sf_dir):
    """Pandas UDAF (ref: AggregateFunction.java accumulate/getValue):
    exact median / p90 per group — a holistic aggregate Spark's built-ins
    only approximate (percentile_approx), so the UDAF path is the
    genuine use-case.  p90 spells the linear interpolation explicitly
    (lo + frac*(hi-lo), the same expression tree as the SQL oracle):
    pandas' quantile() and DuckDB's quantile_cont parenthesize the lerp
    differently — 1-ulp apart at sf0.1 though equal at sf0.01."""
    import math

    import numpy as np

    # project to the three columns the UDAF touches BEFORE the group
    # shuffle: applyInPandas is opaque to Catalyst, so without this the
    # exchange (and the Arrow transfer) carries all 11 lineitem columns
    l = Table(
        read(spark, sf_dir, "lineitem").select(
            "l_returnflag", "l_quantity", "l_extendedprice"
        )
    )

    def median_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        arr = np.sort(pdf["l_extendedprice"].to_numpy())
        h = float(len(arr) - 1) * 0.9
        lo, hi = arr[math.floor(h)], arr[math.ceil(h)]
        return pd.DataFrame(
            {
                "l_returnflag": [pdf["l_returnflag"].iloc[0]],
                "med_qty": [pdf["l_quantity"].median()],
                "p90_price": [lo + (h - math.floor(h)) * (hi - lo)],
                "n": [len(pdf)],
            }
        )

    return l.group_by("l_returnflag").aggregate_pandas(
        median_fn, "l_returnflag string, med_qty double, p90_price double, n long"
    ).df


@register(
    "q_flat_aggregate_top2",
    oracle="""
    SELECT l_returnflag, rnk, l_orderkey, l_linenumber, l_extendedprice
    FROM (
      SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
             row_number() OVER (PARTITION BY l_returnflag
                                ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rnk
      FROM lineitem
    ) WHERE rnk <= 2
    """,
    category="udf",
)
def q_flat_aggregate_top2(spark, sf_dir):
    """Table-UDAF (ref: TableAggregateFunction.java Top2 example,
    Table.flatAggregate:1136): emits N rows per group."""
    l = Table(read(spark, sf_dir, "lineitem"))

    def top2(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["l_extendedprice", "l_orderkey", "l_linenumber"],
            ascending=[False, True, True],
            kind="mergesort",
        ).head(2)
        out = pdf[["l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice"]].copy()
        out.insert(1, "rnk", range(1, len(pdf) + 1))
        return out

    return l.group_by("l_returnflag").flat_aggregate(
        top2,
        "l_returnflag string, rnk long, l_orderkey long, l_linenumber int, l_extendedprice double",
    ).df


@register(
    "q_cogroup_nation_balance",
    oracle="""
    SELECT COALESCE(c.k, s.k) AS nationkey,
           COALESCE(c.n_customers, 0) AS n_customers,
           COALESCE(s.n_suppliers, 0) AS n_suppliers,
           round(c.avg_cust_bal, 6) AS avg_cust_bal,
           round(s.avg_supp_bal, 6) AS avg_supp_bal
    FROM (SELECT c_nationkey AS k, count(*) AS n_customers,
                 avg(c_acctbal) AS avg_cust_bal
          FROM customer GROUP BY c_nationkey) c
    FULL OUTER JOIN
         (SELECT s_nationkey AS k, count(*) AS n_suppliers,
                 avg(s_acctbal) AS avg_supp_bal
          FROM supplier GROUP BY s_nationkey) s
    ON c.k = s.k
    """,
    category="udf",
)
def q_cogroup_nation_balance(spark, sf_dir):
    """coGroup (ref: DataSet.coGroup:1009): both sides' complete groups
    in one function call, outer semantics when a key is absent on one
    side."""
    c = Table(
        read(spark, sf_dir, "customer").select(
            F.col("c_nationkey").alias("nationkey"), F.col("c_acctbal")
        )
    )
    s = read(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey"), F.col("s_acctbal")
    )

    def combine(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        key = left["nationkey"].iloc[0] if len(left) else right["nationkey"].iloc[0]
        return pd.DataFrame(
            {
                "nationkey": [key],
                "n_customers": [len(left)],
                "n_suppliers": [len(right)],
                "avg_cust_bal": [left["c_acctbal"].mean() if len(left) else None],
                "avg_supp_bal": [right["s_acctbal"].mean() if len(right) else None],
            }
        )

    out = c.group_by("nationkey").co_group(
        s,
        combine,
        "nationkey int, n_customers long, n_suppliers long, avg_cust_bal double, avg_supp_bal double",
    ).df
    return out.withColumn("avg_cust_bal", F.round("avg_cust_bal", 6)).withColumn(
        "avg_supp_bal", F.round("avg_supp_bal", 6)
    )


@register(
    "q_async_enrich",
    oracle="""
    SELECT n_nationkey, n_name,
           length(n_name)    AS name_len,
           n_nationkey * 2   AS double_key
    FROM nation
    """,
    category="udf",
)
def q_async_enrich(spark, sf_dir):
    """Async I/O enrichment (ref: AsyncDataStream.java:103 orderedWait):
    the lookup here is a deterministic local coroutine so the oracle can
    replay it in SQL; in production it's an HTTP/KV call batched by the
    same operator."""
    import asyncio

    from my_flink_1_10_2_spark.operators.async_io import async_enrich

    async def lookup(row):
        await asyncio.sleep(0)  # yield point — stands in for network I/O
        return {"name_len": len(row["n_name"]), "double_key": row["n_nationkey"] * 2}

    nation = read(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return async_enrich(
        nation, lookup, "n_nationkey int, n_name string, name_len int, double_key int"
    )


@register(
    "q_pyflink_udf_api",
    oracle="""
    SELECT p_brand,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(round(p_retailprice * 100) AS BIGINT) * 2 + 7)
                AS BIGINT) AS adj_cents
    FROM part GROUP BY p_brand
    """,
    category="udf",
)
def q_pyflink_udf_api(spark, sf_dir):
    """The PyFlink ``udf()`` decorator surface graded e2e (ref:
    flink-python pyflink/table/udf.py — udf(f, result_type=...) used in
    SQL): a vectorized scalar function declared through the compat API
    (compiled to an Arrow pandas_udf, never a row-at-a-time eval),
    registered by name, applied in SQL, and the rollup must equal the
    closed-form oracle."""
    from my_flink_1_10_2_spark.functions.udf_api import udf
    from my_flink_1_10_2_spark.types import DataTypes

    adjust = udf(
        lambda cents: cents * 2 + 7, result_type=DataTypes.BIGINT()
    )
    spark.udf.register("adjust_cents", adjust)
    read(spark, sf_dir, "part").select(
        "p_brand",
        F.round(F.col("p_retailprice") * 100).cast("bigint").alias("cents"),
    ).createOrReplaceTempView("part_cents")
    return spark.sql(
        """
        SELECT p_brand,
               count(*) AS n,
               CAST(sum(adjust_cents(cents)) AS BIGINT) AS adj_cents
        FROM part_cents GROUP BY p_brand
        """
    )
