"""TPC-DS-shaped decision-support queries over the driver star schema.

The reference's largest end-to-end gate is TPC-DS: 103 query files with
golden answers (ref: flink-end-to-end-tests/flink-tpcds-test/tpcds-tool/
{query,answer_set}/, run by test-scripts/test_tpcds.sh:22 at SCALE=1).
The driver schema has no store/web/catalog channels, so each query here
adapts a TPC-DS *shape* — the join topology, windowing, rollup, and
self-join-on-period structures TPC-DS exercises beyond TPC-H — onto the
`orders`/`lineitem`/`part`/`customer` star.

Scale notes (100 TB discipline): every report aggregates the fact table
once (partial/final hash agg before any shuffle); period-over-period
self-joins happen AFTER aggregation, so the joined relations are
|groups|-sized, not |rows|-sized; dimensions broadcast.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from my_flink_1_10_2_spark.queries import read, register


def _revenue():
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


@register(
    "ds_brand_year_report",
    oracle="""
    SELECT year(o_orderdate) AS o_year, p_brand,
           sum(l_extendedprice * (1 - l_discount)) AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                  JOIN part ON l_partkey = p_partkey
    WHERE p_type = 'PROMO'
    GROUP BY year(o_orderdate), p_brand
    ORDER BY revenue DESC, o_year, p_brand
    LIMIT 25
    """,
    category="tpcds",
)
def ds_brand_year_report(spark, sf_dir):
    """TPC-DS Q3 shape: date-dim × item × fact report with TopN.

    The part dimension is filtered BEFORE the broadcast, so the fact
    rows for other types never survive the join probe."""
    l = read(spark, sf_dir, "lineitem")
    o = read(spark, sf_dir, "orders")
    p = read(spark, sf_dir, "part").where(F.col("p_type") == "PROMO")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy(F.year("o_orderdate").alias("o_year"), "p_brand")
        .agg(F.sum(_revenue()).alias("revenue"))
        .orderBy(F.desc("revenue"), "o_year", "p_brand")
        .limit(25)
    )


@register(
    "ds_rollup_geo_report",
    oracle="""
    SELECT r_name, n_name,
           sum(l_extendedprice * (1 - l_discount)) AS revenue,
           grouping(r_name) + grouping(n_name) AS agg_level
    FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
    WHERE o_orderdate >= TIMESTAMP '1998-01-01'
      AND o_orderdate < TIMESTAMP '1999-01-01'
    GROUP BY ROLLUP (r_name, n_name)
    """,
    category="tpcds",
)
def ds_rollup_geo_report(spark, sf_dir):
    """TPC-DS Q5/Q77 shape: ROLLUP totals over a joined star
    (ref: DecomposeGroupingSetsRule.scala:205 plans the same Expand).

    grouping() flags disambiguate the NULL subtotal rows exactly as the
    reference's GROUPING_ID (FlinkSqlOperatorTable.java:880-882)."""
    l = read(spark, sf_dir, "lineitem")
    o = read(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp_ntz"))
    )
    c = read(spark, sf_dir, "customer")
    n = read(spark, sf_dir, "nation")
    r = read(spark, sf_dir, "region")
    star = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    return star.rollup("r_name", "n_name").agg(
        F.sum(_revenue()).alias("revenue"),
        (F.grouping("r_name") + F.grouping("n_name")).alias("agg_level"),
    )


@register(
    "ds_yoy_growth",
    oracle="""
    WITH yearly AS (
      SELECT p_brand, year(o_orderdate) AS o_year,
             sum(l_quantity) AS qty
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                    JOIN part ON l_partkey = p_partkey
      GROUP BY p_brand, year(o_orderdate)
    )
    SELECT cur.p_brand, cur.o_year, cur.qty AS cur_qty, prev.qty AS prev_qty,
           round(cur.qty / prev.qty, 6) AS growth
    FROM yearly cur JOIN yearly prev
      ON cur.p_brand = prev.p_brand AND cur.o_year = prev.o_year + 1
    WHERE cur.qty / prev.qty > 1.2
    """,
    category="tpcds",
)
def ds_yoy_growth(spark, sf_dir):
    """TPC-DS Q75 shape: period-over-period self-join on the AGGREGATED
    relation (|brands × years| rows, not fact rows), growth filter."""
    l = read(spark, sf_dir, "lineitem")
    o = read(spark, sf_dir, "orders")
    p = read(spark, sf_dir, "part")
    yearly = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("p_brand", F.year("o_orderdate").alias("o_year"))
        .agg(F.sum("l_quantity").alias("qty"))
    )
    cur, prev = yearly.alias("cur"), yearly.alias("prev")
    return (
        cur.join(
            prev,
            (F.col("cur.p_brand") == F.col("prev.p_brand"))
            & (F.col("cur.o_year") == F.col("prev.o_year") + 1),
        )
        .where(F.col("cur.qty") / F.col("prev.qty") > 1.2)
        .select(
            F.col("cur.p_brand").alias("p_brand"),
            F.col("cur.o_year").alias("o_year"),
            F.col("cur.qty").alias("cur_qty"),
            F.col("prev.qty").alias("prev_qty"),
            F.round(F.col("cur.qty") / F.col("prev.qty"), 6).alias("growth"),
        )
    )


@register(
    "ds_revenue_share",
    oracle="""
    WITH base AS (
      SELECT p_type, p_brand,
             sum(l_extendedprice * (1 - l_discount)) AS revenue
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY p_type, p_brand
    )
    SELECT p_type, p_brand, revenue,
           round(revenue * 100.0 / sum(revenue) OVER (PARTITION BY p_type), 6)
             AS revenue_ratio
    FROM base
    """,
    category="tpcds",
)
def ds_revenue_share(spark, sf_dir):
    """TPC-DS Q98 shape: share-of-class via windowed sum over the
    aggregated relation (window input is |type × brand|, tiny)."""
    l = read(spark, sf_dir, "lineitem")
    p = read(spark, sf_dir, "part")
    base = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("p_type", "p_brand")
        .agg(F.sum(_revenue()).alias("revenue"))
    )
    share = F.col("revenue") * 100.0 / F.sum("revenue").over(W.partitionBy("p_type"))
    return base.select(
        "p_type", "p_brand", "revenue", F.round(share, 6).alias("revenue_ratio")
    )


@register(
    "ds_cumulative_channels",
    oracle="""
    WITH f AS (
      SELECT l_returnflag AS flag, year(o_orderdate) AS o_year,
             month(o_orderdate) AS o_month,
             sum(l_extendedprice * (1 - l_discount)) AS rev
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE l_returnflag IN ('A', 'R')
      GROUP BY l_returnflag, year(o_orderdate), month(o_orderdate)
    ),
    cum AS (
      SELECT flag, o_year, o_month,
             sum(rev) OVER (PARTITION BY flag ORDER BY o_year, o_month
                            ROWS UNBOUNDED PRECEDING) AS cum_rev
      FROM f
    )
    SELECT a.o_year, a.o_month,
           round(a.cum_rev, 4) AS cum_a, round(r.cum_rev, 4) AS cum_r
    FROM cum a JOIN cum r
      ON a.o_year = r.o_year AND a.o_month = r.o_month
    WHERE a.flag = 'A' AND r.flag = 'R' AND a.cum_rev > r.cum_rev
    """,
    category="tpcds",
)
def ds_cumulative_channels(spark, sf_dir):
    """TPC-DS Q51 shape: running totals per channel compared month-by-
    month (two cumulative windows joined on the period)."""
    l = read(spark, sf_dir, "lineitem").where(F.col("l_returnflag").isin("A", "R"))
    o = read(spark, sf_dir, "orders")
    f = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("l_returnflag").alias("flag"),
            F.year("o_orderdate").alias("o_year"),
            F.month("o_orderdate").alias("o_month"),
        )
        .agg(F.sum(_revenue()).alias("rev"))
    )
    w = W.partitionBy("flag").orderBy("o_year", "o_month").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    cum = f.select("flag", "o_year", "o_month", F.sum("rev").over(w).alias("cum_rev"))
    a = cum.where(F.col("flag") == "A").alias("a")
    r = cum.where(F.col("flag") == "R").alias("r")
    return (
        a.join(
            r,
            (F.col("a.o_year") == F.col("r.o_year"))
            & (F.col("a.o_month") == F.col("r.o_month")),
        )
        .where(F.col("a.cum_rev") > F.col("r.cum_rev"))
        .select(
            F.col("a.o_year").alias("o_year"),
            F.col("a.o_month").alias("o_month"),
            F.round(F.col("a.cum_rev"), 4).alias("cum_a"),
            F.round(F.col("r.cum_rev"), 4).alias("cum_r"),
        )
    )


@register(
    "ds_count_buckets",
    oracle="""
    WITH per_order AS (
      SELECT o_orderkey, count(*) AS n_items, sum(l_quantity) AS total_qty
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      GROUP BY o_orderkey
    )
    SELECT
      sum(CASE WHEN n_items BETWEEN 1 AND 2 THEN 1 ELSE 0 END) AS small_orders,
      sum(CASE WHEN n_items BETWEEN 3 AND 5 THEN 1 ELSE 0 END) AS mid_orders,
      sum(CASE WHEN n_items > 5 THEN 1 ELSE 0 END) AS large_orders,
      sum(CASE WHEN total_qty > 100 THEN 1 ELSE 0 END) AS bulk_orders
    FROM per_order
    """,
    category="tpcds",
)
def ds_count_buckets(spark, sf_dir):
    """TPC-DS Q96/Q9 shape: conditional-count buckets in one pass
    (a single aggregate replaces N scalar subqueries — the rewrite the
    reference's planner applies to Q9-style CASE pivots)."""
    o = read(spark, sf_dir, "orders")
    l = read(spark, sf_dir, "lineitem")
    per_order = (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .groupBy("o_orderkey")
        .agg(F.count("*").alias("n_items"), F.sum("l_quantity").alias("total_qty"))
    )
    return per_order.agg(
        F.sum(F.when(F.col("n_items").between(1, 2), 1).otherwise(0)).alias("small_orders"),
        F.sum(F.when(F.col("n_items").between(3, 5), 1).otherwise(0)).alias("mid_orders"),
        F.sum(F.when(F.col("n_items") > 5, 1).otherwise(0)).alias("large_orders"),
        F.sum(F.when(F.col("total_qty") > 100, 1).otherwise(0)).alias("bulk_orders"),
    )


@register(
    "ds_monthly_deviation",
    oracle="""
    WITH monthly AS (
      SELECT p_brand, year(o_orderdate) AS o_year, month(o_orderdate) AS o_month,
             sum(l_extendedprice * (1 - l_discount)) AS rev
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                    JOIN part ON l_partkey = p_partkey
      GROUP BY p_brand, year(o_orderdate), month(o_orderdate)
    ),
    with_avg AS (
      SELECT p_brand, o_year, o_month, rev,
             avg(rev) OVER (PARTITION BY p_brand, o_year) AS avg_year,
             lag(rev)  OVER (PARTITION BY p_brand ORDER BY o_year, o_month) AS prev_rev,
             lead(rev) OVER (PARTITION BY p_brand ORDER BY o_year, o_month) AS next_rev
      FROM monthly
    )
    SELECT p_brand, o_year, o_month,
           round(rev, 4) AS rev, round(avg_year, 4) AS avg_year,
           round(prev_rev, 4) AS prev_rev, round(next_rev, 4) AS next_rev
    FROM with_avg
    WHERE avg_year > 0 AND rev / avg_year > 1.5
    """,
    category="tpcds",
)
def ds_monthly_deviation(spark, sf_dir):
    """TPC-DS Q47 shape: monthly series per brand with same-year mean and
    lag/lead neighbors; keep months >1.5× their yearly mean. Window input
    is the aggregated |brand × month| relation."""
    l = read(spark, sf_dir, "lineitem")
    o = read(spark, sf_dir, "orders")
    p = read(spark, sf_dir, "part")
    monthly = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy(
            "p_brand",
            F.year("o_orderdate").alias("o_year"),
            F.month("o_orderdate").alias("o_month"),
        )
        .agg(F.sum(_revenue()).alias("rev"))
    )
    w_year = W.partitionBy("p_brand", "o_year")
    w_seq = W.partitionBy("p_brand").orderBy("o_year", "o_month")
    enriched = monthly.select(
        "p_brand",
        "o_year",
        "o_month",
        "rev",
        F.avg("rev").over(w_year).alias("avg_year"),
        F.lag("rev").over(w_seq).alias("prev_rev"),
        F.lead("rev").over(w_seq).alias("next_rev"),
    )
    return enriched.where(
        (F.col("avg_year") > 0) & (F.col("rev") / F.col("avg_year") > 1.5)
    ).select(
        "p_brand",
        "o_year",
        "o_month",
        F.round("rev", 4).alias("rev"),
        F.round("avg_year", 4).alias("avg_year"),
        F.round("prev_rev", 4).alias("prev_rev"),
        F.round("next_rev", 4).alias("next_rev"),
    )


@register(
    "ds_frequent_buyers",
    oracle="""
    WITH mid_orders AS (
      SELECT o_orderkey, o_custkey
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      GROUP BY o_orderkey, o_custkey
      HAVING count(*) BETWEEN 3 AND 5
    ),
    frequent AS (
      SELECT o_custkey, count(*) AS n_mid_orders
      FROM mid_orders GROUP BY o_custkey HAVING count(*) >= 3
    )
    SELECT c_custkey, c_name, c_mktsegment, n_mid_orders
    FROM frequent JOIN customer ON o_custkey = c_custkey
    """,
    category="tpcds",
)
def ds_frequent_buyers(spark, sf_dir):
    """TPC-DS Q34 shape: per-order size HAVING band → per-customer
    frequency HAVING → join back to the dimension for details. Both
    HAVINGs are post-aggregation filters on |orders| / |customers|-sized
    relations; the customer join broadcasts."""
    o = read(spark, sf_dir, "orders")
    l = read(spark, sf_dir, "lineitem")
    c = read(spark, sf_dir, "customer")
    mid = (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .groupBy("o_orderkey", "o_custkey")
        .agg(F.count("*").alias("n_items"))
        .where(F.col("n_items").between(3, 5))
    )
    freq = (
        mid.groupBy("o_custkey")
        .agg(F.count("*").alias("n_mid_orders"))
        .where(F.col("n_mid_orders") >= 3)
    )
    return freq.join(F.broadcast(c), freq.o_custkey == c.c_custkey).select(
        "c_custkey", "c_name", "c_mktsegment", "n_mid_orders"
    )
