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
from my_flink_1_10_2_spark.operators.hints import dim


def _revenue():
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


@register(
    "ds_brand_year_report",
    oracle="""
    SELECT year(o_orderdate) AS o_year, p_brand,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
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
        .join(dim(p), l.l_partkey == p.p_partkey)
        .groupBy(F.year("o_orderdate").alias("o_year"), "p_brand")
        .agg(F.round(F.sum(_revenue()), 4).alias("revenue"))
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
        .join(dim(c), o.o_custkey == c.c_custkey)
        .join(dim(n), c.c_nationkey == n.n_nationkey)
        .join(dim(r), n.n_regionkey == r.r_regionkey)
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
        .join(dim(p), l.l_partkey == p.p_partkey)
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
        l.join(dim(p), l.l_partkey == p.p_partkey)
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
      CAST(sum(CASE WHEN n_items BETWEEN 1 AND 2 THEN 1 ELSE 0 END) AS BIGINT) AS small_orders,
      CAST(sum(CASE WHEN n_items BETWEEN 3 AND 5 THEN 1 ELSE 0 END) AS BIGINT) AS mid_orders,
      CAST(sum(CASE WHEN n_items > 5 THEN 1 ELSE 0 END) AS BIGINT) AS large_orders,
      CAST(sum(CASE WHEN total_qty > 100 THEN 1 ELSE 0 END) AS BIGINT) AS bulk_orders
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
             CAST(round(sum(l_extendedprice * (1 - l_discount)) * 10000) AS BIGINT) AS rev_i
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                    JOIN part ON l_partkey = p_partkey
      GROUP BY p_brand, year(o_orderdate), month(o_orderdate)
    ),
    with_avg AS (
      SELECT p_brand, o_year, o_month, rev_i,
             avg(rev_i) OVER (PARTITION BY p_brand, o_year) AS avg_year_i,
             lag(rev_i)  OVER (PARTITION BY p_brand ORDER BY o_year, o_month) AS prev_rev_i,
             lead(rev_i) OVER (PARTITION BY p_brand ORDER BY o_year, o_month) AS next_rev_i
      FROM monthly
    )
    SELECT p_brand, o_year, o_month,
           rev_i / 10000.0 AS rev, round(avg_year_i / 10000.0, 4) AS avg_year,
           prev_rev_i / 10000.0 AS prev_rev, next_rev_i / 10000.0 AS next_rev
    FROM with_avg
    WHERE avg_year_i > 0 AND rev_i / avg_year_i > 1.5
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
        .join(dim(p), l.l_partkey == p.p_partkey)
        .groupBy(
            "p_brand",
            F.year("o_orderdate").alias("o_year"),
            F.month("o_orderdate").alias("o_month"),
        )
        .agg(F.round(F.sum(_revenue()) * 10000).cast("bigint").alias("rev_i"))
    )
    # integer 1e-4 units end to end (the ds_brand_month_deviation
    # discipline): the window average and the 1.5x ratio compare exact
    # bigints / identical IEEE divisions on both engines, so no value can
    # sit on a rounding boundary (round-2 sweep caught a 1e-4 flip here).
    w_year = W.partitionBy("p_brand", "o_year")
    w_seq = W.partitionBy("p_brand").orderBy("o_year", "o_month")
    enriched = monthly.select(
        "p_brand",
        "o_year",
        "o_month",
        "rev_i",
        F.avg("rev_i").over(w_year).alias("avg_year_i"),
        F.lag("rev_i").over(w_seq).alias("prev_rev_i"),
        F.lead("rev_i").over(w_seq).alias("next_rev_i"),
    )
    return enriched.where(
        (F.col("avg_year_i") > 0) & (F.col("rev_i") / F.col("avg_year_i") > 1.5)
    ).select(
        "p_brand",
        "o_year",
        "o_month",
        (F.col("rev_i") / 10000.0).alias("rev"),
        F.round(F.col("avg_year_i") / 10000.0, 4).alias("avg_year"),
        (F.col("prev_rev_i") / 10000.0).alias("prev_rev"),
        (F.col("next_rev_i") / 10000.0).alias("next_rev"),
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
    return freq.join(dim(c), freq.o_custkey == c.c_custkey).select(
        "c_custkey", "c_name", "c_mktsegment", "n_mid_orders"
    )


@register(
    "ds_returns_above_avg",
    oracle="""
    WITH cust_returns AS (
      SELECT c_custkey, c_nationkey,
             CAST(round(sum(l_extendedprice * (1 - l_discount)) * 10000) AS BIGINT) AS ret_amt_i
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                    JOIN customer ON o_custkey = c_custkey
      WHERE l_returnflag = 'R'
      GROUP BY c_custkey, c_nationkey
    ),
    nation_avg AS (
      SELECT c_nationkey, avg(ret_amt_i) AS avg_ret_i
      FROM cust_returns GROUP BY c_nationkey
    )
    SELECT cr.c_custkey, n_name, cr.ret_amt_i / 10000.0 AS ret_amt
    FROM cust_returns cr
    JOIN nation_avg na ON cr.c_nationkey = na.c_nationkey
    JOIN nation ON cr.c_nationkey = n_nationkey
    WHERE cr.ret_amt_i > 1.2 * na.avg_ret_i
    """,
    category="tpcds",
)
def ds_returns_above_avg(spark, sf_dir):
    """TPC-DS Q1 shape: CTE on CTE — per-customer return totals, then a
    per-nation average OF that aggregate, then customers above 1.2× their
    nation's mean. Both aggregates are |customers|-sized; the second agg
    and the final join never touch the fact table again."""
    l = read(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    o = read(spark, sf_dir, "orders")
    c = read(spark, sf_dir, "customer")
    n = read(spark, sf_dir, "nation")
    cust_returns = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(dim(c), o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_nationkey")
        .agg(F.round(F.sum(_revenue()) * 10000).cast("bigint").alias("ret_amt_i"))
    )
    # integer 1e-4 units: the nation average and 1.2x membership compare
    # exact bigints / identical IEEE divisions on both engines
    nation_avg = cust_returns.groupBy("c_nationkey").agg(
        F.avg("ret_amt_i").alias("avg_ret_i")
    )
    return (
        cust_returns.join(dim(nation_avg), "c_nationkey")
        .join(dim(n), F.col("c_nationkey") == n.n_nationkey)
        .where(F.col("ret_amt_i") > 1.2 * F.col("avg_ret_i"))
        .select(
            "c_custkey", "n_name", (F.col("ret_amt_i") / 10000.0).alias("ret_amt")
        )
    )


@register(
    "ds_frequent_best_items",
    oracle="""
    WITH frequent_items AS (
      SELECT l_partkey
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY l_partkey
      HAVING count(DISTINCT date_trunc('month', o_orderdate)) >= 4
    ),
    cust_rev AS (
      SELECT o_custkey,
             CAST(round(sum(l_extendedprice * (1 - l_discount)) * 10000) AS BIGINT) AS rev_i
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY o_custkey
    ),
    best_customers AS (
      SELECT o_custkey FROM cust_rev
      WHERE rev_i > 1.5 * (SELECT avg(rev_i) FROM cust_rev)
    )
    SELECT round(sum(l_extendedprice * (1 - l_discount)), 4) AS total_rev,
           count(*) AS n_sales
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_partkey IN (SELECT l_partkey FROM frequent_items)
      AND o_custkey IN (SELECT o_custkey FROM best_customers)
    """,
    category="tpcds",
)
def ds_frequent_best_items(spark, sf_dir):
    """TPC-DS Q23 shape: two independently-derived entity sets (frequent
    items: sold in ≥4 distinct months; best customers: spend >1.5× the
    mean) intersected against the fact table via semi joins. Both sets
    are aggregates — small — so they broadcast into the final fact scan."""
    l = read(spark, sf_dir, "lineitem")
    o = read(spark, sf_dir, "orders")
    fact = l.join(o, l.l_orderkey == o.o_orderkey)
    frequent = (
        fact.groupBy("l_partkey")
        .agg(F.countDistinct(F.date_trunc("month", "o_orderdate")).alias("n_months"))
        .where(F.col("n_months") >= 4)
        .select("l_partkey")
    )
    cust_rev = fact.groupBy("o_custkey").agg(
        F.round(F.sum(_revenue()) * 10000).cast("bigint").alias("rev_i")
    )
    avg_rev = cust_rev.agg(F.avg("rev_i").alias("avg_rev_i"))
    best = (
        cust_rev.join(dim(avg_rev))
        .where(F.col("rev_i") > 1.5 * F.col("avg_rev_i"))
        .select("o_custkey")
    )
    return (
        fact.join(dim(frequent), "l_partkey", "left_semi")
        .join(dim(best), "o_custkey", "left_semi")
        .agg(
            F.round(F.sum(_revenue()), 4).alias("total_rev"),
            F.count("*").alias("n_sales"),
        )
    )


@register(
    "ds_hour_bucket_pivot",
    oracle="""
    SELECT
      (SELECT count(*) FROM events WHERE hour(ts) BETWEEN 0  AND 2 ) AS h0,
      (SELECT count(*) FROM events WHERE hour(ts) BETWEEN 3  AND 5 ) AS h1,
      (SELECT count(*) FROM events WHERE hour(ts) BETWEEN 6  AND 8 ) AS h2,
      (SELECT count(*) FROM events WHERE hour(ts) BETWEEN 9  AND 11) AS h3,
      (SELECT count(*) FROM events WHERE hour(ts) BETWEEN 12 AND 14) AS h4,
      (SELECT count(*) FROM events WHERE hour(ts) BETWEEN 15 AND 17) AS h5,
      (SELECT count(*) FROM events WHERE hour(ts) BETWEEN 18 AND 20) AS h6,
      (SELECT count(*) FROM events WHERE hour(ts) BETWEEN 21 AND 23) AS h7
    """,
    category="tpcds",
)
def ds_hour_bucket_pivot(spark, sf_dir):
    """TPC-DS Q88 shape: the 8-scalar-subquery time-bucket pivot. The
    oracle keeps Q88's literal 8-subquery topology; the engine applies
    the planner rewrite the reference would want — ONE fact scan with 8
    conditional counts (8 scans → 1 at 100 TB)."""
    e = read(spark, sf_dir, "events").select(F.hour("ts").alias("h"))
    aggs = [
        F.sum(F.when(F.col("h").between(3 * i, 3 * i + 2), 1).otherwise(0))
        .cast("long")
        .alias(f"h{i}")
        for i in range(8)
    ]
    return e.agg(*aggs)


@register(
    "ds_wide_two_year_join",
    oracle="""
    WITH py AS (
      SELECT l_partkey AS pk, o_custkey AS ck, year(o_orderdate) AS yr,
             sum(l_extendedprice * (1 - l_discount)) AS rev
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY l_partkey, o_custkey, year(o_orderdate)
    )
    SELECT p_brand, c_mktsegment, n_name, r_name, a.pk AS partkey,
           a.ck AS custkey,
           round(a.rev, 4) AS rev_y1, round(b.rev, 4) AS rev_y2
    FROM py a
    JOIN py b ON a.pk = b.pk AND a.ck = b.ck AND a.yr = 1996 AND b.yr = 1997
             AND b.rev > a.rev
    JOIN part     ON a.pk = p_partkey
    JOIN customer ON a.ck = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    """,
    category="tpcds",
)
def ds_wide_two_year_join(spark, sf_dir):
    """TPC-DS Q64 shape: a wide multi-table join around a same-entity
    two-period comparison ((part, customer) revenue in 1996 vs 1997,
    keep growers), with all four dimensions broadcast onto it.

    The two periods are CONDITIONAL AGGREGATES of one (part, customer)
    rollup — one lineitem ⋈ orders pass and no self-join — instead of
    the per-year self-join of the same aggregate, whose two branches
    each re-ran the fact join (Spark shares no identical subtrees).  A
    (pk, ck) group missing either year yields a NULL side and is
    filtered exactly like the old inner self-join's absent row."""
    l = read(spark, sf_dir, "lineitem")
    o = read(spark, sf_dir, "orders")
    p = read(spark, sf_dir, "part")
    c = read(spark, sf_dir, "customer")
    n = read(spark, sf_dir, "nation")
    r = read(spark, sf_dir, "region")
    yr = F.year("o_orderdate")
    py = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .where(yr.isin(1996, 1997))
        .groupBy(
            F.col("l_partkey").alias("pk"),
            F.col("o_custkey").alias("ck"),
        )
        .agg(
            F.sum(F.when(yr == 1996, _revenue())).alias("rev_a"),
            F.sum(F.when(yr == 1997, _revenue())).alias("rev_b"),
        )
        .where(
            F.col("rev_a").isNotNull()
            & F.col("rev_b").isNotNull()
            & (F.col("rev_b") > F.col("rev_a"))
        )
    )
    return (
        py.join(dim(p), F.col("pk") == p.p_partkey)
        .join(dim(c), F.col("ck") == c.c_custkey)
        .join(dim(n), c.c_nationkey == n.n_nationkey)
        .join(dim(r), n.n_regionkey == r.r_regionkey)
        .select(
            "p_brand",
            "c_mktsegment",
            "n_name",
            "r_name",
            F.col("pk").alias("partkey"),
            F.col("ck").alias("custkey"),
            F.round(F.col("rev_a"), 4).alias("rev_y1"),
            F.round(F.col("rev_b"), 4).alias("rev_y2"),
        )
    )


@register(
    "ds_channel_union_report",
    oracle="""
    WITH unioned AS (
      SELECT 'returned' AS channel, year(o_orderdate) AS o_year, l_quantity,
             l_extendedprice * (1 - l_discount) AS rev
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE l_returnflag = 'R'
      UNION ALL
      SELECT 'kept-async' AS channel, year(o_orderdate) AS o_year, l_quantity,
             l_extendedprice * (1 - l_discount) AS rev
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE l_returnflag = 'A'
      UNION ALL
      SELECT 'kept-normal' AS channel, year(o_orderdate) AS o_year, l_quantity,
             l_extendedprice * (1 - l_discount) AS rev
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE l_returnflag = 'N'
    )
    SELECT channel, o_year, count(*) AS n_rows,
           round(sum(l_quantity), 4) AS total_qty, round(sum(rev), 4) AS total_rev
    FROM unioned GROUP BY channel, o_year
    """,
    category="tpcds",
)
def ds_channel_union_report(spark, sf_dir):
    """TPC-DS Q76/Q71 shape: UNION ALL of per-channel branches with a
    synthesized channel literal, aggregated over the union. Each branch
    filters at the scan; the union itself adds no shuffle (the exchange
    happens once, at the group-by)."""
    l = read(spark, sf_dir, "lineitem")
    o = read(spark, sf_dir, "orders")
    fact = l.join(o, l.l_orderkey == o.o_orderkey)

    def branch(flag: str, channel: str):
        return fact.where(F.col("l_returnflag") == flag).select(
            F.lit(channel).alias("channel"),
            F.year("o_orderdate").alias("o_year"),
            "l_quantity",
            _revenue().alias("rev"),
        )

    unioned = (
        branch("R", "returned")
        .unionByName(branch("A", "kept-async"))
        .unionByName(branch("N", "kept-normal"))
    )
    return unioned.groupBy("channel", "o_year").agg(
        F.count("*").alias("n_rows"),
        F.round(F.sum("l_quantity"), 4).alias("total_qty"),
        F.round(F.sum("rev"), 4).alias("total_rev"),
    )


@register(
    "ds_loyal_customers_intersect",
    oracle="""
    SELECT count(*) AS n_loyal FROM (
      SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
      INTERSECT
      SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997
      INTERSECT
      SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1998
    )
    """,
    category="tpcds",
)
def ds_loyal_customers_intersect(spark, sf_dir):
    """TPC-DS Q38/Q87 shape: three-way INTERSECT of per-period entity
    sets, counted. Each leg aggregates to distinct keys before the
    intersects, so the set operation runs on |customers|-sized inputs."""
    o = read(spark, sf_dir, "orders")

    def year_keys(y: int):
        return o.where(F.year("o_orderdate") == y).select("o_custkey").distinct()

    loyal = year_keys(1996).intersect(year_keys(1997)).intersect(year_keys(1998))
    return loyal.agg(F.count("*").alias("n_loyal"))


@register(
    "ds_rollup_rank",
    oracle="""
    WITH sales AS (
      SELECT p_type, p_brand,
             sum(l_extendedprice * (1 - l_discount)) AS revenue
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY ROLLUP (p_type, p_brand)
    ),
    ranked AS (
      SELECT p_type, p_brand, revenue,
             row_number() OVER (PARTITION BY p_type
                                ORDER BY revenue DESC, p_brand NULLS FIRST) AS rk
      FROM sales
    )
    SELECT p_type, p_brand, round(revenue, 4) AS revenue, rk
    FROM ranked WHERE rk <= 3
    """,
    category="tpcds",
)
def ds_rollup_rank(spark, sf_dir):
    """TPC-DS Q67 shape: rank WITHIN the rollup output — subtotal rows
    (NULL dims) compete in the same window as detail rows. The window
    input is the |type × brand| aggregate, not the fact table."""
    l = read(spark, sf_dir, "lineitem")
    p = read(spark, sf_dir, "part")
    sales = (
        l.join(dim(p), l.l_partkey == p.p_partkey)
        .rollup("p_type", "p_brand")
        .agg(F.sum(_revenue()).alias("revenue"))
    )
    w = W.partitionBy("p_type").orderBy(
        F.desc("revenue"), F.asc_nulls_first("p_brand")
    )
    return (
        sales.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
        .select("p_type", "p_brand", F.round("revenue", 4).alias("revenue"), "rk")
    )


@register(
    "ds_monthly_pivot_matrix",
    oracle="""
    SELECT n_name, year(o_orderdate) AS o_year,
    """
    + ",\n    ".join(
        f"round(sum(CASE WHEN month(o_orderdate) = {m} THEN "
        f"l_extendedprice * (1 - l_discount) ELSE 0 END), 4) AS m{m:02d}"
        for m in range(1, 13)
    )
    + """
    FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name, year(o_orderdate)
    """,
    category="tpcds",
)
def ds_monthly_pivot_matrix(spark, sf_dir):
    """TPC-DS Q66 shape: the 12-column CASE pivot — one row per
    (nation, year) with a revenue column per month, all twelve computed
    in a single aggregation pass."""
    l = read(spark, sf_dir, "lineitem")
    o = read(spark, sf_dir, "orders")
    c = read(spark, sf_dir, "customer")
    n = read(spark, sf_dir, "nation")
    fact = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(dim(c), o.o_custkey == c.c_custkey)
        .join(dim(n), c.c_nationkey == n.n_nationkey)
    )
    aggs = [
        F.round(
            F.sum(
                F.when(F.month("o_orderdate") == m, _revenue()).otherwise(F.lit(0.0))
            ),
            4,
        ).alias(f"m{m:02d}")
        for m in range(1, 13)
    ]
    return fact.groupBy("n_name", F.year("o_orderdate").alias("o_year")).agg(*aggs)


@register(
    "ds_cohort_revenue",
    oracle="""
    WITH first_order AS (
      SELECT o_custkey, min(year(o_orderdate)) AS cohort_year
      FROM orders GROUP BY o_custkey
    )
    SELECT cohort_year, year(o_orderdate) AS o_year,
           count(DISTINCT o.o_custkey) AS n_customers,
           round(sum(o_totalprice), 4) AS cohort_rev
    FROM orders o JOIN first_order f ON o.o_custkey = f.o_custkey
    GROUP BY cohort_year, year(o_orderdate)
    """,
    category="tpcds",
)
def ds_cohort_revenue(spark, sf_dir):
    """Retention-cohort report (TPC-DS Q54 new-customer shape): the
    cohort dimension is DERIVED from the fact table (min order year per
    customer), then joined back and cut by (cohort, activity) year.
    The derived dimension is |customers|-sized → broadcast."""
    o = read(spark, sf_dir, "orders")
    first = o.groupBy("o_custkey").agg(
        F.min(F.year("o_orderdate")).alias("cohort_year")
    )
    return (
        o.join(dim(first), "o_custkey")
        .groupBy("cohort_year", F.year("o_orderdate").alias("o_year"))
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.round(F.sum("o_totalprice"), 4).alias("cohort_rev"),
        )
    )


@register(
    "ds_double_rank_band",
    oracle="""
    WITH per_part AS (
      SELECT l_partkey, sum(l_extendedprice * (1 - l_discount)) AS rev,
             sum(l_quantity) AS qty
      FROM lineitem GROUP BY l_partkey
    ),
    ranked AS (
      SELECT l_partkey, rev, qty,
             row_number() OVER (ORDER BY rev DESC, l_partkey) AS rev_rank,
             row_number() OVER (ORDER BY qty DESC, l_partkey) AS qty_rank
      FROM per_part
    )
    SELECT l_partkey, round(rev, 4) AS rev, round(qty, 4) AS qty,
           rev_rank, qty_rank
    FROM ranked WHERE rev_rank <= 15 OR qty_rank <= 15
    """,
    category="tpcds",
)
def ds_double_rank_band(spark, sf_dir):
    """TPC-DS Q49 shape: the same aggregated relation ranked under two
    different orderings, rows kept when EITHER rank clears the band.
    Both ranks are EXACT global row_numbers computed with the
    range-partitioned two-pass operator (operators/rank.global_rank) —
    no single-task window even over the aggregate, so the same plan
    survives a part table 1000x larger."""
    l = read(spark, sf_dir, "lineitem")
    per_part = l.groupBy("l_partkey").agg(
        F.sum(_revenue()).alias("rev"), F.sum("l_quantity").alias("qty")
    )
    from my_flink_1_10_2_spark.operators.rank import global_rank

    ranked = global_rank(
        per_part, [F.desc("rev"), F.asc("l_partkey")], "rev_rank"
    )
    ranked = global_rank(
        ranked, [F.desc("qty"), F.asc("l_partkey")], "qty_rank"
    )
    return (
        ranked
        .where((F.col("rev_rank") <= 15) | (F.col("qty_rank") <= 15))
        .select(
            "l_partkey",
            F.round("rev", 4).alias("rev"),
            F.round("qty", 4).alias("qty"),
            "rev_rank",
            "qty_rank",
        )
    )
