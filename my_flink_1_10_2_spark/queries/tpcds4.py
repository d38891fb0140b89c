"""TPC-DS query shapes, fourth batch — adapted to the driver's TPC-H-ish
star schema (reference gate:
flink-end-to-end-tests/flink-tpcds-test/tpcds-tool/query/*.sql, run by
test-scripts/test_tpcds.sh:22). Shapes this batch: Q43 day-of-week
pivot, Q62/Q99 shipping-latency bucket pivot, Q28 six-bucket distinct
stats, Q48 multi-OR quantity sum, Q44 best/worst performer join, Q39
mean/stdev consecutive-period pairs, Q61 promotional-revenue ratio, Q97
channel-overlap counts, Q33/Q56/Q60 triple-channel brand report, Q50
fulfillment-latency pivot per supplier nation.

Channel emulation as in earlier batches: o_orderpriority carves
"channels". Ratios and big double sums are rounded on BOTH sides;
conditional-count sums CAST to BIGINT on the oracle side.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from my_flink_1_10_2_spark.queries import read, register
from my_flink_1_10_2_spark.operators.hints import dim


def _rev():
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


_REV_SQL = "l_extendedprice * (1 - l_discount)"


@register(
    "ds_dow_pivot",
    oracle=f"""
    SELECT n_name,
           round(sum(CASE WHEN dayofweek(o_orderdate) = 0 THEN {_REV_SQL} ELSE 0 END), 4) AS sun_rev,
           round(sum(CASE WHEN dayofweek(o_orderdate) = 1 THEN {_REV_SQL} ELSE 0 END), 4) AS mon_rev,
           round(sum(CASE WHEN dayofweek(o_orderdate) = 2 THEN {_REV_SQL} ELSE 0 END), 4) AS tue_rev,
           round(sum(CASE WHEN dayofweek(o_orderdate) = 3 THEN {_REV_SQL} ELSE 0 END), 4) AS wed_rev,
           round(sum(CASE WHEN dayofweek(o_orderdate) = 4 THEN {_REV_SQL} ELSE 0 END), 4) AS thu_rev,
           round(sum(CASE WHEN dayofweek(o_orderdate) = 5 THEN {_REV_SQL} ELSE 0 END), 4) AS fri_rev,
           round(sum(CASE WHEN dayofweek(o_orderdate) = 6 THEN {_REV_SQL} ELSE 0 END), 4) AS sat_rev
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE year(o_orderdate) = 1997
    GROUP BY n_name
    """,
    category="tpcds",
)
def ds_dow_pivot(spark, sf_dir):
    """TPC-DS Q43 shape: revenue pivoted across the seven weekdays per
    sales unit (nation here, store there). One Expand-free conditional
    aggregation — 7 CASE sums in a single two-phase hash aggregate.

    DuckDB dayofweek() is 0=Sunday; Spark dayofweek() is 1=Sunday, so the
    engine side subtracts 1 to align."""
    li = read(spark, sf_dir, "lineitem")
    o = read(spark, sf_dir, "orders").where(F.year("o_orderdate") == 1997)
    c = read(spark, sf_dir, "customer")
    n = read(spark, sf_dir, "nation")
    dow = F.dayofweek("o_orderdate") - 1
    names = ["sun", "mon", "tue", "wed", "thu", "fri", "sat"]
    aggs = [
        F.round(F.sum(F.when(dow == i, _rev()).otherwise(F.lit(0))), 4).alias(f"{nm}_rev")
        for i, nm in enumerate(names)
    ]
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(dim(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(*aggs)
    )


@register(
    "ds_ship_latency_pivot",
    oracle="""
    SELECT o_orderpriority,
           CAST(sum(CASE WHEN datediff('day', o_orderdate, l_shipdate) <= 30 THEN 1 ELSE 0 END) AS BIGINT) AS d30,
           CAST(sum(CASE WHEN datediff('day', o_orderdate, l_shipdate) > 30
                          AND datediff('day', o_orderdate, l_shipdate) <= 60 THEN 1 ELSE 0 END) AS BIGINT) AS d60,
           CAST(sum(CASE WHEN datediff('day', o_orderdate, l_shipdate) > 60
                          AND datediff('day', o_orderdate, l_shipdate) <= 90 THEN 1 ELSE 0 END) AS BIGINT) AS d90,
           CAST(sum(CASE WHEN datediff('day', o_orderdate, l_shipdate) > 90 THEN 1 ELSE 0 END) AS BIGINT) AS dmore
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    WHERE year(o_orderdate) = 1997
    GROUP BY o_orderpriority
    """,
    category="tpcds",
)
def ds_ship_latency_pivot(spark, sf_dir):
    """TPC-DS Q62/Q99 shape: order-to-ship latency bucketed into 30-day
    bands and pivoted per "ship mode" (order priority here). The latency
    CASE chain is evaluated at scan time; one shuffle on the group key."""
    li = read(spark, sf_dir, "lineitem")
    o = read(spark, sf_dir, "orders").where(F.year("o_orderdate") == 1997)
    lat = F.datediff("l_shipdate", "o_orderdate")
    df = li.join(o, li.l_orderkey == o.o_orderkey)
    return df.groupBy("o_orderpriority").agg(
        F.sum(F.when(lat <= 30, 1).otherwise(0)).cast("bigint").alias("d30"),
        F.sum(F.when((lat > 30) & (lat <= 60), 1).otherwise(0)).cast("bigint").alias("d60"),
        F.sum(F.when((lat > 60) & (lat <= 90), 1).otherwise(0)).cast("bigint").alias("d90"),
        F.sum(F.when(lat > 90, 1).otherwise(0)).cast("bigint").alias("dmore"),
    )


@register(
    "ds_bucket_distinct_stats",
    oracle="""
    SELECT b1.avg_price AS avg_b1, b1.cnt AS cnt_b1, b1.nd AS nd_b1,
           b2.avg_price AS avg_b2, b2.cnt AS cnt_b2, b2.nd AS nd_b2,
           b3.avg_price AS avg_b3, b3.cnt AS cnt_b3, b3.nd AS nd_b3
    FROM
      (SELECT round(avg(l_extendedprice), 4) AS avg_price, count(*) AS cnt,
              count(DISTINCT l_partkey) AS nd
       FROM lineitem WHERE l_quantity BETWEEN 1 AND 15) b1,
      (SELECT round(avg(l_extendedprice), 4) AS avg_price, count(*) AS cnt,
              count(DISTINCT l_partkey) AS nd
       FROM lineitem WHERE l_quantity BETWEEN 16 AND 35) b2,
      (SELECT round(avg(l_extendedprice), 4) AS avg_price, count(*) AS cnt,
              count(DISTINCT l_partkey) AS nd
       FROM lineitem WHERE l_quantity BETWEEN 36 AND 50) b3
    """,
    category="tpcds",
)
def ds_bucket_distinct_stats(spark, sf_dir):
    """TPC-DS Q28 shape: independent quantity-band subqueries, each with
    avg + count + count(distinct), cross-joined into one wide row.

    Spark-first: one scan with three conditional aggregates would need
    three count-distincts in one Expand; keeping the literal three-
    subquery cross join matches the reference plan and AQE collapses the
    1x1x1 join to a local exchange."""
    li = read(spark, sf_dir, "lineitem")

    def bucket(lo, hi, tag):
        return (
            li.where(F.col("l_quantity").between(lo, hi))
            .agg(
                F.round(F.avg("l_extendedprice"), 4).alias(f"avg_{tag}"),
                F.count("*").alias(f"cnt_{tag}"),
                F.count_distinct("l_partkey").alias(f"nd_{tag}"),
            )
        )

    return bucket(1, 15, "b1").crossJoin(bucket(16, 35, "b2")).crossJoin(bucket(36, 50, "b3"))


@register(
    "ds_or_quantity_sum",
    oracle="""
    SELECT CAST(sum(l_quantity) AS DOUBLE) AS total_qty,
           count(*) AS n_lines
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    WHERE (o_orderpriority = '1-URGENT' AND l_quantity BETWEEN 1 AND 20
           AND l_discount BETWEEN 0.00 AND 0.05)
       OR (o_orderpriority = '2-HIGH' AND l_quantity BETWEEN 10 AND 40
           AND l_discount BETWEEN 0.02 AND 0.08)
       OR (o_orderpriority = '3-MEDIUM' AND l_quantity BETWEEN 20 AND 50
           AND l_discount BETWEEN 0.05 AND 0.10)
    """,
    category="tpcds",
)
def ds_or_quantity_sum(spark, sf_dir):
    """TPC-DS Q48 shape: one big disjunction of band predicates (the
    optimizer-stress query — each OR arm pairs a dimension value with
    different measure ranges). Catalyst keeps it one scan + one filter;
    nothing shuffles until the final scalar aggregate."""
    li = read(spark, sf_dir, "lineitem")
    o = read(spark, sf_dir, "orders")
    df = li.join(o, li.l_orderkey == o.o_orderkey)
    arm1 = (
        (F.col("o_orderpriority") == "1-URGENT")
        & F.col("l_quantity").between(1, 20)
        & F.col("l_discount").between(0.00, 0.05)
    )
    arm2 = (
        (F.col("o_orderpriority") == "2-HIGH")
        & F.col("l_quantity").between(10, 40)
        & F.col("l_discount").between(0.02, 0.08)
    )
    arm3 = (
        (F.col("o_orderpriority") == "3-MEDIUM")
        & F.col("l_quantity").between(20, 50)
        & F.col("l_discount").between(0.05, 0.10)
    )
    return df.where(arm1 | arm2 | arm3).agg(
        F.sum("l_quantity").cast("double").alias("total_qty"),
        F.count("*").alias("n_lines"),
    )


@register(
    "ds_best_worst_performers",
    oracle=f"""
    WITH perf AS (
      SELECT l_partkey, round(avg({_REV_SQL}), 4) AS avg_rev
      FROM lineitem GROUP BY l_partkey
    ),
    best AS (
      SELECT l_partkey, avg_rev,
             CAST(row_number() OVER (ORDER BY avg_rev DESC, l_partkey) AS BIGINT) AS rk
      FROM perf
    ),
    worst AS (
      SELECT l_partkey, avg_rev,
             CAST(row_number() OVER (ORDER BY avg_rev ASC, l_partkey) AS BIGINT) AS rk
      FROM perf
    )
    SELECT b.rk AS rk, pb.p_name AS best_part, b.avg_rev AS best_rev,
           pw.p_name AS worst_part, w.avg_rev AS worst_rev
    FROM best b
    JOIN worst w ON b.rk = w.rk
    JOIN part pb ON b.l_partkey = pb.p_partkey
    JOIN part pw ON w.l_partkey = pw.p_partkey
    WHERE b.rk <= 10
    """,
    category="tpcds",
)
def ds_best_worst_performers(spark, sf_dir):
    """TPC-DS Q44 shape: rank items by average revenue ascending AND
    descending, join rank-to-rank so each output row pairs the i-th best
    with the i-th worst, then join names back twice.

    The part-level aggregate (≪ lineitem, part-dimension-bounded) is
    computed once and lazily checkpointed so BOTH rank directions reuse
    it (Spark shares no identical subtrees — each global_rank branch
    previously re-ran the lineitem aggregation).  With only the top/
    bottom 10 needed, each direction is orderBy().limit(10) — Spark's
    TakeOrderedAndProject keeps 10 rows per partition then merges, so no
    rank machinery and no corpus-sized window; the rank column is a
    row_number over the 10 surviving rows only (the q_bm25_ranking
    top-k pattern)."""
    from pyspark.sql import Window

    li = read(spark, sf_dir, "lineitem")
    p = read(spark, sf_dir, "part")
    perf = (
        li.groupBy("l_partkey")
        .agg(F.round(F.avg(_rev()), 4).alias("avg_rev"))
        .localCheckpoint(eager=False)
    )

    def topk(order):
        return (
            perf.orderBy(*order)
            .limit(10)
            .withColumn("rk", F.row_number().over(Window.orderBy(*order)))
        )

    best = topk([F.col("avg_rev").desc(), F.col("l_partkey")])
    worst = topk([F.col("avg_rev").asc(), F.col("l_partkey")])
    return (
        best.alias("b")
        .join(worst.alias("w"), "rk")
        .join(dim(p.alias("pb")), F.col("b.l_partkey") == F.col("pb.p_partkey"))
        .join(dim(p.alias("pw")), F.col("w.l_partkey") == F.col("pw.p_partkey"))
        .select(
            "rk",
            F.col("pb.p_name").alias("best_part"),
            F.col("b.avg_rev").alias("best_rev"),
            F.col("pw.p_name").alias("worst_part"),
            F.col("w.avg_rev").alias("worst_rev"),
        )
    )


@register(
    "ds_inventory_variance_pairs",
    oracle="""
    WITH s AS (
      SELECT l_partkey, month(l_shipdate) AS mo,
             avg(l_quantity) AS mean_q,
             stddev_samp(l_quantity) AS std_q,
             count(*) AS n
      FROM lineitem
      WHERE year(l_shipdate) = 1997 AND month(l_shipdate) IN (3, 4)
      GROUP BY l_partkey, month(l_shipdate)
      HAVING count(*) >= 3 AND stddev_samp(l_quantity) / avg(l_quantity) > 0.5
    )
    SELECT a.l_partkey AS l_partkey,
           round(a.mean_q, 4) AS mean_mar, round(a.std_q / a.mean_q, 4) AS cov_mar,
           round(b.mean_q, 4) AS mean_apr, round(b.std_q / b.mean_q, 4) AS cov_apr
    FROM s a JOIN s b ON a.l_partkey = b.l_partkey AND a.mo = 3 AND b.mo = 4
    """,
    category="tpcds",
)
def ds_inventory_variance_pairs(spark, sf_dir):
    """TPC-DS Q39 shape: per (item, month) mean and stddev of quantity,
    keep high-variance items (CoV > 0.5), self-join consecutive months so
    each row shows March-vs-April stability. The month-level aggregate is
    small; the self-join is a broadcast."""
    li = read(spark, sf_dir, "lineitem").where(
        (F.year("l_shipdate") == 1997) & F.month("l_shipdate").isin(3, 4)
    )
    s = (
        li.groupBy("l_partkey", F.month("l_shipdate").alias("mo"))
        .agg(
            F.avg("l_quantity").alias("mean_q"),
            F.stddev_samp("l_quantity").alias("std_q"),
            F.count("*").alias("n"),
        )
        .where((F.col("n") >= 3) & (F.col("std_q") / F.col("mean_q") > 0.5))
    )
    a, b = s.alias("a"), s.alias("b")
    return (
        a.join(b, (F.col("a.l_partkey") == F.col("b.l_partkey")) & (F.col("a.mo") == 3) & (F.col("b.mo") == 4))
        .select(
            F.col("a.l_partkey").alias("l_partkey"),
            F.round("a.mean_q", 4).alias("mean_mar"),
            F.round(F.col("a.std_q") / F.col("a.mean_q"), 4).alias("cov_mar"),
            F.round("b.mean_q", 4).alias("mean_apr"),
            F.round(F.col("b.std_q") / F.col("b.mean_q"), 4).alias("cov_apr"),
        )
    )


@register(
    "ds_promo_revenue_ratio",
    oracle=f"""
    SELECT round(promo.rev, 4) AS promo_rev,
           round(total.rev, 4) AS total_rev,
           round(100.0 * promo.rev / total.rev, 4) AS promo_pct
    FROM
      (SELECT sum({_REV_SQL}) AS rev
       FROM lineitem JOIN part ON l_partkey = p_partkey
       WHERE p_type LIKE 'PROMO%' AND year(l_shipdate) = 1997) promo,
      (SELECT sum({_REV_SQL}) AS rev
       FROM lineitem WHERE year(l_shipdate) = 1997) total
    """,
    category="tpcds",
)
def ds_promo_revenue_ratio(spark, sf_dir):
    """TPC-DS Q61 shape (TPC-H Q14 cousin): promotional revenue share as
    a cross join of two scalar aggregates. Both sides are one-row; the
    cross join is free and the two scans share the cached lineitem."""
    li = read(spark, sf_dir, "lineitem").where(F.year("l_shipdate") == 1997)
    p = read(spark, sf_dir, "part").where(F.col("p_type").like("PROMO%"))
    promo = (
        li.join(dim(p), li.l_partkey == p.p_partkey)
        .agg(F.sum(_rev()).alias("rev"))
        .select(F.col("rev").alias("promo_raw"))
    )
    total = li.agg(F.sum(_rev()).alias("rev")).select(F.col("rev").alias("total_raw"))
    return promo.crossJoin(total).select(
        F.round("promo_raw", 4).alias("promo_rev"),
        F.round("total_raw", 4).alias("total_rev"),
        F.round(F.lit(100.0) * F.col("promo_raw") / F.col("total_raw"), 4).alias("promo_pct"),
    )


@register(
    "ds_channel_overlap_counts",
    oracle="""
    WITH a AS (
      SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
    ),
    b AS (
      SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority IN ('4-NOT SPECIFIED', '5-LOW')
    )
    SELECT CAST(sum(CASE WHEN a.o_custkey IS NOT NULL AND b.o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS fast_only,
           CAST(sum(CASE WHEN a.o_custkey IS NULL AND b.o_custkey IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS slow_only,
           CAST(sum(CASE WHEN a.o_custkey IS NOT NULL AND b.o_custkey IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS both_channels
    FROM a FULL OUTER JOIN b ON a.o_custkey = b.o_custkey
    """,
    category="tpcds",
)
def ds_channel_overlap_counts(spark, sf_dir):
    """TPC-DS Q97 shape: FULL OUTER join of the distinct customer sets of
    two channels, counting exclusive and overlapping membership in one
    conditional aggregate over the join."""
    o = read(spark, sf_dir, "orders")
    a = (
        o.where(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .select(F.col("o_custkey").alias("a_cust"))
        .distinct()
    )
    b = (
        o.where(F.col("o_orderpriority").isin("4-NOT SPECIFIED", "5-LOW"))
        .select(F.col("o_custkey").alias("b_cust"))
        .distinct()
    )
    j = a.join(b, a.a_cust == b.b_cust, "full_outer")
    return j.agg(
        F.sum(F.when(F.col("a_cust").isNotNull() & F.col("b_cust").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("fast_only"),
        F.sum(F.when(F.col("a_cust").isNull() & F.col("b_cust").isNotNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("slow_only"),
        F.sum(F.when(F.col("a_cust").isNotNull() & F.col("b_cust").isNotNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("both_channels"),
    )


@register(
    "ds_triple_channel_brand",
    oracle=f"""
    WITH u AS (
      SELECT p_brand, {_REV_SQL} AS rev
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                    JOIN part ON l_partkey = p_partkey
      WHERE o_orderpriority IN ('1-URGENT', '2-HIGH') AND month(o_orderdate) = 5
      UNION ALL
      SELECT p_brand, {_REV_SQL} AS rev
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                    JOIN part ON l_partkey = p_partkey
      WHERE o_orderpriority = '3-MEDIUM' AND month(o_orderdate) = 5
      UNION ALL
      SELECT p_brand, {_REV_SQL} AS rev
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                    JOIN part ON l_partkey = p_partkey
      WHERE o_orderpriority IN ('4-NOT SPECIFIED', '5-LOW') AND month(o_orderdate) = 5
    )
    SELECT p_brand, round(sum(rev), 4) AS total_rev
    FROM u GROUP BY p_brand
    """,
    category="tpcds",
)
def ds_triple_channel_brand(spark, sf_dir):
    """TPC-DS Q33/Q56/Q60 shape: the same brand-revenue aggregate
    computed per channel CTE, UNION ALL'd, then re-aggregated to a total
    per brand. Catalyst pushes the month filter into all three scans and
    the union is map-side — one shuffle at the final group-by."""
    li = read(spark, sf_dir, "lineitem")
    o = read(spark, sf_dir, "orders").where(F.month("o_orderdate") == 5)
    p = read(spark, sf_dir, "part")

    def channel(prios):
        return (
            li.join(o.where(F.col("o_orderpriority").isin(*prios)), li.l_orderkey == o.o_orderkey)
            .join(dim(p), li.l_partkey == p.p_partkey)
            .select("p_brand", _rev().alias("rev"))
        )

    u = (
        channel(["1-URGENT", "2-HIGH"])
        .unionAll(channel(["3-MEDIUM"]))
        .unionAll(channel(["4-NOT SPECIFIED", "5-LOW"]))
    )
    return u.groupBy("p_brand").agg(F.round(F.sum("rev"), 4).alias("total_rev"))


@register(
    "ds_fulfillment_latency_nations",
    oracle="""
    SELECT n_name,
           CAST(sum(CASE WHEN lat <= 30 THEN 1 ELSE 0 END) AS BIGINT) AS d30,
           CAST(sum(CASE WHEN lat > 30 AND lat <= 60 THEN 1 ELSE 0 END) AS BIGINT) AS d60,
           CAST(sum(CASE WHEN lat > 60 AND lat <= 90 THEN 1 ELSE 0 END) AS BIGINT) AS d90,
           CAST(sum(CASE WHEN lat > 90 AND lat <= 120 THEN 1 ELSE 0 END) AS BIGINT) AS d120,
           CAST(sum(CASE WHEN lat > 120 THEN 1 ELSE 0 END) AS BIGINT) AS dmore
    FROM (
      SELECT s_nationkey, datediff('day', o_orderdate, l_shipdate) AS lat
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey
      WHERE year(o_orderdate) = 1996
    ) t
    JOIN nation ON s_nationkey = n_nationkey
    GROUP BY n_name
    """,
    category="tpcds",
)
def ds_fulfillment_latency_nations(spark, sf_dir):
    """TPC-DS Q50 shape: order-to-ship latency bucket counts per supplier
    nation (the returns-latency pivot re-expressed on the driver schema).
    Supplier and nation are broadcast; lineitem shuffles once."""
    li = read(spark, sf_dir, "lineitem")
    o = read(spark, sf_dir, "orders").where(F.year("o_orderdate") == 1996)
    s = read(spark, sf_dir, "supplier")
    n = read(spark, sf_dir, "nation")
    lat = F.datediff("l_shipdate", "o_orderdate")
    df = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(dim(s), li.l_suppkey == s.s_suppkey)
        .join(dim(n), s.s_nationkey == n.n_nationkey)
        .withColumn("lat", lat)
    )
    return df.groupBy("n_name").agg(
        F.sum(F.when(F.col("lat") <= 30, 1).otherwise(0)).cast("bigint").alias("d30"),
        F.sum(F.when((F.col("lat") > 30) & (F.col("lat") <= 60), 1).otherwise(0)).cast("bigint").alias("d60"),
        F.sum(F.when((F.col("lat") > 60) & (F.col("lat") <= 90), 1).otherwise(0)).cast("bigint").alias("d90"),
        F.sum(F.when((F.col("lat") > 90) & (F.col("lat") <= 120), 1).otherwise(0)).cast("bigint").alias("d120"),
        F.sum(F.when(F.col("lat") > 120, 1).otherwise(0)).cast("bigint").alias("dmore"),
    )
