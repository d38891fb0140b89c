"""TPC-DS query shapes, seventh batch — adapted to the driver's
TPC-H-ish star schema (reference gate:
flink-end-to-end-tests/flink-tpcds-test/tpcds-tool/query/*.sql).
Shapes this batch: Q72 promotion-window late availability with
week-over-week comparison, Q83 three-period returns tolerance.

Same conventions as batches 1-6 (4-digit money rounding both sides,
BIGINT casts on oracle counts, tie-broken ORDER BY before LIMIT).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from my_flink_1_10_2_spark.queries import read, register
from my_flink_1_10_2_spark.operators.hints import dim


@register(
    "ds_late_availability",
    oracle="""
    WITH weekly AS (
      SELECT p_brand, CAST(week(l_shipdate) AS BIGINT) AS wk,
             CAST(count(*) AS BIGINT) AS n_items,
             CAST(sum(CASE WHEN date_diff('day', o_orderdate, l_shipdate) > 60
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_late
      FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN part   ON l_partkey = p_partkey
      WHERE year(l_shipdate) = 1997
      GROUP BY p_brand, wk
    )
    SELECT p_brand, wk, n_items, n_late,
           lag(n_late) OVER (PARTITION BY p_brand ORDER BY wk) AS prev_late
    FROM weekly
    ORDER BY p_brand, wk
    LIMIT 200
    """,
    category="tpcds",
)
def ds_late_availability(spark, sf_dir):
    """TPC-DS Q72 shape: items whose fulfillment lagged the order by
    more than the promise window (ship - order > 60 days standing in
    for inventory_date + 5 < ship_date), counted per brand x week with
    the prior week's late count alongside (the original's d1/d2/d3
    date-dimension self-joins collapse to date arithmetic on the fact
    row). The lag window runs over the aggregated brand-week matrix,
    not base rows."""
    li = read(spark, sf_dir, "lineitem").where(F.year("l_shipdate") == 1997)
    o = read(spark, sf_dir, "orders")
    p = read(spark, sf_dir, "part")
    late = F.datediff("l_shipdate", "o_orderdate") > 60
    weekly = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(dim(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", F.weekofyear("l_shipdate").cast("bigint").alias("wk"))
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(late.cast("int")).cast("bigint").alias("n_late"),
        )
    )
    w = Window.partitionBy("p_brand").orderBy("wk")
    return (
        weekly.withColumn("prev_late", F.lag("n_late").over(w))
        .orderBy("p_brand", "wk")
        .limit(200)
    )


@register(
    "ds_three_period_returns",
    oracle="""
    WITH ret AS (
      SELECT l_partkey,
             sum(CASE WHEN month(l_shipdate) = 3 THEN l_quantity ELSE 0 END) AS q1,
             sum(CASE WHEN month(l_shipdate) = 4 THEN l_quantity ELSE 0 END) AS q2,
             sum(CASE WHEN month(l_shipdate) = 5 THEN l_quantity ELSE 0 END) AS q3
      FROM lineitem
      WHERE l_returnflag = 'R' AND year(l_shipdate) = 1997
        AND month(l_shipdate) IN (3, 4, 5)
      GROUP BY l_partkey
    )
    SELECT p_name, CAST(q1 AS BIGINT) AS q1, CAST(q2 AS BIGINT) AS q2,
           CAST(q3 AS BIGINT) AS q3
    FROM ret JOIN part ON l_partkey = p_partkey
    WHERE q1 > 0 AND q2 > 0 AND q3 > 0
      AND q1 BETWEEN 0.6 * (q1+q2+q3)/3 AND 1.4 * (q1+q2+q3)/3
      AND q2 BETWEEN 0.6 * (q1+q2+q3)/3 AND 1.4 * (q1+q2+q3)/3
      AND q3 BETWEEN 0.6 * (q1+q2+q3)/3 AND 1.4 * (q1+q2+q3)/3
    ORDER BY p_name
    """,
    category="tpcds",
)
def ds_three_period_returns(spark, sf_dir):
    """TPC-DS Q83 shape: parts whose returned quantity in each of three
    consecutive months stays within ±40% of the three-month average —
    the tolerance band over time periods rather than channels. One fact
    scan with three conditional sums; the part dimension joins broadcast
    AFTER the aggregate collapses to one row per part."""
    li = read(spark, sf_dir, "lineitem").where(
        (F.col("l_returnflag") == "R")
        & (F.year("l_shipdate") == 1997)
        & F.month("l_shipdate").isin(3, 4, 5)
    )
    p = read(spark, sf_dir, "part")
    m = F.month("l_shipdate")
    ret = li.groupBy("l_partkey").agg(
        F.sum(F.when(m == 3, F.col("l_quantity")).otherwise(0)).alias("q1"),
        F.sum(F.when(m == 4, F.col("l_quantity")).otherwise(0)).alias("q2"),
        F.sum(F.when(m == 5, F.col("l_quantity")).otherwise(0)).alias("q3"),
    )
    mean3 = (F.col("q1") + F.col("q2") + F.col("q3")) / 3
    band = lambda c: F.col(c).between(0.6 * mean3, 1.4 * mean3)  # noqa: E731
    return (
        ret.where(
            (F.col("q1") > 0)
            & (F.col("q2") > 0)
            & (F.col("q3") > 0)
            & band("q1")
            & band("q2")
            & band("q3")
        )
        .join(dim(p), ret.l_partkey == p.p_partkey)
        .select(
            "p_name",
            F.col("q1").cast("bigint").alias("q1"),
            F.col("q2").cast("bigint").alias("q2"),
            F.col("q3").cast("bigint").alias("q3"),
        )
        .orderBy("p_name")
    )


@register(
    "ds_tri_channel_intersect",
    oracle="""
    SELECT c.c_custkey, c.c_name FROM (
      SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
      INTERSECT
      SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '2-HIGH'
      INTERSECT
      SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '3-MEDIUM'
    ) t JOIN customer c ON c.c_custkey = t.o_custkey
    ORDER BY c.c_custkey LIMIT 100
    """,
    category="tpcds",
)
def ds_tri_channel_intersect(spark, sf_dir):
    """TPC-DS Q38 shape: customers active in ALL THREE channels
    (INTERSECT chain -> semi-join cascade; ref:
    ReplaceIntersectWithSemiJoinRule.scala).  Channels = order-priority
    classes over the shared orders fact; each leg is a distinct
    projection of the same scan, so Catalyst reuses the exchange."""
    o = read(spark, sf_dir, "orders")
    c = read(spark, sf_dir, "customer")

    def leg(p):
        return o.where(F.col("o_orderpriority") == p).select("o_custkey").distinct()

    tri = (
        leg("1-URGENT").intersect(leg("2-HIGH")).intersect(leg("3-MEDIUM"))
    )
    return (
        tri.join(c, tri.o_custkey == c.c_custkey)
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
        .limit(100)
    )


@register(
    "ds_channel_except_count",
    oracle="""
    SELECT count(*) AS n FROM (
      SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
      EXCEPT
      SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '2-HIGH'
      EXCEPT
      SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '3-MEDIUM'
    ) t
    """,
    category="tpcds",
)
def ds_channel_except_count(spark, sf_dir):
    """TPC-DS Q87 shape: customers exclusive to the first channel
    (EXCEPT chain -> anti-join cascade; ref:
    ReplaceMinusWithAntiJoinRule.scala)."""
    o = read(spark, sf_dir, "orders")

    def leg(p):
        return o.where(F.col("o_orderpriority") == p).select("o_custkey").distinct()

    out = leg("1-URGENT").exceptAll(leg("2-HIGH")).exceptAll(leg("3-MEDIUM"))
    return out.agg(F.count(F.lit(1)).alias("n"))


@register(
    "ds_cumulative_crossover",
    oracle="""
    WITH daily AS (
      SELECT o_orderdate AS d, o_orderpriority AS pr,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev_c
      FROM orders
      WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
        AND o_orderdate < DATE '1995-04-01'
      GROUP BY 1, 2),
    cum AS (
      SELECT d, pr,
             CAST(sum(rev_c) OVER (PARTITION BY pr ORDER BY d) AS BIGINT) AS cum_c
      FROM daily),
    u AS (SELECT d, cum_c FROM cum WHERE pr = '1-URGENT'),
    h AS (SELECT d, cum_c FROM cum WHERE pr = '2-HIGH')
    SELECT COALESCE(u.d, h.d) AS d,
           u.cum_c AS urgent_cum_c, h.cum_c AS high_cum_c
    FROM u FULL JOIN h ON u.d = h.d
    WHERE COALESCE(h.cum_c, 0) > COALESCE(u.cum_c, 0)
    ORDER BY d
    """,
    category="tpcds",
)
def ds_cumulative_crossover(spark, sf_dir):
    """TPC-DS Q51 shape: two channels' daily revenue turned into running
    cumulative sums (window per channel), full-outer joined on date, and
    filtered to the days where one channel's cumulative total overtakes
    the other's.  Integer-cent running sums keep the comparison exact.
    One date+channel aggregate, one channel-partitioned window, one
    date-keyed full join."""
    o = read(spark, sf_dir, "orders").where(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        & (F.col("o_orderdate") < F.lit("1995-04-01"))
    )
    daily = o.groupBy(
        F.col("o_orderdate").alias("d"), F.col("o_orderpriority").alias("pr")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("rev_c")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("pr").orderBy("d")
    cum = daily.withColumn("cum_c", F.sum("rev_c").over(w).cast("bigint"))
    u = cum.where(F.col("pr") == "1-URGENT").select(
        F.col("d").alias("ud"), F.col("cum_c").alias("urgent_cum_c")
    )
    h = cum.where(F.col("pr") == "2-HIGH").select(
        F.col("d").alias("hd"), F.col("cum_c").alias("high_cum_c")
    )
    return (
        u.join(h, u.ud == h.hd, "full_outer")
        .where(
            F.coalesce("high_cum_c", F.lit(0)) > F.coalesce("urgent_cum_c", F.lit(0))
        )
        .select(
            F.coalesce("ud", "hd").alias("d"), "urgent_cum_c", "high_cum_c"
        )
        .orderBy("d")
    )
