"""TPC-DS query shapes, fifth batch — adapted to the driver's TPC-H-ish
star schema (reference gate:
flink-end-to-end-tests/flink-tpcds-test/tpcds-tool/query/*.sql, run by
test-scripts/test_tpcds.sh:22). Shapes this batch: Q46/Q68 city-switch
orders, Q30/Q81 above-nation-average returners, Q93 returns-adjusted
net sales, Q53/Q63/Q89 in-year deviation bands, Q73 frequent-buyer
count band, Q37/Q82 price-band part report, Q15/Q45 OR-filtered
geography rollup, Q18/Q26/Q27 demographic averages under ROLLUP,
Q91 month-over-month returns delta, Q79 peak-month-per-customer,
Q14 all-channel part intersect + rollup, Q69 exists/not-exists
demographic counts.

Conventions shared with batches 1-4: money sums rounded to 4 digits on
BOTH sides, conditional counts CAST to BIGINT on the oracle side,
"channels" carved from o_orderpriority, every ORDER BY fully
tie-broken before a LIMIT so the selected row set is deterministic.
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
    "ds_city_switch",
    oracle=f"""
    SELECT c_name, o_orderkey, cn.n_name AS cust_nation, sn.n_name AS supp_nation,
           round(sum({_REV_SQL}), 4) AS switch_rev
    FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation cn ON c_nationkey = cn.n_nationkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation sn ON s_nationkey = sn.n_nationkey
    WHERE cn.n_nationkey <> sn.n_nationkey AND year(o_orderdate) = 1997
    GROUP BY c_name, o_orderkey, cust_nation, supp_nation
    ORDER BY c_name, o_orderkey, supp_nation
    LIMIT 100
    """,
    category="tpcds",
)
def ds_city_switch(spark, sf_dir):
    """TPC-DS Q46/Q68 shape: orders fulfilled from a different "city"
    (nation here) than the customer's home, with per-order revenue.
    Two broadcast nation joins (25 rows each) keep the only real shuffle
    on the group-by; the supplier join is the Q46 "current_addr" probe."""
    li = read(spark, sf_dir, "lineitem")
    o = read(spark, sf_dir, "orders").where(F.year("o_orderdate") == 1997)
    c = read(spark, sf_dir, "customer")
    s = read(spark, sf_dir, "supplier")
    n = read(spark, sf_dir, "nation")
    cn = n.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    sn = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(dim(cn), c.c_nationkey == cn.cn_key)
        .join(dim(s), li.l_suppkey == s.s_suppkey)
        .join(dim(sn), s.s_nationkey == sn.sn_key)
        .where(F.col("cn_key") != F.col("sn_key"))
        .groupBy("c_name", "o_orderkey", "cust_nation", "supp_nation")
        .agg(F.round(F.sum(_rev()), 4).alias("switch_rev"))
        .orderBy("c_name", "o_orderkey", "supp_nation")
        .limit(100)
    )


@register(
    "ds_above_nation_avg_returns",
    oracle=f"""
    WITH cr AS (
      SELECT c_custkey, c_name, c_acctbal, c_nationkey,
             sum({_REV_SQL}) AS ret
      FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
      WHERE l_returnflag = 'R'
      GROUP BY c_custkey, c_name, c_acctbal, c_nationkey)
    SELECT c_name, c_acctbal, n_name, round(ret, 4) AS ret_rev
    FROM (SELECT *, avg(ret) OVER (PARTITION BY c_nationkey) AS navg FROM cr)
      JOIN nation ON c_nationkey = n_nationkey
    WHERE ret > 1.2 * navg
    ORDER BY c_name
    """,
    category="tpcds",
)
def ds_above_nation_avg_returns(spark, sf_dir):
    """TPC-DS Q30/Q81 shape: customers whose returned revenue exceeds
    1.2x the average for their nation (state there). The reference spells
    this as a correlated scalar subquery over a CTE; both engines plan it
    here as one window-average over the aggregated per-customer returns —
    no second scan of lineitem."""
    li = read(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    o = read(spark, sf_dir, "orders")
    c = read(spark, sf_dir, "customer")
    n = read(spark, sf_dir, "nation")
    cr = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "c_nationkey")
        .agg(F.sum(_rev()).alias("ret"))
    )
    w = Window.partitionBy("c_nationkey")
    return (
        cr.withColumn("navg", F.avg("ret").over(w))
        .where(F.col("ret") > 1.2 * F.col("navg"))
        .join(dim(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .select(
            "c_name", "c_acctbal", "n_name", F.round("ret", 4).alias("ret_rev")
        )
        .orderBy("c_name")
    )


@register(
    "ds_net_sales_after_returns",
    oracle=f"""
    SELECT c_name,
           round(sum(CASE WHEN l_returnflag = 'R' THEN -({_REV_SQL})
                          ELSE {_REV_SQL} END), 4) AS net_rev
    FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
    GROUP BY c_name
    ORDER BY net_rev DESC, c_name
    LIMIT 50
    """,
    category="tpcds",
)
def ds_net_sales_after_returns(spark, sf_dir):
    """TPC-DS Q93 shape: per-customer net sales after subtracting
    returned line items (the reference joins store_returns by item+ticket;
    the driver schema carries the return marker on the line itself).
    Signed conditional sum — one scan, one shuffle, TopN on the result."""
    li = read(spark, sf_dir, "lineitem")
    o = read(spark, sf_dir, "orders")
    c = read(spark, sf_dir, "customer")
    signed = F.when(F.col("l_returnflag") == "R", -_rev()).otherwise(_rev())
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_name")
        .agg(F.round(F.sum(signed), 4).alias("net_rev"))
        .orderBy(F.col("net_rev").desc(), "c_name")
        .limit(50)
    )


@register(
    "ds_brand_month_deviation",
    oracle=f"""
    WITH bm AS (
      SELECT p_brand, month(o_orderdate) AS mo,
             CAST(round(sum({_REV_SQL}) * 10000) AS BIGINT) AS sales_i
      FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN part   ON l_partkey = p_partkey
      WHERE year(o_orderdate) = 1997
      GROUP BY p_brand, month(o_orderdate))
    SELECT p_brand, mo, sales_i / 10000.0 AS sales,
           round(bavg_i / 10000.0, 4) AS avg_sales
    FROM (SELECT *, avg(sales_i) OVER (PARTITION BY p_brand) AS bavg_i FROM bm)
    WHERE bavg_i > 0 AND abs(sales_i - bavg_i) / bavg_i > 0.3
    ORDER BY p_brand, mo
    """,
    category="tpcds",
)
def ds_brand_month_deviation(spark, sf_dir):
    """TPC-DS Q53/Q63/Q89 shape: monthly brand sales that deviate more
    than 30% from the brand's in-year monthly average. Aggregate once,
    window-average over the (small) brand-month matrix, filter on the
    ratio — the expensive scan happens exactly once."""
    li = read(spark, sf_dir, "lineitem")
    o = read(spark, sf_dir, "orders").where(F.year("o_orderdate") == 1997)
    p = read(spark, sf_dir, "part")
    bm = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(p, li.l_partkey == p.p_partkey)
        .groupBy("p_brand", F.month("o_orderdate").alias("mo"))
        # integer 1e-4 units: exact under any summation order, so the
        # deviation band and the rounded average are bitwise stable
        # across runs (a raw double sum wobbles a ULP with partial-agg
        # order and can flip round() at a .00005 boundary)
        .agg(F.round(F.sum(_rev()) * 10000).cast("bigint").alias("sales_i"))
    )
    w = Window.partitionBy("p_brand")
    return (
        bm.withColumn("bavg_i", F.avg("sales_i").over(w))
        .where(
            (F.col("bavg_i") > 0)
            & (F.abs(F.col("sales_i") - F.col("bavg_i")) / F.col("bavg_i") > 0.3)
        )
        .select(
            "p_brand",
            "mo",
            (F.col("sales_i") / 10000.0).alias("sales"),
            F.round(F.col("bavg_i") / 10000.0, 4).alias("avg_sales"),
        )
        .orderBy("p_brand", "mo")
    )


@register(
    "ds_frequent_buyer_band",
    oracle="""
    SELECT c_name, c_acctbal, cnt
    FROM (SELECT o_custkey, count(*) AS cnt FROM orders GROUP BY o_custkey)
      JOIN customer ON o_custkey = c_custkey
    WHERE cnt BETWEEN 5 AND 10
    ORDER BY cnt DESC, c_name
    """,
    category="tpcds",
)
def ds_frequent_buyer_band(spark, sf_dir):
    """TPC-DS Q73 shape: customers whose order count falls in a band,
    joined back to their details. Aggregate-then-join: the count runs
    on the narrow orders table, the band filter shrinks the probe side
    before the customer join."""
    o = read(spark, sf_dir, "orders")
    c = read(spark, sf_dir, "customer")
    oc = o.groupBy("o_custkey").agg(F.count("*").alias("cnt")).where(
        F.col("cnt").between(5, 10)
    )
    return (
        oc.join(c, oc.o_custkey == c.c_custkey)
        .select("c_name", "c_acctbal", "cnt")
        .orderBy(F.col("cnt").desc(), "c_name")
    )


@register(
    "ds_price_band_parts",
    oracle="""
    SELECT p_name, p_brand, p_retailprice
    FROM part JOIN lineitem ON p_partkey = l_partkey
    WHERE p_retailprice BETWEEN 900 AND 1100
      AND p_size IN (5, 10, 15, 20)
      AND l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1997-07-01'
    GROUP BY p_name, p_brand, p_retailprice
    ORDER BY p_name, p_brand, p_retailprice
    LIMIT 50
    """,
    category="tpcds",
)
def ds_price_band_parts(spark, sf_dir):
    """TPC-DS Q37/Q82 shape: distinct parts in a retail-price band and
    size list that actually moved in a half-year window. Both predicates
    push into the parquet scans; the group-by is the dedup."""
    p = read(spark, sf_dir, "part").where(
        F.col("p_retailprice").between(900, 1100) & F.col("p_size").isin(5, 10, 15, 20)
    )
    li = read(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-07-01")
    )
    return (
        p.join(li, p.p_partkey == li.l_partkey)
        .select("p_name", "p_brand", "p_retailprice")
        .distinct()
        .orderBy("p_name", "p_brand", "p_retailprice")
        .limit(50)
    )


@register(
    "ds_segment_or_filter",
    oracle=f"""
    SELECT n_name, round(sum({_REV_SQL}), 4) AS rev
    FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
    WHERE c_mktsegment IN ('AUTOMOBILE', 'MACHINERY') OR c_acctbal > 9000
    GROUP BY n_name
    """,
    category="tpcds",
)
def ds_segment_or_filter(spark, sf_dir):
    """TPC-DS Q15/Q45 shape: revenue by geography where the customer
    matches a segment list OR a balance threshold (the reference's
    zip-list OR substring predicate). The disjunction stays in one scan
    filter — no union of branches."""
    li = read(spark, sf_dir, "lineitem")
    o = read(spark, sf_dir, "orders")
    c = read(spark, sf_dir, "customer").where(
        F.col("c_mktsegment").isin("AUTOMOBILE", "MACHINERY") | (F.col("c_acctbal") > 9000)
    )
    n = read(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(dim(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(_rev()), 4).alias("rev"))
    )


@register(
    "ds_demo_rollup_avgs",
    oracle="""
    SELECT n_name, c_mktsegment,
           round(avg(l_quantity), 4) AS avg_qty,
           round(avg(l_extendedprice), 4) AS avg_price,
           round(avg(l_discount), 6) AS avg_disc,
           grouping(n_name) + grouping(c_mktsegment) AS agg_level
    FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
    WHERE year(o_orderdate) = 1998
    GROUP BY ROLLUP (n_name, c_mktsegment)
    """,
    category="tpcds",
)
def ds_demo_rollup_avgs(spark, sf_dir):
    """TPC-DS Q18/Q26/Q27 shape: average quantity/price/discount per
    demographic cell (nation x segment) with ROLLUP subtotals. One Expand
    + single two-phase aggregate; grouping() flags tag subtotal rows."""
    li = read(spark, sf_dir, "lineitem")
    o = read(spark, sf_dir, "orders").where(F.year("o_orderdate") == 1998)
    c = read(spark, sf_dir, "customer")
    n = read(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(dim(n), c.c_nationkey == n.n_nationkey)
        .rollup("n_name", "c_mktsegment")
        .agg(
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            (F.grouping("n_name") + F.grouping("c_mktsegment")).alias("agg_level"),
        )
    )


@register(
    "ds_priority_month_lag",
    oracle=f"""
    WITH pm AS (
      SELECT o_orderpriority AS prio, month(o_orderdate) AS mo,
             sum({_REV_SQL}) AS ret_rev
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE l_returnflag = 'R' AND year(o_orderdate) = 1997
      GROUP BY o_orderpriority, month(o_orderdate))
    SELECT prio, mo, round(ret_rev, 4) AS ret_rev,
           round(ret_rev - lag(ret_rev) OVER (PARTITION BY prio ORDER BY mo), 4) AS delta
    FROM pm
    ORDER BY prio, mo
    """,
    category="tpcds",
)
def ds_priority_month_lag(spark, sf_dir):
    """TPC-DS Q91 shape: month-over-month change in returned revenue per
    call center (order priority here). LAG over the tiny aggregated
    matrix — the window never touches base-table rows."""
    li = read(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    o = read(spark, sf_dir, "orders").where(F.year("o_orderdate") == 1997)
    pm = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("o_orderpriority").alias("prio"),
            F.month("o_orderdate").alias("mo"),
        )
        .agg(F.sum(_rev()).alias("ret_rev"))
    )
    w = Window.partitionBy("prio").orderBy("mo")
    return pm.select(
        "prio",
        "mo",
        F.round("ret_rev", 4).alias("ret_rev"),
        F.round(F.col("ret_rev") - F.lag("ret_rev").over(w), 4).alias("delta"),
    ).orderBy("prio", "mo")


@register(
    "ds_peak_month_per_customer",
    oracle=f"""
    WITH cm AS (
      SELECT c_name, month(o_orderdate) AS mo, sum({_REV_SQL}) AS rev
      FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
      WHERE year(o_orderdate) = 1997
      GROUP BY c_name, month(o_orderdate))
    SELECT c_name, mo, round(rev, 4) AS peak_rev
    FROM (SELECT *, row_number() OVER (PARTITION BY c_name ORDER BY rev DESC, mo) AS rn
          FROM cm)
    WHERE rn = 1
    ORDER BY c_name
    LIMIT 100
    """,
    category="tpcds",
)
def ds_peak_month_per_customer(spark, sf_dir):
    """TPC-DS Q79 shape: each customer's best month (highest-profit
    shift there). Aggregate to customer x month, then a rank-1 filter —
    the classic Top-N-per-group the reference plans as StreamExecRank
    (AppendOnlyTopNFunction.java:222)."""
    li = read(spark, sf_dir, "lineitem")
    o = read(spark, sf_dir, "orders").where(F.year("o_orderdate") == 1997)
    c = read(spark, sf_dir, "customer")
    cm = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_name", F.month("o_orderdate").alias("mo"))
        .agg(F.sum(_rev()).alias("rev"))
    )
    w = Window.partitionBy("c_name").orderBy(F.col("rev").desc(), "mo")
    return (
        cm.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("c_name", "mo", F.round("rev", 4).alias("peak_rev"))
        .orderBy("c_name")
        .limit(100)
    )


@register(
    "ds_allchannel_parts_rollup",
    oracle=f"""
    WITH common AS (
      SELECT l_partkey FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderpriority = '1-URGENT'
      INTERSECT
      SELECT l_partkey FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderpriority = '2-HIGH'
      INTERSECT
      SELECT l_partkey FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderpriority = '3-MEDIUM')
    SELECT p_brand, p_type, round(sum({_REV_SQL}), 4) AS rev,
           grouping(p_brand) + grouping(p_type) AS agg_level
    FROM lineitem
      JOIN part ON l_partkey = p_partkey
    WHERE l_partkey IN (SELECT l_partkey FROM common)
      AND year(l_shipdate) = 1997
    GROUP BY ROLLUP (p_brand, p_type)
    """,
    category="tpcds",
)
def ds_allchannel_parts_rollup(spark, sf_dir):
    """TPC-DS Q14 shape: parts sold through ALL three channels
    (priorities here), then a ROLLUP sales report restricted to that
    intersection. The intersect runs on deduplicated part keys (narrow),
    the final restriction is a semi join."""
    li = read(spark, sf_dir, "lineitem")
    o = read(spark, sf_dir, "orders")
    p = read(spark, sf_dir, "part")

    def chan(prio):
        ow = o.where(F.col("o_orderpriority") == prio)
        return li.join(ow, li.l_orderkey == ow.o_orderkey).select("l_partkey")

    common = chan("1-URGENT").intersect(chan("2-HIGH")).intersect(chan("3-MEDIUM"))
    sold97 = li.where(F.year("l_shipdate") == 1997)
    return (
        sold97.join(common, "l_partkey", "left_semi")
        .join(p, sold97.l_partkey == p.p_partkey)
        .rollup("p_brand", "p_type")
        .agg(
            F.round(F.sum(_rev()), 4).alias("rev"),
            (F.grouping("p_brand") + F.grouping("p_type")).alias("agg_level"),
        )
    )


@register(
    "ds_channel_exists_not_exists",
    oracle="""
    SELECT c_mktsegment, count(*) AS cnt, round(avg(c_acctbal), 4) AS avg_bal
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderpriority = '5-LOW')
    GROUP BY c_mktsegment
    """,
    category="tpcds",
)
def ds_channel_exists_not_exists(spark, sf_dir):
    """TPC-DS Q69 shape: demographic counts of customers active in one
    channel but absent from another — EXISTS + NOT EXISTS compiled to a
    semi join followed by an anti join, exactly the reference's
    FlinkSubQueryRemoveRule.scala rewrite."""
    c = read(spark, sf_dir, "customer")
    o = read(spark, sf_dir, "orders")
    urgent = o.where(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    low = o.where(F.col("o_orderpriority") == "5-LOW").select("o_custkey")
    return (
        c.join(urgent, c.c_custkey == urgent.o_custkey, "left_semi")
        .join(low, F.col("c_custkey") == low.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("cnt"),
            F.round(F.avg("c_acctbal"), 4).alias("avg_bal"),
        )
    )
