"""TPC-DS query shapes, sixth batch — adapted to the driver's TPC-H-ish
star schema (reference gate:
flink-end-to-end-tests/flink-tpcds-test/tpcds-tool/query/*.sql, run by
test-scripts/test_tpcds.sh:22). Shapes this batch: Q8 preferred-zip
market revenue, Q10 active-customer demographic counts, Q13 averages
under OR'd band predicates, Q19 cross-location brand revenue,
Q21 before/after inventory ratio band, Q22 on-hand quantity hierarchy
rollup, Q24 bought-and-returned above corpus average, Q80 channel net
profit rollup, Q84/Q85 returns-reason demographic report.

Conventions shared with batches 1-5: money sums rounded to 4 digits on
BOTH sides, conditional counts CAST to BIGINT on the oracle side,
"channels" carved from o_orderpriority or c_mktsegment, every ORDER BY
fully tie-broken before a LIMIT so the selected row set is
deterministic.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from my_flink_1_10_2_spark.queries import read, register
from my_flink_1_10_2_spark.operators.hints import dim


def _rev():
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


_REV_SQL = "l_extendedprice * (1 - l_discount)"


@register(
    "ds_preferred_nation_market",
    oracle=f"""
    WITH preferred AS (
      SELECT c_nationkey
      FROM customer
      WHERE c_acctbal > 0
      GROUP BY c_nationkey
      HAVING count(*) >= 10
    )
    SELECT n_name, round(sum({_REV_SQL}), 4) AS market_rev
    FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
    WHERE year(o_orderdate) = 1996
      AND c_nationkey IN (SELECT c_nationkey FROM preferred)
    GROUP BY n_name
    ORDER BY n_name
    """,
    category="tpcds",
)
def ds_preferred_nation_market(spark, sf_dir):
    """TPC-DS Q8 shape: revenue restricted to "preferred" locations —
    the original derives a zip-prefix set from customer addresses with
    >=10 preferred customers; here the nation set with >=10
    positive-balance customers. The derived key set is tiny (<=25
    nations), so it joins broadcast; the only shuffle is the final
    group-by."""
    c = read(spark, sf_dir, "customer")
    preferred = (
        c.where(F.col("c_acctbal") > 0)
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_cust"))
        .where(F.col("n_cust") >= 10)
        .select(F.col("c_nationkey").alias("pref_key"))
    )
    li = read(spark, sf_dir, "lineitem")
    o = read(spark, sf_dir, "orders").where(F.year("o_orderdate") == 1996)
    n = read(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(dim(preferred), F.col("c_nationkey") == F.col("pref_key"))
        .join(dim(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.round(F.sum(_rev()), 4).alias("market_rev"))
        .orderBy("n_name")
    )


@register(
    "ds_active_customer_demo",
    oracle="""
    SELECT c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_cust,
           round(avg(c_acctbal), 4) AS avg_bal,
           round(max(c_acctbal), 4) AS max_bal
    FROM customer c
    WHERE EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
      )
      AND (
        EXISTS (
          SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '2-HIGH'
        )
        OR EXISTS (
          SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '5-LOW'
        )
      )
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
    category="tpcds",
)
def ds_active_customer_demo(spark, sf_dir):
    """TPC-DS Q10 shape: demographic counts for customers active in the
    store channel AND at least one of two other channels — EXISTS a AND
    (EXISTS b OR EXISTS c). Compiled as one pass over orders producing
    per-customer channel flags (bool_or conditional agg), then a single
    semi-filtering join — three correlated EXISTS collapse into one
    shuffle instead of three."""
    c = read(spark, sf_dir, "customer")
    o = read(spark, sf_dir, "orders")
    flags = o.groupBy("o_custkey").agg(
        F.max((F.col("o_orderpriority") == "1-URGENT").cast("int")).alias("in_a"),
        F.max((F.col("o_orderpriority") == "2-HIGH").cast("int")).alias("in_b"),
        F.max((F.col("o_orderpriority") == "5-LOW").cast("int")).alias("in_c"),
    )
    active = flags.where(
        (F.col("in_a") == 1) & ((F.col("in_b") == 1) | (F.col("in_c") == 1))
    ).select("o_custkey")
    return (
        c.join(active, c.c_custkey == active.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            F.round(F.avg("c_acctbal"), 4).alias("avg_bal"),
            F.round(F.max("c_acctbal"), 4).alias("max_bal"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "ds_or_band_averages",
    oracle="""
    SELECT round(avg(l_quantity), 4) AS avg_qty,
           round(avg(l_extendedprice), 4) AS avg_price,
           round(avg(l_discount), 4) AS avg_disc,
           CAST(count(*) AS BIGINT) AS n_rows
    FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
    WHERE (c_mktsegment = 'BUILDING'   AND l_quantity BETWEEN 1 AND 15
           AND c_acctbal BETWEEN 0 AND 3000)
       OR (c_mktsegment = 'AUTOMOBILE' AND l_quantity BETWEEN 16 AND 35
           AND c_acctbal BETWEEN 2000 AND 8000)
       OR (c_mktsegment = 'MACHINERY'  AND l_quantity BETWEEN 36 AND 50
           AND c_acctbal BETWEEN 5000 AND 10000)
    """,
    category="tpcds",
)
def ds_or_band_averages(spark, sf_dir):
    """TPC-DS Q13 shape: global averages under three OR'd
    (demographic-band AND quantity-band AND balance-band) predicates.
    The disjunction cannot prune the scan, but it stays a codegen'd
    filter after one fact-dimension join — no per-branch re-scan like a
    UNION rewrite would cost."""
    li = read(spark, sf_dir, "lineitem")
    o = read(spark, sf_dir, "orders")
    c = read(spark, sf_dir, "customer")
    band = (
        (
            (F.col("c_mktsegment") == "BUILDING")
            & F.col("l_quantity").between(1, 15)
            & F.col("c_acctbal").between(0, 3000)
        )
        | (
            (F.col("c_mktsegment") == "AUTOMOBILE")
            & F.col("l_quantity").between(16, 35)
            & F.col("c_acctbal").between(2000, 8000)
        )
        | (
            (F.col("c_mktsegment") == "MACHINERY")
            & F.col("l_quantity").between(36, 50)
            & F.col("c_acctbal").between(5000, 10000)
        )
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .where(band)
        .agg(
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


@register(
    "ds_cross_location_brand",
    oracle=f"""
    SELECT p_brand, year(o_orderdate) AS yr,
           round(sum({_REV_SQL}), 4) AS ex_rev,
           CAST(count(*) AS BIGINT) AS n_items
    FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN part     ON l_partkey = p_partkey
    WHERE c_nationkey <> s_nationkey
    GROUP BY p_brand, yr
    ORDER BY p_brand, yr
    """,
    category="tpcds",
)
def ds_cross_location_brand(spark, sf_dir):
    """TPC-DS Q19 shape: brand revenue where the buyer and the seller
    sit in different locations (original: customer zip <> store zip).
    supplier and part are broadcast dimensions; the inequality is a
    post-join codegen filter, and the only shuffles are the
    lineitem-orders-customer key joins plus the final group-by."""
    li = read(spark, sf_dir, "lineitem")
    o = read(spark, sf_dir, "orders")
    c = read(spark, sf_dir, "customer")
    s = read(spark, sf_dir, "supplier")
    p = read(spark, sf_dir, "part")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(dim(s), li.l_suppkey == s.s_suppkey)
        .join(dim(p), li.l_partkey == p.p_partkey)
        .where(F.col("c_nationkey") != F.col("s_nationkey"))
        .groupBy("p_brand", F.year("o_orderdate").alias("yr"))
        .agg(
            F.round(F.sum(_rev()), 4).alias("ex_rev"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("p_brand", "yr")
    )


@register(
    "ds_before_after_ratio_band",
    oracle="""
    WITH per AS (
      SELECT l_suppkey, l_partkey,
             sum(CASE WHEN l_shipdate <  DATE '1998-01-01' THEN l_quantity ELSE 0 END) AS qty_before,
             sum(CASE WHEN l_shipdate >= DATE '1998-01-01' THEN l_quantity ELSE 0 END) AS qty_after
      FROM lineitem
      WHERE l_shipdate BETWEEN DATE '1997-10-01' AND DATE '1998-03-31'
      GROUP BY l_suppkey, l_partkey
    )
    SELECT s_name, p_name, qty_before, qty_after
    FROM per
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN part     ON l_partkey = p_partkey
    WHERE qty_before > 0
      AND CAST(qty_after AS DOUBLE) / qty_before BETWEEN 2.0/3.0 AND 3.0/2.0
    ORDER BY s_name, p_name, qty_before, qty_after
    LIMIT 100
    """,
    category="tpcds",
)
def ds_before_after_ratio_band(spark, sf_dir):
    """TPC-DS Q21 shape: per (warehouse, item) quantity shipped in the
    30 days before vs after a pivot date, keeping pairs whose
    after/before ratio lies in [2/3, 3/2]. One scan, two conditional
    sums, dimension joins broadcast AFTER the aggregate so they see the
    collapsed key set, not the fact table."""
    li = read(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate").between("1997-10-01", "1998-03-31")
    )
    s = read(spark, sf_dir, "supplier")
    p = read(spark, sf_dir, "part")
    pivot = F.lit("1998-01-01").cast("date")
    per = li.groupBy("l_suppkey", "l_partkey").agg(
        F.sum(
            F.when(F.col("l_shipdate") < pivot, F.col("l_quantity")).otherwise(0)
        ).alias("qty_before"),
        F.sum(
            F.when(F.col("l_shipdate") >= pivot, F.col("l_quantity")).otherwise(0)
        ).alias("qty_after"),
    )
    ratio = F.col("qty_after").cast("double") / F.col("qty_before")
    return (
        per.where((F.col("qty_before") > 0) & ratio.between(2.0 / 3.0, 3.0 / 2.0))
        .join(dim(s), per.l_suppkey == s.s_suppkey)
        .join(dim(p), per.l_partkey == p.p_partkey)
        .select("s_name", "p_name", "qty_before", "qty_after")
        .orderBy("s_name", "p_name", "qty_before", "qty_after")
        .limit(100)
    )


@register(
    "ds_onhand_hierarchy_avg",
    oracle="""
    SELECT p_brand, p_type, p_size,
           round(avg(l_quantity), 4) AS avg_qty,
           CAST(grouping(p_brand) + grouping(p_type) + grouping(p_size) AS BIGINT)
             AS lvl
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate BETWEEN DATE '1997-01-01' AND DATE '1997-12-31'
    GROUP BY ROLLUP (p_brand, p_type, p_size)
    ORDER BY lvl, p_brand NULLS FIRST, p_type NULLS FIRST, p_size NULLS FIRST
    LIMIT 100
    """,
    category="tpcds",
)
def ds_onhand_hierarchy_avg(spark, sf_dir):
    """TPC-DS Q22 shape: average quantity on hand over the full item
    hierarchy ROLLUP (brand, type, size) with the grouping level
    exposed. Spark's native rollup produces the Expand + two-phase
    average; part is a broadcast dimension."""
    li = read(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate").between("1997-01-01", "1997-12-31")
    )
    p = read(spark, sf_dir, "part")
    lvl = (
        F.grouping("p_brand") + F.grouping("p_type") + F.grouping("p_size")
    ).cast("long")
    return (
        li.join(dim(p), li.l_partkey == p.p_partkey)
        .rollup("p_brand", "p_type", "p_size")
        .agg(F.round(F.avg("l_quantity"), 4).alias("avg_qty"), lvl.alias("lvl"))
        .orderBy(
            "lvl",
            F.col("p_brand").asc_nulls_first(),
            F.col("p_type").asc_nulls_first(),
            F.col("p_size").asc_nulls_first(),
        )
        .limit(100)
    )


@register(
    "ds_bought_returned_above_avg",
    oracle=f"""
    WITH per_cust AS (
      SELECT c_custkey, c_name,
             CAST(round(sum({_REV_SQL}) * 10000) AS BIGINT) AS ret_rev_i
      FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
      WHERE l_returnflag = 'R'
      GROUP BY c_custkey, c_name
    ),
    tot AS (
      SELECT CAST(sum(ret_rev_i) AS BIGINT) AS total_i, count(*) AS n
      FROM per_cust
    )
    SELECT c_custkey, c_name, round(ret_rev_i / 10000.0, 4) AS ret_rev
    FROM per_cust, tot
    WHERE ret_rev_i > (1.2 * total_i) / n
    ORDER BY ret_rev DESC, c_custkey
    LIMIT 50
    """,
    category="tpcds",
)
def ds_bought_returned_above_avg(spark, sf_dir):
    """TPC-DS Q24 shape: customers whose returned revenue exceeds
    1.2x the average returned revenue over all customers — an
    uncorrelated scalar subquery over the same aggregate. The per-cust
    aggregate is computed once and the scalar average rides a broadcast
    cross-join (one row), not a second fact scan.

    Determinism: per-customer revenue is aggregated in integer 1e-4
    units (exact under any partial-agg order) and the 1.2x-average
    threshold is the identical IEEE expression `(1.2*total_i)/n` of two
    exact integers on both sides — a customer sitting at the boundary
    cannot flip membership with aggregation order."""
    li = read(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    o = read(spark, sf_dir, "orders")
    c = read(spark, sf_dir, "customer")
    per = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(F.round(F.sum(_rev()) * 10000).cast("bigint").alias("ret_rev_i"))
    )
    tot = per.agg(
        F.sum("ret_rev_i").alias("total_i"), F.count(F.lit(1)).alias("n")
    )
    return (
        per.join(dim(tot))
        .where(F.col("ret_rev_i") > (F.lit(1.2) * F.col("total_i")) / F.col("n"))
        .select(
            "c_custkey",
            "c_name",
            F.round(F.col("ret_rev_i") / 10000.0, 4).alias("ret_rev"),
        )
        .orderBy(F.col("ret_rev").desc(), "c_custkey")
        .limit(50)
    )


@register(
    "ds_channel_net_rollup",
    oracle=f"""
    SELECT o_orderpriority AS channel, n_name,
           round(sum(CASE WHEN l_returnflag <> 'R' THEN {_REV_SQL} ELSE 0 END), 4)
             AS sales,
           round(sum(CASE WHEN l_returnflag = 'R' THEN {_REV_SQL} ELSE 0 END), 4)
             AS returns,
           round(sum(CASE WHEN l_returnflag <> 'R' THEN {_REV_SQL}
                          ELSE -{_REV_SQL} END), 4) AS net,
           CAST(grouping(o_orderpriority) + grouping(n_name) AS BIGINT) AS lvl
    FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
    WHERE year(o_orderdate) = 1997
    GROUP BY ROLLUP (o_orderpriority, n_name)
    ORDER BY lvl, channel NULLS FIRST, n_name NULLS FIRST
    """,
    category="tpcds",
)
def ds_channel_net_rollup(spark, sf_dir):
    """TPC-DS Q80 shape: sales, returns, and net profit per
    channel x location with a ROLLUP to channel and grand totals.
    Returns are netted with conditional sums in the same pass instead
    of the original's three-branch UNION — one fact scan, one Expand."""
    li = read(spark, sf_dir, "lineitem")
    o = read(spark, sf_dir, "orders").where(F.year("o_orderdate") == 1997)
    c = read(spark, sf_dir, "customer")
    n = read(spark, sf_dir, "nation")
    rev = _rev()
    is_ret = F.col("l_returnflag") == "R"
    lvl = (F.grouping("o_orderpriority") + F.grouping("n_name")).cast("long")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(dim(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .rollup(F.col("o_orderpriority"), F.col("n_name"))
        .agg(
            F.round(F.sum(F.when(~is_ret, rev).otherwise(0)), 4).alias("sales"),
            F.round(F.sum(F.when(is_ret, rev).otherwise(0)), 4).alias("returns"),
            F.round(F.sum(F.when(~is_ret, rev).otherwise(-rev)), 4).alias("net"),
            lvl.alias("lvl"),
        )
        .withColumnRenamed("o_orderpriority", "channel")
        .orderBy(
            "lvl",
            F.col("channel").asc_nulls_first(),
            F.col("n_name").asc_nulls_first(),
        )
    )


@register(
    "ds_returns_reason_report",
    oracle="""
    SELECT substring(p_type, 1, 7) AS reason_prefix,
           CAST(count(*) AS BIGINT) AS n_returns,
           round(avg(l_quantity), 4) AS avg_qty,
           round(avg(l_extendedprice), 4) AS avg_price,
           round(avg(c_acctbal), 4) AS avg_bal
    FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN part     ON l_partkey = p_partkey
    WHERE l_returnflag = 'R'
      AND ((c_mktsegment = 'BUILDING'  AND c_acctbal BETWEEN 0 AND 5000)
        OR (c_mktsegment = 'HOUSEHOLD' AND c_acctbal BETWEEN 2500 AND 7500)
        OR (c_mktsegment = 'FURNITURE' AND c_acctbal BETWEEN 5000 AND 10000))
      AND l_quantity BETWEEN 5 AND 45
    GROUP BY reason_prefix
    ORDER BY reason_prefix
    """,
    category="tpcds",
)
def ds_returns_reason_report(spark, sf_dir):
    """TPC-DS Q84/Q85 shape: returns report keyed on a truncated
    reason description (substring of p_type stands in for
    r_reason_desc) under OR'd demographic bands. Filter + substring are
    codegen'd; part broadcasts."""
    li = read(spark, sf_dir, "lineitem").where(
        (F.col("l_returnflag") == "R") & F.col("l_quantity").between(5, 45)
    )
    o = read(spark, sf_dir, "orders")
    c = read(spark, sf_dir, "customer")
    p = read(spark, sf_dir, "part")
    bands = (
        ((F.col("c_mktsegment") == "BUILDING") & F.col("c_acctbal").between(0, 5000))
        | (
            (F.col("c_mktsegment") == "HOUSEHOLD")
            & F.col("c_acctbal").between(2500, 7500)
        )
        | (
            (F.col("c_mktsegment") == "FURNITURE")
            & F.col("c_acctbal").between(5000, 10000)
        )
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .where(bands)
        .join(dim(p), li.l_partkey == p.p_partkey)
        .groupBy(F.substring("p_type", 1, 7).alias("reason_prefix"))
        .agg(
            F.count(F.lit(1)).alias("n_returns"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("c_acctbal"), 4).alias("avg_bal"),
        )
        .orderBy("reason_prefix")
    )
