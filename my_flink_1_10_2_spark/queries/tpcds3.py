"""TPC-DS query shapes, third batch — adapted to the driver's TPC-H-ish
star schema (reference gate:
flink-end-to-end-tests/flink-tpcds-test/tpcds-tool/query/*.sql, run by
test-scripts/test_tpcds.sh:22). Shapes this batch: Q36/Q86/Q70 rollup
hierarchy rank, Q40 before/after pivot, Q58 cross-channel tolerance,
Q65 min-vs-avg laggards, Q94/Q95 multi-supplier-no-return, Q92 excess
discount, Q6 above-category-average buyers, Q31 quarter-over-quarter geo
growth, Q41 OR-predicate variant filter, Q29 multi-period quantity.

Channel emulation as in batch two: o_orderpriority carves "channels".
Ratios and big double sums are rounded on BOTH sides; conditional-count
sums CAST to BIGINT on the oracle side (DuckDB sum(int) is HUGEINT →
float in pandas, and the driver hashes ints and floats differently).
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
    "ds_hierarchy_rank",
    oracle=f"""
    WITH agg AS (
      SELECT r_name, n_name,
             grouping(r_name) + grouping(n_name) AS lochierarchy,
             sum({_REV_SQL}) AS rev
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      WHERE year(o_orderdate) = 1997
      GROUP BY ROLLUP (r_name, n_name)
    )
    SELECT CAST(lochierarchy AS BIGINT) AS lochierarchy,
           coalesce(r_name, 'ALL') AS r_name,
           coalesce(n_name, 'ALL') AS n_name,
           round(rev, 4) AS rev,
           CAST(row_number() OVER (
             PARTITION BY lochierarchy, coalesce(r_name, 'ALL')
             ORDER BY round(rev, 4) DESC, coalesce(n_name, 'ALL')
           ) AS BIGINT) AS rk
    FROM agg
    """,
    category="tpcds",
)
def ds_hierarchy_rank(spark, sf_dir):
    """TPC-DS Q36/Q86/Q70 shape: ROLLUP over a geographic hierarchy with
    GROUPING()-derived hierarchy level and a rank within each (level,
    parent) — the lochierarchy idiom. Catalyst plans the rollup as one
    Expand + single shuffle; the rank adds one window exchange."""
    li = read(spark, sf_dir, "lineitem")
    o = read(spark, sf_dir, "orders").where(F.year("o_orderdate") == 1997)
    c = read(spark, sf_dir, "customer")
    n = read(spark, sf_dir, "nation")
    r = read(spark, sf_dir, "region")
    base = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(dim(n), c.c_nationkey == n.n_nationkey)
        .join(dim(r), n.n_regionkey == r.r_regionkey)
    )
    agg = base.rollup("r_name", "n_name").agg(
        (F.grouping("r_name") + F.grouping("n_name")).cast("bigint").alias("lochierarchy"),
        F.sum(_rev()).alias("rev"),
    )
    w = Window.partitionBy(
        "lochierarchy", F.coalesce("r_name", F.lit("ALL"))
    ).orderBy(F.round("rev", 4).desc(), F.coalesce("n_name", F.lit("ALL")))
    return agg.select(
        "lochierarchy",
        F.coalesce("r_name", F.lit("ALL")).alias("r_name"),
        F.coalesce("n_name", F.lit("ALL")).alias("n_name"),
        F.round("rev", 4).alias("rev"),
        F.row_number().over(w).cast("bigint").alias("rk"),
    )


@register(
    "ds_before_after_pivot",
    oracle=f"""
    SELECT p_brand,
           round(coalesce(sum(CASE WHEN l_shipdate <  TIMESTAMP '1998-06-01'
                              THEN {_REV_SQL} END), 0), 4) AS before_rev,
           round(coalesce(sum(CASE WHEN l_shipdate >= TIMESTAMP '1998-06-01'
                              THEN {_REV_SQL} END), 0), 4) AS after_rev
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate BETWEEN TIMESTAMP '1998-03-03' AND TIMESTAMP '1998-08-30'
    GROUP BY p_brand
    """,
    category="tpcds",
)
def ds_before_after_pivot(spark, sf_dir):
    """TPC-DS Q40 shape: revenue split before/after a pivot date within a
    ±90-day window, per brand — one conditional-sum pass, no self-join."""
    li = read(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate").between("1998-03-03", "1998-08-30")
    )
    p = read(spark, sf_dir, "part")
    pivot = F.lit("1998-06-01").cast("timestamp_ntz")
    return (
        li.join(dim(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.round(
                F.coalesce(F.sum(F.when(F.col("l_shipdate") < pivot, _rev())), F.lit(0)), 4
            ).alias("before_rev"),
            F.round(
                F.coalesce(F.sum(F.when(F.col("l_shipdate") >= pivot, _rev())), F.lit(0)), 4
            ).alias("after_rev"),
        )
    )


@register(
    "ds_channel_tolerance",
    oracle=f"""
    WITH per AS (
      SELECT p_brand,
             sum(CASE WHEN c_mktsegment = 'BUILDING'  THEN {_REV_SQL} END) AS rev_a,
             sum(CASE WHEN c_mktsegment = 'MACHINERY' THEN {_REV_SQL} END) AS rev_b,
             sum(CASE WHEN c_mktsegment = 'HOUSEHOLD' THEN {_REV_SQL} END) AS rev_c
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN part     ON l_partkey = p_partkey
      WHERE year(o_orderdate) = 1997
      GROUP BY p_brand
    )
    SELECT p_brand, round(rev_a, 4) AS rev_a, round(rev_b, 4) AS rev_b,
           round(rev_c, 4) AS rev_c
    FROM per
    WHERE rev_a IS NOT NULL AND rev_b IS NOT NULL AND rev_c IS NOT NULL
      AND rev_a BETWEEN 0.9 * (rev_a + rev_b + rev_c) / 3
                    AND 1.1 * (rev_a + rev_b + rev_c) / 3
      AND rev_b BETWEEN 0.9 * (rev_a + rev_b + rev_c) / 3
                    AND 1.1 * (rev_a + rev_b + rev_c) / 3
      AND rev_c BETWEEN 0.9 * (rev_a + rev_b + rev_c) / 3
                    AND 1.1 * (rev_a + rev_b + rev_c) / 3
    """,
    category="tpcds",
)
def ds_channel_tolerance(spark, sf_dir):
    """TPC-DS Q58 shape: brands whose per-channel revenues are each
    within ±10% of the cross-channel average (the original's exact band)
    — three conditional sums in one aggregation, band filter after.
    Channels = customer market segments (balanced ~1/5 each, unlike the
    skewed order priorities)."""
    li = read(spark, sf_dir, "lineitem")
    o = read(spark, sf_dir, "orders").where(F.year("o_orderdate") == 1997)
    c = read(spark, sf_dir, "customer")
    p = read(spark, sf_dir, "part")
    per = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(dim(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.sum(F.when(F.col("c_mktsegment") == "BUILDING", _rev())).alias("rev_a"),
            F.sum(F.when(F.col("c_mktsegment") == "MACHINERY", _rev())).alias("rev_b"),
            F.sum(F.when(F.col("c_mktsegment") == "HOUSEHOLD", _rev())).alias("rev_c"),
        )
    )
    mean3 = (F.col("rev_a") + F.col("rev_b") + F.col("rev_c")) / 3
    band = lambda c: F.col(c).between(0.9 * mean3, 1.1 * mean3)  # noqa: E731
    return (
        per.where(
            F.col("rev_a").isNotNull()
            & F.col("rev_b").isNotNull()
            & F.col("rev_c").isNotNull()
            & band("rev_a")
            & band("rev_b")
            & band("rev_c")
        )
        .select(
            "p_brand",
            F.round("rev_a", 4).alias("rev_a"),
            F.round("rev_b", 4).alias("rev_b"),
            F.round("rev_c", 4).alias("rev_c"),
        )
    )


@register(
    "ds_min_vs_avg",
    oracle=f"""
    WITH per_part AS (
      SELECT p_brand, p_partkey,
             CAST(round(sum({_REV_SQL}) * 10000) AS BIGINT) AS rev_i
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY p_brand, p_partkey
    )
    SELECT p_brand,
           min(rev_i) / 10000.0 AS min_rev,
           round(avg(rev_i) / 10000.0, 4) AS avg_rev
    FROM per_part
    GROUP BY p_brand
    HAVING min(rev_i) <= 0.5 * avg(rev_i)
    """,
    category="tpcds",
)
def ds_min_vs_avg(spark, sf_dir):
    """TPC-DS Q65 shape: brands carrying at least one laggard part whose
    revenue is ≤ half the brand's per-part average — two stacked
    aggregations, no self-join (the reference writes it as a join of the
    per-part CTE against its own re-aggregation; one HAVING is the same
    relation algebra with one fewer shuffle)."""
    li = read(spark, sf_dir, "lineitem")
    p = read(spark, sf_dir, "part")
    per_part = (
        li.join(dim(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_partkey")
        .agg(F.round(F.sum(_rev()) * 10000).cast("bigint").alias("rev_i"))
    )
    # integer 1e-4 units: min/avg and the 0.5x membership compare exact
    # bigints / identical IEEE divisions on both engines
    return (
        per_part.groupBy("p_brand")
        .agg(F.min("rev_i").alias("__min_i"), F.avg("rev_i").alias("__avg_i"))
        .where(F.col("__min_i") <= 0.5 * F.col("__avg_i"))
        .select(
            "p_brand",
            (F.col("__min_i") / 10000.0).alias("min_rev"),
            F.round(F.col("__avg_i") / 10000.0, 4).alias("avg_rev"),
        )
    )


@register(
    "ds_multi_supplier_no_return",
    oracle="""
    WITH per_order AS (
      SELECT l_orderkey,
             count(DISTINCT l_suppkey) AS n_supp,
             max(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS any_return
      FROM lineitem GROUP BY l_orderkey
    )
    SELECT CAST(count(*) AS BIGINT) AS order_count,
           round(sum(o_totalprice), 4) AS total_price
    FROM orders JOIN per_order ON o_orderkey = l_orderkey
    WHERE n_supp >= 2 AND any_return = 0
    """,
    category="tpcds",
)
def ds_multi_supplier_no_return(spark, sf_dir):
    """TPC-DS Q94/Q95 shape (ship-from-multiple-warehouses, never
    returned): orders whose lineitems span ≥2 suppliers with zero
    returns — per-order distinct-count + EXISTS folded into one
    aggregation, then a count/sum rollup."""
    li = read(spark, sf_dir, "lineitem")
    o = read(spark, sf_dir, "orders")
    per_order = li.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.max(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias("any_return"),
    )
    return (
        o.join(per_order, o.o_orderkey == per_order.l_orderkey)
        .where((F.col("n_supp") >= 2) & (F.col("any_return") == 0))
        .agg(
            F.count("*").alias("order_count"),
            F.round(F.sum("o_totalprice"), 4).alias("total_price"),
        )
    )


@register(
    "ds_excess_discount",
    oracle="""
    WITH avg_disc AS (
      SELECT l_partkey AS pk, avg(l_discount) AS ad
      FROM lineitem
      WHERE l_shipdate BETWEEN TIMESTAMP '1997-01-01' AND TIMESTAMP '1997-12-31'
      GROUP BY l_partkey
    )
    SELECT round(sum(l_extendedprice), 4) AS excess_revenue
    FROM lineitem JOIN avg_disc ON l_partkey = pk
    WHERE l_shipdate BETWEEN TIMESTAMP '1997-01-01' AND TIMESTAMP '1997-12-31'
      AND l_discount > 1.3 * ad
    """,
    category="tpcds",
)
def ds_excess_discount(spark, sf_dir):
    """TPC-DS Q92 shape: revenue from lineitems discounted more than
    1.3× the same part's average discount — the correlated scalar
    subquery decorrelated into a per-part aggregate join."""
    li = read(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate").between("1997-01-01", "1997-12-31")
    )
    avg_disc = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.avg("l_discount").alias("ad")
    )
    return (
        li.join(avg_disc, li.l_partkey == F.col("pk"))
        .where(F.col("l_discount") > 1.3 * F.col("ad"))
        .agg(F.round(F.sum("l_extendedprice"), 4).alias("excess_revenue"))
    )


@register(
    "ds_above_type_avg_buyers",
    oracle="""
    WITH type_avg AS (
      SELECT p_type AS ty, avg(p_retailprice) AS ap FROM part GROUP BY p_type
    ),
    pricey AS (
      SELECT p_partkey FROM part JOIN type_avg ON p_type = ty
      WHERE p_retailprice >= 1.04 * ap
    )
    SELECT n_name, CAST(count(DISTINCT c_custkey) AS BIGINT) AS buyers
    FROM lineitem
    JOIN pricey   ON l_partkey = p_partkey
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    GROUP BY n_name
    HAVING count(DISTINCT c_custkey) >= 60
    """,
    category="tpcds",
)
def ds_above_type_avg_buyers(spark, sf_dir):
    """TPC-DS Q6 shape: nations with ≥60 distinct customers buying parts
    priced above their type's average (1.04× — retail prices are uniform
    900-1000, so the original's 1.2× would be vacuous) — category-average
    subquery joined back to the fact, distinct-count per geography."""
    p = read(spark, sf_dir, "part")
    type_avg = p.groupBy(F.col("p_type").alias("ty")).agg(
        F.avg("p_retailprice").alias("ap")
    )
    pricey = (
        p.join(dim(type_avg), p.p_type == F.col("ty"))
        .where(F.col("p_retailprice") >= 1.04 * F.col("ap"))
        .select("p_partkey")
    )
    li = read(spark, sf_dir, "lineitem")
    o = read(spark, sf_dir, "orders")
    c = read(spark, sf_dir, "customer")
    n = read(spark, sf_dir, "nation")
    return (
        li.join(dim(pricey), li.l_partkey == pricey.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(dim(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.countDistinct("c_custkey").alias("buyers"))
        .where(F.col("buyers") >= 60)
    )


@register(
    "ds_quarterly_geo_growth",
    oracle=f"""
    WITH q AS (
      SELECT r_name, quarter(o_orderdate) AS qtr, sum({_REV_SQL}) AS rev
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      WHERE year(o_orderdate) = 1997
      GROUP BY r_name, quarter(o_orderdate)
    )
    SELECT q1.r_name AS r_name,
           round(q2.rev / q1.rev, 4) AS g12,
           round(q3.rev / q2.rev, 4) AS g23
    FROM q q1 JOIN q q2 ON q1.r_name = q2.r_name AND q1.qtr = 1 AND q2.qtr = 2
              JOIN q q3 ON q1.r_name = q3.r_name AND q3.qtr = 3
    WHERE q2.rev / q1.rev > q3.rev / q2.rev
    """,
    category="tpcds",
)
def ds_quarterly_geo_growth(spark, sf_dir):
    """TPC-DS Q31 shape: quarter-over-quarter revenue growth per region,
    keeping regions whose Q1→Q2 growth beat Q2→Q3 — one grouped CTE
    self-joined three ways on the geo key (Spark reuses the exchange)."""
    li = read(spark, sf_dir, "lineitem")
    o = read(spark, sf_dir, "orders").where(F.year("o_orderdate") == 1997)
    c = read(spark, sf_dir, "customer")
    n = read(spark, sf_dir, "nation")
    r = read(spark, sf_dir, "region")
    q = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(dim(n), c.c_nationkey == n.n_nationkey)
        .join(dim(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", F.quarter("o_orderdate").alias("qtr"))
        .agg(F.sum(_rev()).alias("rev"))
    )
    q1 = q.where(F.col("qtr") == 1).select(F.col("r_name"), F.col("rev").alias("r1"))
    q2 = q.where(F.col("qtr") == 2).select(F.col("r_name").alias("rn2"), F.col("rev").alias("r2"))
    q3 = q.where(F.col("qtr") == 3).select(F.col("r_name").alias("rn3"), F.col("rev").alias("r3"))
    return (
        q1.join(q2, q1.r_name == q2.rn2)
        .join(q3, q1.r_name == q3.rn3)
        .where(F.col("r2") / F.col("r1") > F.col("r3") / F.col("r2"))
        .select(
            "r_name",
            F.round(F.col("r2") / F.col("r1"), 4).alias("g12"),
            F.round(F.col("r3") / F.col("r2"), 4).alias("g23"),
        )
    )


@register(
    "ds_or_predicate_variants",
    oracle="""
    SELECT p_brand, CAST(count(*) AS BIGINT) AS variants
    FROM part
    WHERE (p_type = 'PROMO'    AND p_size BETWEEN 1 AND 15)
       OR (p_type = 'ECONOMY'  AND p_size BETWEEN 20 AND 30)
       OR (p_type = 'STANDARD' AND p_size BETWEEN 35 AND 50)
    GROUP BY p_brand
    HAVING count(*) >= 5
    """,
    category="tpcds",
)
def ds_or_predicate_variants(spark, sf_dir):
    """TPC-DS Q41 shape: dimension-only query with a nested OR-of-ANDs
    predicate and a HAVING variant-count gate — tests predicate
    normalization/pushdown on a pure dim scan (no fact join at all)."""
    p = read(spark, sf_dir, "part")
    cond = (
        ((F.col("p_type") == "PROMO") & F.col("p_size").between(1, 15))
        | ((F.col("p_type") == "ECONOMY") & F.col("p_size").between(20, 30))
        | ((F.col("p_type") == "STANDARD") & F.col("p_size").between(35, 50))
    )
    return (
        p.where(cond)
        .groupBy("p_brand")
        .agg(F.count("*").alias("variants"))
        .where(F.col("variants") >= 5)
    )


@register(
    "ds_multi_period_quantity",
    oracle="""
    WITH per AS (
      SELECT p_brand,
             sum(CASE WHEN year(o_orderdate) = 1996 THEN l_quantity END) AS q1,
             sum(CASE WHEN year(o_orderdate) = 1997 THEN l_quantity END) AS q2,
             sum(CASE WHEN year(o_orderdate) = 1998 THEN l_quantity END) AS q3
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN part   ON l_partkey = p_partkey
      GROUP BY p_brand
    )
    SELECT p_brand,
           round(q1, 4) AS q1, round(q2, 4) AS q2, round(q3, 4) AS q3,
           round(q2 / q1, 4) AS g12, round(q3 / q2, 4) AS g23
    FROM per
    WHERE q1 IS NOT NULL AND q2 IS NOT NULL AND q3 IS NOT NULL
    """,
    category="tpcds",
)
def ds_multi_period_quantity(spark, sf_dir):
    """TPC-DS Q29/Q25 shape: per-brand quantity across three consecutive
    years from one fact pass (three conditional sums replace the
    original's three-way fact self-join), with period-over-period
    ratios."""
    li = read(spark, sf_dir, "lineitem")
    o = read(spark, sf_dir, "orders")
    p = read(spark, sf_dir, "part")
    yr = F.year("o_orderdate")
    per = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(dim(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.sum(F.when(yr == 1996, F.col("l_quantity"))).alias("q1"),
            F.sum(F.when(yr == 1997, F.col("l_quantity"))).alias("q2"),
            F.sum(F.when(yr == 1998, F.col("l_quantity"))).alias("q3"),
        )
    )
    return (
        per.where(
            F.col("q1").isNotNull() & F.col("q2").isNotNull() & F.col("q3").isNotNull()
        )
        .select(
            "p_brand",
            F.round("q1", 4).alias("q1"),
            F.round("q2", 4).alias("q2"),
            F.round("q3", 4).alias("q3"),
            F.round(F.col("q2") / F.col("q1"), 4).alias("g12"),
            F.round(F.col("q3") / F.col("q2"), 4).alias("g23"),
        )
    )
