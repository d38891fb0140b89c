"""TPC-DS query shapes, second batch — adapted to the driver's TPC-H-ish
star schema (reference gate:
flink-end-to-end-tests/flink-tpcds-test/tpcds-tool/query/*.sql, run by
test-scripts/test_tpcds.sh:22).

Channel emulation: the fixtures have no store/web/catalog split, so
"channels" are carved from o_orderpriority ('1-URGENT'/'2-HIGH' =
expedited, rest = standard) — the join topology and window shapes of the
originals are kept.

Ratios and big double sums are rounded on BOTH sides (driver hashes
values exactly; engines differ in the last ULP).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from my_flink_1_10_2_spark.queries import read, register
from my_flink_1_10_2_spark.operators.hints import dim


def _rev():
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


_EXP = ("1-URGENT", "2-HIGH")


@register(
    "ds_weekly_dow_ratio",
    oracle="""
    WITH wk AS (
      SELECT weekofyear(o_orderdate) AS wk, year(o_orderdate) AS yr,
             sum(CASE WHEN isodow(o_orderdate) = 1 THEN l_extendedprice * (1 - l_discount) END) AS mon_rev,
             sum(CASE WHEN isodow(o_orderdate) = 5 THEN l_extendedprice * (1 - l_discount) END) AS fri_rev,
             sum(l_extendedprice * (1 - l_discount)) AS tot_rev
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE year(o_orderdate) IN (1996, 1997)
      GROUP BY 1, 2
    )
    SELECT a.wk AS wk,
           round(a.tot_rev / b.tot_rev, 4) AS tot_ratio,
           round(a.mon_rev / b.mon_rev, 4) AS mon_ratio,
           round(a.fri_rev / b.fri_rev, 4) AS fri_ratio
    FROM wk a JOIN wk b ON a.wk = b.wk AND a.yr = 1996 AND b.yr = 1997
    WHERE a.mon_rev > 0 AND b.mon_rev > 0 AND a.fri_rev > 0 AND b.fri_rev > 0
    """,
    category="tpcds",
)
def ds_weekly_dow_ratio(spark, sf_dir):
    """TPC-DS Q2/Q59 shape: day-of-week revenue pivot per week,
    self-joined across consecutive years to produce week-over-week
    ratios.  One fact aggregation reused on both sides of the self-join
    (the reference planner shares the CTE; Spark reuses the exchange)."""
    l = read(spark, sf_dir, "lineitem")
    o = read(spark, sf_dir, "orders")
    wk = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .where(F.year("o_orderdate").isin(1996, 1997))
        .groupBy(
            F.weekofyear("o_orderdate").alias("wk"),
            F.year("o_orderdate").alias("yr"),
        )
        .agg(
            F.sum(F.when(F.weekday("o_orderdate") + 1 == 1, _rev())).alias("mon_rev"),
            F.sum(F.when(F.weekday("o_orderdate") + 1 == 5, _rev())).alias("fri_rev"),
            F.sum(_rev()).alias("tot_rev"),
        )
    )
    a = wk.where(F.col("yr") == 1996).alias("a")
    b = wk.where(F.col("yr") == 1997).alias("b")
    return (
        a.join(b, F.col("a.wk") == F.col("b.wk"))
        .where(
            (F.col("a.mon_rev") > 0) & (F.col("b.mon_rev") > 0)
            & (F.col("a.fri_rev") > 0) & (F.col("b.fri_rev") > 0)
        )
        .select(
            F.col("a.wk").alias("wk"),
            F.round(F.col("a.tot_rev") / F.col("b.tot_rev"), 4).alias("tot_ratio"),
            F.round(F.col("a.mon_rev") / F.col("b.mon_rev"), 4).alias("mon_ratio"),
            F.round(F.col("a.fri_rev") / F.col("b.fri_rev"), 4).alias("fri_ratio"),
        )
    )


@register(
    "ds_two_channel_growth",
    oracle="""
    WITH cy AS (
      SELECT o_custkey AS ck, year(o_orderdate) AS yr,
             CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 'exp' ELSE 'std' END AS chan,
             sum(l_extendedprice * (1 - l_discount)) AS rev
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE year(o_orderdate) IN (1996, 1997)
      GROUP BY 1, 2, 3
    )
    SELECT a96.ck AS custkey,
           round(a97.rev / a96.rev, 4) AS exp_growth,
           round(g97.rev / g96.rev, 4) AS std_growth
    FROM cy a96 JOIN cy a97 ON a96.ck = a97.ck
     AND a96.chan = 'exp' AND a96.yr = 1996 AND a97.chan = 'exp' AND a97.yr = 1997
    JOIN cy g96 ON a96.ck = g96.ck AND g96.chan = 'std' AND g96.yr = 1996
    JOIN cy g97 ON a96.ck = g97.ck AND g97.chan = 'std' AND g97.yr = 1997
    WHERE a96.rev > 0 AND g96.rev > 0
      AND a97.rev / a96.rev > g97.rev / g96.rev
    """,
    category="tpcds",
)
def ds_two_channel_growth(spark, sf_dir):
    """TPC-DS Q11/Q74 shape: per-customer year-over-year growth computed
    independently in two channels, keeping customers whose first-channel
    growth beats the second — a 4-way self-join on one aggregated CTE."""
    l = read(spark, sf_dir, "lineitem")
    o = read(spark, sf_dir, "orders")
    cy = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .where(F.year("o_orderdate").isin(1996, 1997))
        .groupBy(
            F.col("o_custkey").alias("ck"),
            F.year("o_orderdate").alias("yr"),
            F.when(F.col("o_orderpriority").isin(*_EXP), "exp")
            .otherwise("std")
            .alias("chan"),
        )
        .agg(F.sum(_rev()).alias("rev"))
    )

    def slice_(chan, yr, alias):
        return (
            cy.where((F.col("chan") == chan) & (F.col("yr") == yr))
            .select(F.col("ck").alias(f"{alias}_ck"), F.col("rev").alias(f"{alias}_rev"))
        )

    a96, a97 = slice_("exp", 1996, "a96"), slice_("exp", 1997, "a97")
    g96, g97 = slice_("std", 1996, "g96"), slice_("std", 1997, "g97")
    return (
        a96.join(a97, a96.a96_ck == a97.a97_ck)
        .join(g96, a96.a96_ck == g96.g96_ck)
        .join(g97, a96.a96_ck == g97.g97_ck)
        .where(
            (F.col("a96_rev") > 0)
            & (F.col("g96_rev") > 0)
            & (F.col("a97_rev") / F.col("a96_rev")
               > F.col("g97_rev") / F.col("g96_rev"))
        )
        .select(
            F.col("a96_ck").alias("custkey"),
            F.round(F.col("a97_rev") / F.col("a96_rev"), 4).alias("exp_growth"),
            F.round(F.col("g97_rev") / F.col("g96_rev"), 4).alias("std_growth"),
        )
    )


@register(
    "ds_cumulative_crossover_nation",
    oracle="""
    WITH m AS (
      SELECT n_name,
             date_trunc('month', o_orderdate) AS mth,
             sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                      THEN l_extendedprice * (1 - l_discount) ELSE 0 END) AS exp_rev,
             sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                      THEN l_extendedprice * (1 - l_discount) ELSE 0 END) AS std_rev
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
      WHERE year(o_orderdate) = 1996
      GROUP BY 1, 2
    ), cum AS (
      SELECT n_name, mth,
             sum(exp_rev)    OVER w AS cum_exp,
             sum(std_rev) OVER w AS cum_std
      FROM m WINDOW w AS (PARTITION BY n_name ORDER BY mth
                          ROWS UNBOUNDED PRECEDING)
    )
    SELECT n_name, mth, round(cum_exp, 4) AS cum_exp,
           round(cum_std, 4) AS cum_std
    FROM cum WHERE cum_exp > cum_std
    """,
    category="tpcds",
)
def ds_cumulative_crossover_nation(spark, sf_dir):
    """TPC-DS Q51 shape: two per-channel cumulative series compared
    row-by-row, keeping the months where the expedited running total has
    overtaken the standard one.  Q51's FULL OUTER self-join is
    rewritten as one conditional aggregation — one fact scan and one
    window pass instead of two plus a join (the plan the reference's
    planner aims for at scale)."""
    l = read(spark, sf_dir, "lineitem")
    o = read(spark, sf_dir, "orders")
    c = read(spark, sf_dir, "customer")
    n = read(spark, sf_dir, "nation")
    m = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(dim(n), c.c_nationkey == n.n_nationkey)
        .where(F.year("o_orderdate") == 1996)
        .groupBy("n_name", F.date_trunc("month", "o_orderdate").alias("mth"))
        .agg(
            F.sum(F.when(F.col("o_orderpriority").isin(*_EXP), _rev()).otherwise(0)).alias("exp_rev"),
            F.sum(F.when(~F.col("o_orderpriority").isin(*_EXP), _rev()).otherwise(0)).alias("std_rev"),
        )
    )
    w = Window.partitionBy("n_name").orderBy("mth").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        m.select(
            "n_name",
            "mth",
            F.sum("exp_rev").over(w).alias("cum_exp"),
            F.sum("std_rev").over(w).alias("cum_std"),
        )
        .where(F.col("cum_exp") > F.col("cum_std"))
        .select(
            "n_name",
            "mth",
            F.round("cum_exp", 4).alias("cum_exp"),
            F.round("cum_std", 4).alias("cum_std"),
        )
    )


@register(
    "ds_am_pm_ratio",
    oracle="""
    SELECT round(
      CAST((SELECT count(*) FROM events WHERE hour(ts) BETWEEN 6 AND 11) AS DOUBLE)
      /
      CAST((SELECT count(*) FROM events WHERE hour(ts) BETWEEN 18 AND 23) AS DOUBLE),
      4) AS am_pm_ratio
    """,
    category="tpcds",
)
def ds_am_pm_ratio(spark, sf_dir):
    """TPC-DS Q90 shape: the AM/PM count ratio of two scalar subqueries
    over the same fact — folded to a single conditional-count scan."""
    e = read(spark, sf_dir, "events").select(F.hour("ts").alias("h"))
    return e.agg(
        F.round(
            F.sum(F.when(F.col("h").between(6, 11), 1).otherwise(0)).cast("double")
            / F.sum(F.when(F.col("h").between(18, 23), 1).otherwise(0)).cast("double"),
            4,
        ).alias("am_pm_ratio")
    )


@register(
    "ds_no_returns_ratio",
    oracle="""
    WITH sold AS (
      SELECT year(o_orderdate) AS yr, l_partkey AS pk,
             sum(l_quantity) AS qty_all,
             sum(CASE WHEN l_returnflag <> 'R' THEN l_quantity ELSE 0 END) AS qty_kept
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY 1, 2
    )
    SELECT yr, pk AS partkey, qty_all, qty_kept,
           round(qty_kept / qty_all, 4) AS keep_ratio
    FROM sold
    WHERE qty_all >= 200 AND qty_kept / qty_all < 0.5
    """,
    category="tpcds",
)
def ds_no_returns_ratio(spark, sf_dir):
    """TPC-DS Q78 shape: per (year, item) quantity kept after excluding
    returned sales, as a ratio of total — high-volume items dominated by
    returns.  Q78's LEFT JOIN-IS NULL against the returns table folds to
    a conditional sum on the returnflag the fixtures carry."""
    l = read(spark, sf_dir, "lineitem")
    o = read(spark, sf_dir, "orders")
    sold = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy(
            F.year("o_orderdate").alias("yr"), F.col("l_partkey").alias("pk")
        )
        .agg(
            F.sum("l_quantity").alias("qty_all"),
            F.sum(
                F.when(F.col("l_returnflag") != "R", F.col("l_quantity")).otherwise(0)
            ).alias("qty_kept"),
        )
    )
    return (
        sold.where(
            (F.col("qty_all") >= 200)
            & (F.col("qty_kept") / F.col("qty_all") < 0.5)
        )
        .select(
            "yr",
            F.col("pk").alias("partkey"),
            "qty_all",
            "qty_kept",
            F.round(F.col("qty_kept") / F.col("qty_all"), 4).alias("keep_ratio"),
        )
    )


@register(
    "ds_three_year_ratio_chain",
    oracle="""
    WITH cy AS (
      SELECT o_custkey AS ck, year(o_orderdate) AS yr, sum(o_totalprice) AS rev
      FROM orders WHERE year(o_orderdate) IN (1995, 1996, 1997)
      GROUP BY 1, 2
    )
    SELECT a.ck AS custkey,
           round(b.rev / a.rev, 4) AS growth_96,
           round(c.rev / b.rev, 4) AS growth_97
    FROM cy a
    JOIN cy b ON a.ck = b.ck AND a.yr = 1995 AND b.yr = 1996
    JOIN cy c ON a.ck = c.ck AND c.yr = 1997
    WHERE a.rev > 0 AND b.rev > 0 AND c.rev / b.rev > b.rev / a.rev
    """,
    category="tpcds",
)
def ds_three_year_ratio_chain(spark, sf_dir):
    """TPC-DS Q4 shape: the three-period ratio chain — customers whose
    96→97 growth beats their 95→96 growth, via a triple self-join on a
    single per-(customer, year) aggregate."""
    o = read(spark, sf_dir, "orders")
    cy = (
        o.where(F.year("o_orderdate").isin(1995, 1996, 1997))
        .groupBy(F.col("o_custkey").alias("ck"), F.year("o_orderdate").alias("yr"))
        .agg(F.sum("o_totalprice").alias("rev"))
    )
    a = cy.where(F.col("yr") == 1995).select(F.col("ck").alias("a_ck"), F.col("rev").alias("a_rev"))
    b = cy.where(F.col("yr") == 1996).select(F.col("ck").alias("b_ck"), F.col("rev").alias("b_rev"))
    c = cy.where(F.col("yr") == 1997).select(F.col("ck").alias("c_ck"), F.col("rev").alias("c_rev"))
    return (
        a.join(b, F.col("a_ck") == F.col("b_ck"))
        .join(c, F.col("a_ck") == F.col("c_ck"))
        .where(
            (F.col("a_rev") > 0)
            & (F.col("b_rev") > 0)
            & (F.col("c_rev") / F.col("b_rev") > F.col("b_rev") / F.col("a_rev"))
        )
        .select(
            F.col("a_ck").alias("custkey"),
            F.round(F.col("b_rev") / F.col("a_rev"), 4).alias("growth_96"),
            F.round(F.col("c_rev") / F.col("b_rev"), 4).alias("growth_97"),
        )
    )


@register(
    "ds_quantity_cov",
    oracle="""
    SELECT l_partkey AS partkey,
           count(*) AS n_lines,
           round(avg(l_quantity), 4) AS mean_qty,
           round(stddev_samp(l_quantity) / avg(l_quantity), 4) AS cov
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE year(o_orderdate) = 1996
    GROUP BY 1
    HAVING count(*) >= 8 AND stddev_samp(l_quantity) / avg(l_quantity) > 0.6
    """,
    category="tpcds",
)
def ds_quantity_cov(spark, sf_dir):
    """TPC-DS Q17 shape: per-item quantity coefficient of variation
    (stdev/mean) over a year, keeping erratic items — the statistical
    aggregate family the DS gate exercises."""
    l = read(spark, sf_dir, "lineitem")
    o = read(spark, sf_dir, "orders")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .where(F.year("o_orderdate") == 1996)
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.avg("l_quantity").alias("mean_raw"),
            F.stddev_samp("l_quantity").alias("sd_raw"),
        )
        .where(
            (F.col("n_lines") >= 8)
            & (F.col("sd_raw") / F.col("mean_raw") > 0.6)
        )
        .select(
            "partkey",
            "n_lines",
            F.round("mean_raw", 4).alias("mean_qty"),
            F.round(F.col("sd_raw") / F.col("mean_raw"), 4).alias("cov"),
        )
    )


@register(
    "ds_exists_both_channels",
    oracle="""
    SELECT c_custkey AS custkey, c_mktsegment
    FROM customer
    WHERE EXISTS (
        SELECT 1 FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        WHERE o_custkey = c_custkey AND o_orderpriority IN ('1-URGENT', '2-HIGH')
      )
      AND EXISTS (
        SELECT 1 FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        WHERE o_custkey = c_custkey AND o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
      )
      AND NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
      )
    """,
    category="tpcds",
)
def ds_exists_both_channels(spark, sf_dir):
    """TPC-DS Q35/Q69 shape: EXISTS in channel A AND EXISTS in channel B
    AND NOT EXISTS in a third — compiled to two semi-joins and one
    anti-join on the customer key."""
    c = read(spark, sf_dir, "customer")
    o = read(spark, sf_dir, "orders")
    l = read(spark, sf_dir, "lineitem")
    ol = o.join(l, o.o_orderkey == l.l_orderkey).select(
        "o_custkey", "o_orderpriority"
    )
    air = ol.where(F.col("o_orderpriority").isin(*_EXP))
    ground = ol.where(~F.col("o_orderpriority").isin(*_EXP))
    urgent = o.where(F.col("o_orderpriority") == "1-URGENT")
    return (
        c.join(air, c.c_custkey == air.o_custkey, "left_semi")
        .join(ground, c.c_custkey == ground.o_custkey, "left_semi")
        .join(urgent, c.c_custkey == urgent.o_custkey, "left_anti")
        .select(F.col("c_custkey").alias("custkey"), "c_mktsegment")
    )
