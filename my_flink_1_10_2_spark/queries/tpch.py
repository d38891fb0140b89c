"""TPC-H-adapted decision-support suite over the driver star schema.

The reference gates correctness on full TPC-H/TPC-DS golden-answer runs
(ref: flink-end-to-end-tests/test-scripts/test_tpch.sh:22,
flink-end-to-end-tests/flink-tpcds-test/tpcds-tool/query/). The driver
schema lacks `partsupp` and the comment/date columns some queries need,
so each query here is the closest faithful adaptation that still
exercises the same plan shape (join topology, subquery class, aggregate
structure) as its TPC-H namesake.

Scale notes (100 TB discipline):
  - Dimension tables (region/nation/supplier/part at this ratio) ride
    broadcast joins — no shuffle of the fact table for enrichment.
  - EXISTS / NOT IN / scalar subqueries are planned by Catalyst into
    semi/anti/broadcast joins (the reference does the identical rewrite in
    FlinkSubQueryRemoveRule.scala / ReplaceMinusWithAntiJoinRule.scala).
  - All aggregates are partial/final hash aggregates: map-side combine
    happens before any shuffle, so the shuffled volume is |groups|, not
    |rows|.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from my_flink_1_10_2_spark.queries import read, register
from my_flink_1_10_2_spark.operators.hints import dim


def _revenue():
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


_TS = "timestamp_ntz"


@register(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    """,
    category="tpch",
)
def q4_order_priority(spark, sf_dir):
    """TPC-H Q4: EXISTS correlated subquery → left-semi join + agg
    (ref rewrite: FlinkSubQueryRemoveRule.scala)."""
    orders = read(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast(_TS))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast(_TS))
    )
    lineitem = read(spark, sf_dir, "lineitem")
    semi = orders.join(
        lineitem,
        (orders.o_orderkey == lineitem.l_orderkey) & (lineitem.l_shipdate > orders.o_orderdate),
        "left_semi",
    )
    return semi.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


@register(
    "q6_forecast_revenue",
    oracle="""
    SELECT sum(l_extendedprice * l_discount) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.04 AND 0.08
      AND l_quantity < 24
    """,
    category="tpch",
)
def q6_forecast_revenue(spark, sf_dir):
    """TPC-H Q6: pure scan-filter-aggregate. All four predicates reach the
    parquet scan as PushedFilters; only 4 columns are read."""
    l = read(spark, sf_dir, "lineitem")
    return (
        l.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast(_TS))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast(_TS))
            & (F.col("l_discount") >= 0.04)
            & (F.col("l_discount") <= 0.08)
            & (F.col("l_quantity") < 24)
        )
        .agg(F.sum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"))
    )


@register(
    "q7_volume_shipping",
    oracle="""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l_shipdate) AS INTEGER) AS l_year,
           sum(l_extendedprice * (1 - l_discount)) AS revenue
    FROM supplier
    JOIN lineitem ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
       OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3')
    GROUP BY supp_nation, cust_nation, l_year
    """,
    category="tpch",
)
def q7_volume_shipping(spark, sf_dir):
    """TPC-H Q7: 6-way join with disjunctive cross-dimension filter.
    nation/supplier broadcast; only lineitem⋈orders⋈customer shuffle."""
    l = read(spark, sf_dir, "lineitem")
    o = read(spark, sf_dir, "orders")
    c = read(spark, sf_dir, "customer")
    s = read(spark, sf_dir, "supplier")
    n1 = read(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = read(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    joined = (
        l.join(dim(s), l.l_suppkey == s.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(dim(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(dim(n2), F.col("c_nationkey") == F.col("n2_key"))
        .where(
            ((F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7"))
            | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3"))
        )
    )
    return joined.groupBy(
        "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
    ).agg(F.sum(_revenue()).alias("revenue"))


@register(
    "q8_market_share",
    oracle="""
    SELECT o_year,
           round(sum(CASE WHEN supp_nation = 'NATION_5' THEN volume ELSE 0 END)
                 / sum(volume), 6) AS mkt_share
    FROM (
      SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
             l_extendedprice * (1 - l_discount) AS volume,
             n2.n_name AS supp_nation
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      JOIN region   ON n1.n_regionkey = r_regionkey
      WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
    ) all_nations
    GROUP BY o_year
    """,
    category="tpch",
)
def q8_market_share(spark, sf_dir):
    """TPC-H Q8: national market share — 8-way join + conditional agg
    ratio (the reference's CASE-inside-SUM shape, FlinkSqlOperatorTable
    CASE :233)."""
    p = read(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY")
    l = read(spark, sf_dir, "lineitem")
    s = read(spark, sf_dir, "supplier")
    o = read(spark, sf_dir, "orders")
    c = read(spark, sf_dir, "customer")
    n1 = read(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = read(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    r = read(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    base = (
        l.join(dim(p), l.l_partkey == p.p_partkey)
        .join(dim(s), l.l_suppkey == s.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(dim(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(dim(n2), F.col("s_nationkey") == F.col("n2_key"))
        .join(dim(r), F.col("n1_region") == F.col("r_regionkey"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            _revenue().alias("volume"),
            F.col("supp_nation"),
        )
    )
    return base.groupBy("o_year").agg(
        F.round(
            F.sum(F.when(F.col("supp_nation") == "NATION_5", F.col("volume")).otherwise(0.0))
            / F.sum("volume"),
            6,
        ).alias("mkt_share")
    )


@register(
    "q9_profit_by_nation_year",
    oracle="""
    SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS o_year,
           round(sum(l_extendedprice * (1 - l_discount) - 0.5 * p_retailprice * l_quantity),
                 4) AS sum_profit
    FROM part
    JOIN lineitem ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%red%'
    GROUP BY n_name, year(o_orderdate)
    """,
    category="tpch",
)
def q9_profit_by_nation_year(spark, sf_dir):
    """TPC-H Q9 (supply cost ≈ 0.5·retailprice since partsupp is absent):
    LIKE-filtered part broadcast into the fact join."""
    p = read(spark, sf_dir, "part").where(F.col("p_name").like("%red%"))
    l = read(spark, sf_dir, "lineitem")
    s = read(spark, sf_dir, "supplier")
    o = read(spark, sf_dir, "orders")
    n = read(spark, sf_dir, "nation")
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - 0.5 * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    base = (
        l.join(dim(p), l.l_partkey == p.p_partkey)
        .join(dim(s), l.l_suppkey == s.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(dim(n), F.col("s_nationkey") == F.col("n_nationkey"))
    )
    return base.groupBy(
        F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year")
    ).agg(F.round(F.sum(profit), 4).alias("sum_profit"))


@register(
    "q12_priority_by_status",
    oracle="""
    SELECT l_linestatus,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY l_linestatus
    """,
    category="tpch",
)
def q12_priority_by_status(spark, sf_dir):
    """TPC-H Q12 shape (shipmode → linestatus): join + dual conditional
    counts in one aggregate pass."""
    o = read(spark, sf_dir, "orders")
    l = read(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast(_TS))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast(_TS))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "q13_order_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
      GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    """,
    category="tpch",
)
def q13_order_distribution(spark, sf_dir):
    """TPC-H Q13: left outer join with non-key predicate + two stacked
    aggregations (customers with zero orders must survive as c_count=0)."""
    c = read(spark, sf_dir, "customer")
    o = read(spark, sf_dir, "orders").where(F.col("o_orderpriority") != "5-LOW")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@register(
    "q14_promo_revenue",
    oracle="""
    SELECT 100.00 * sum(CASE WHEN p_type = 'PROMO'
                             THEN l_extendedprice * (1 - l_discount)
                             ELSE 0 END)
           / sum(l_extendedprice * (1 - l_discount)) AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-06-01'
      AND l_shipdate < TIMESTAMP '1997-07-01'
    """,
    category="tpch",
)
def q14_promo_revenue(spark, sf_dir):
    """TPC-H Q14: promo revenue share — broadcast part into the
    date-pruned lineitem scan, conditional-agg ratio."""
    l = read(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-06-01").cast(_TS))
        & (F.col("l_shipdate") < F.lit("1997-07-01").cast(_TS))
    )
    p = read(spark, sf_dir, "part")
    rev = _revenue()
    return (
        l.join(dim(p), l.l_partkey == p.p_partkey)
        .agg(
            (
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev)
            ).alias("promo_revenue")
        )
    )


@register(
    "q15_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             sum(l_extendedprice * (1 - l_discount)) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1997-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
    category="tpch",
)
def q15_top_supplier(spark, sf_dir):
    """TPC-H Q15: CTE revenue view + scalar-subquery max filter. The max
    is a broadcast single-row join, not a driver collect."""
    l = read(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast(_TS))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast(_TS))
    )
    revenue = l.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_revenue()).alias("total_revenue")
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    s = read(spark, sf_dir, "supplier")
    return (
        revenue.join(dim(max_rev), revenue.total_revenue == max_rev.max_revenue)
        .join(s, F.col("supplier_no") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "q16_part_supplier_count",
    oracle="""
    SELECT p_brand, p_type, p_size,
           count(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#3'
      AND p_type NOT IN ('PROMO', 'ECONOMY')
      AND p_size IN (1, 4, 9, 16, 25, 36, 49)
    GROUP BY p_brand, p_type, p_size
    """,
    category="tpch",
)
def q16_part_supplier_count(spark, sf_dir):
    """TPC-H Q16 shape (partsupp → lineitem): NOT-IN value lists +
    COUNT(DISTINCT) — Spark plans the distinct via Expand, two-phase."""
    p = read(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#3")
        & (~F.col("p_type").isin("PROMO", "ECONOMY"))
        & (F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49))
    )
    l = read(spark, sf_dir, "lineitem")
    return (
        l.join(dim(p), l.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q18_large_volume_customer",
    oracle="""
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
           sum(l_quantity) AS sum_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING sum(l_quantity) > 150
    )
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    """,
    category="tpch",
)
def q18_large_volume_customer(spark, sf_dir):
    """TPC-H Q18: HAVING-filtered key set semi-joined back into the
    3-way fact join (the IN ( …GROUP BY… HAVING ) pattern)."""
    l = read(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .where(F.col("q") > 150)
        .select("l_orderkey")
    )
    c = read(spark, sf_dir, "customer")
    o = read(spark, sf_dir, "orders")
    o_big = o.join(big.withColumnRenamed("l_orderkey", "bk"), F.col("o_orderkey") == F.col("bk"), "left_semi")
    return (
        c.join(o_big, c.c_custkey == o_big.o_custkey)
        .join(l, F.col("o_orderkey") == l.l_orderkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum("l_quantity").alias("sum_qty"))
    )


@register(
    "q19_disjunctive_revenue",
    oracle="""
    SELECT CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(round(l_discount * 100) AS BIGINT)))
           AS BIGINT) AS revenue_e4
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 1 AND l_quantity <= 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
           AND l_quantity >= 10 AND l_quantity <= 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
           AND l_quantity >= 20 AND l_quantity <= 30)
    """,
    category="tpch",
)
def q19_disjunctive_revenue(spark, sf_dir):
    """TPC-H Q19: three OR'd conjunct groups across both join sides —
    the classic disjunctive-predicate join the reference handles in
    BatchExecHashJoin + post-filter.  Revenue is graded in integer
    1e-4-dollar units (cents × discount-complement-percent): the raw
    double sum's hash-agg accumulation order diverged between engines
    at sf0.1 (3e-08 — the q_count_window class), and the integer sum is
    order-independent."""
    l = read(spark, sf_dir, "lineitem")
    p = read(spark, sf_dir, "part")
    q = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15) & q.between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 25) & q.between(10, 20))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 35) & q.between(20, 30))
    )
    rev_e4 = F.round(F.col("l_extendedprice") * 100).cast("bigint") * (
        F.lit(100) - F.round(F.col("l_discount") * 100).cast("bigint")
    )
    return (
        l.join(dim(p), l.l_partkey == p.p_partkey)
        .where(cond)
        .agg(F.sum(rev_e4).cast("bigint").alias("revenue_e4"))
    )


@register(
    "q22_idle_customers",
    oracle="""
    SELECT c_nationkey, count(*) AS numcust, round(sum(c_acctbal), 4) AS totacctbal
    FROM customer
    WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
    GROUP BY c_nationkey
    """,
    category="tpch",
)
def q22_idle_customers(spark, sf_dir):
    """TPC-H Q22: scalar-subquery threshold + NOT EXISTS anti join
    (ref: ReplaceMinusWithAntiJoinRule.scala shape)."""
    c = read(spark, sf_dir, "customer")
    avg_bal = c.where(F.col("c_acctbal") > 0.0).agg(F.avg("c_acctbal").alias("avg_bal"))
    o = read(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    rich = c.join(dim(avg_bal), c.c_acctbal > F.col("avg_bal")).drop("avg_bal")
    idle = rich.join(o, rich.c_custkey == o.o_custkey, "left_anti")
    return idle.groupBy("c_nationkey").agg(
        F.count("*").alias("numcust"), F.round(F.sum("c_acctbal"), 4).alias("totacctbal")
    )


@register(
    "q2_min_cost_supplier",
    oracle="""
    WITH ps AS (SELECT DISTINCT l_partkey AS partkey, l_suppkey AS suppkey
                FROM lineitem)
    SELECT p_partkey, p_name, s_name, s_acctbal
    FROM part
    JOIN ps ON p_partkey = partkey
    JOIN supplier ON suppkey = s_suppkey
    WHERE p_size <= 3
      AND s_acctbal = (SELECT min(s2.s_acctbal)
                       FROM ps ps2 JOIN supplier s2 ON ps2.suppkey = s2.s_suppkey
                       WHERE ps2.partkey = p_partkey)
    """,
    category="tpch",
)
def q2_min_cost_supplier(spark, sf_dir):
    """TPC-H Q2 shape (partsupp ≈ distinct lineitem pairs): correlated
    min subquery → window-min + filter, no self-join of the fact."""
    l = read(spark, sf_dir, "lineitem")
    ps = l.select(
        F.col("l_partkey").alias("partkey"), F.col("l_suppkey").alias("suppkey")
    ).distinct()
    p = read(spark, sf_dir, "part").where(F.col("p_size") <= 3)
    s = read(spark, sf_dir, "supplier")
    from pyspark.sql import Window as W

    joined = (
        ps.join(dim(p), ps.partkey == p.p_partkey)
        .join(dim(s), ps.suppkey == s.s_suppkey)
        .withColumn("min_bal", F.min("s_acctbal").over(W.partitionBy("partkey")))
    )
    return joined.where(F.col("s_acctbal") == F.col("min_bal")).select(
        "p_partkey", "p_name", "s_name", "s_acctbal"
    )


@register(
    "q11_value_concentration",
    oracle="""
    SELECT l_partkey, sum(l_extendedprice * (1 - l_discount)) AS value
    FROM lineitem
    GROUP BY l_partkey
    HAVING sum(l_extendedprice * (1 - l_discount)) >
           (SELECT sum(l_extendedprice * (1 - l_discount)) * 0.001 FROM lineitem)
    """,
    category="tpch",
)
def q11_value_concentration(spark, sf_dir):
    """TPC-H Q11 shape: HAVING against a global-aggregate scalar
    subquery (broadcast single-row join, not a driver collect)."""
    l = read(spark, sf_dir, "lineitem")
    per_part = l.groupBy("l_partkey").agg(F.sum(_revenue()).alias("value"))
    total = l.agg((F.sum(_revenue()) * 0.001).alias("threshold"))
    return (
        per_part.join(dim(total), per_part.value > total.threshold)
        .select("l_partkey", "value")
    )


@register(
    "q17_small_quantity_revenue",
    oracle="""
    SELECT round(sum(l1.l_extendedprice) / 7.0, 4) AS avg_yearly
    FROM lineitem l1 JOIN part ON p_partkey = l1.l_partkey
    WHERE p_brand = 'Brand#3'
      AND l1.l_quantity < (SELECT 0.5 * avg(l2.l_quantity)
                           FROM lineitem l2 WHERE l2.l_partkey = l1.l_partkey)
    """,
    category="tpch",
)
def q17_small_quantity_revenue(spark, sf_dir):
    """TPC-H Q17: correlated scalar AVG subquery → per-key aggregate
    joined back (the reference plans the identical decorrelation,
    FlinkDecorrelateProgram.scala)."""
    l = read(spark, sf_dir, "lineitem")
    p = read(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#3")
    thresholds = l.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (F.avg("l_quantity") * 0.5).alias("qty_limit")
    )
    return (
        l.join(dim(p), l.l_partkey == p.p_partkey)
        .join(thresholds, l.l_partkey == thresholds.t_partkey)
        .where(F.col("l_quantity") < F.col("qty_limit"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 4).alias("avg_yearly"))
    )


@register(
    "q20_heavy_shippers",
    oracle="""
    SELECT s_name, s_acctbal
    FROM supplier
    WHERE s_suppkey IN (
      SELECT l_suppkey
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_name LIKE 'red%'
        AND l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1998-01-01'
      GROUP BY l_suppkey
      HAVING sum(l_quantity) > 50
    )
    """,
    category="tpch",
)
def q20_heavy_shippers(spark, sf_dir):
    """TPC-H Q20 shape: IN over a HAVING-filtered aggregate → semi join
    on the aggregated key set."""
    l = read(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast(_TS))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast(_TS))
    )
    p = read(spark, sf_dir, "part").where(F.col("p_name").like("red%"))
    heavy = (
        l.join(dim(p), l.l_partkey == p.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("q"))
        .where(F.col("q") > 50)
        .select("l_suppkey")
    )
    s = read(spark, sf_dir, "supplier")
    return s.join(
        heavy, s.s_suppkey == heavy.l_suppkey, "left_semi"
    ).select("s_name", "s_acctbal")


@register(
    "q21_waiting_suppliers",
    oracle="""
    WITH flagged AS (
      SELECT l.l_orderkey, l.l_suppkey, o.o_orderstatus,
             (l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY) AS late
      FROM lineitem l JOIN orders o ON o_orderkey = l_orderkey
    )
    SELECT s_name, count(*) AS numwait
    FROM supplier, flagged l1, nation
    WHERE s_suppkey = l1.l_suppkey
      AND l1.o_orderstatus = 'F'
      AND l1.late
      AND EXISTS (SELECT 1 FROM flagged l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM flagged l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.late)
      AND s_nationkey = n_nationkey AND n_name IN ('NATION_3', 'NATION_7')
    GROUP BY s_name
    """,
    category="tpch",
)
def q21_waiting_suppliers(spark, sf_dir):
    """TPC-H Q21 shape (no l_receiptdate in fixture → late :=
    l_shipdate > o_orderdate + 60 days): the double correlated
    EXISTS / NOT EXISTS over the same fact becomes a left-semi plus a
    left-anti self-join on l_orderkey (ref rewrite:
    FlinkSubQueryRemoveRule.scala). The `flagged` fact is computed once;
    both semi and anti probes reuse the same shuffle-by-l_orderkey
    exchange, so the fact table is scanned/joined-to-orders a single
    time even at 100 TB.
    """
    l = read(spark, sf_dir, "lineitem")
    o = read(spark, sf_dir, "orders")
    flagged = l.join(o, l.l_orderkey == o.o_orderkey).select(
        "l_orderkey",
        "l_suppkey",
        "o_orderstatus",
        (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")).alias("late"),
    )
    l1 = flagged.where(F.col("o_orderstatus") == "F").where(F.col("late"))
    l2 = flagged.select(F.col("l_orderkey").alias("r_orderkey"), F.col("l_suppkey").alias("r_suppkey"))
    l3 = (
        flagged.where(F.col("late"))
        .select(F.col("l_orderkey").alias("r_orderkey"), F.col("l_suppkey").alias("r_suppkey"))
    )
    has_other = l1.join(
        l2,
        (l1.l_orderkey == l2.r_orderkey) & (l1.l_suppkey != l2.r_suppkey),
        "left_semi",
    )
    sole_late = has_other.join(
        l3,
        (has_other.l_orderkey == l3.r_orderkey) & (has_other.l_suppkey != l3.r_suppkey),
        "left_anti",
    )
    s = read(spark, sf_dir, "supplier")
    n = read(spark, sf_dir, "nation").where(F.col("n_name").isin("NATION_3", "NATION_7"))
    return (
        sole_late.join(dim(s.join(dim(n), s.s_nationkey == n.n_nationkey)),
                       sole_late.l_suppkey == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )
