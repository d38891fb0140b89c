"""Join family: every join type from SURVEY §2.4.

Reference implements hash / sort-merge / nested-loop strategies by hand
(BatchExecHashJoin.scala:53, BatchExecSortMergeJoin.scala:52,
BatchExecNestedLoopJoin.scala:45); here Catalyst + AQE pick the strategy.
Broadcast is used for the dimension tables (region/nation/supplier) —
at 100 TB the fact-side scan never shuffles for those joins.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from my_flink_1_10_2_spark.queries import read, register
from my_flink_1_10_2_spark.table import Table


@register(
    "q_join_inner",
    oracle="""
    SELECT o_orderpriority, count(*) AS cnt, sum(l_extendedprice) AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderstatus = 'F'
    GROUP BY o_orderpriority
    """,
    category="join",
)
def q_join_inner(spark, sf_dir):
    """Inner equi-join fact-to-fact (shuffled; both sides partition on the
    join key — one exchange each, ref: BatchExecHashJoin.scala:53)."""
    lineitem = Table(read(spark, sf_dir, "lineitem"))
    orders = Table(read(spark, sf_dir, "orders")).filter("o_orderstatus = 'F'")
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .group_by("o_orderpriority")
        .select(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("l_extendedprice").alias("revenue"),
        )
        .to_df()
    )


@register(
    "q_join_left_outer",
    oracle="""
    SELECT o_orderkey, o_totalprice, l_linenumber, l_quantity
    FROM orders LEFT JOIN lineitem
      ON o_orderkey = l_orderkey AND l_quantity > 45
    WHERE o_orderkey <= 2000
    """,
    category="join",
)
def q_join_left_outer(spark, sf_dir):
    """LEFT OUTER with join-side predicate (null-padded non-matches)."""
    orders = Table(read(spark, sf_dir, "orders")).filter("o_orderkey <= 2000")
    lineitem = Table(read(spark, sf_dir, "lineitem"))
    cond = (F.col("o_orderkey") == F.col("l_orderkey")) & (F.col("l_quantity") > 45)
    return (
        orders.left_outer_join(lineitem, cond)
        .select("o_orderkey", "o_totalprice", "l_linenumber", "l_quantity")
        .to_df()
    )


@register(
    "q_join_right_outer",
    oracle="""
    SELECT n_name, c_custkey, c_name
    FROM customer RIGHT JOIN nation ON c_nationkey = n_nationkey AND c_acctbal > 9000
    """,
    category="join",
)
def q_join_right_outer(spark, sf_dir):
    """RIGHT OUTER join (ref: AbstractOuterJoinDriver.java)."""
    customer = Table(read(spark, sf_dir, "customer"))
    nation = Table(read(spark, sf_dir, "nation"))
    cond = (F.col("c_nationkey") == F.col("n_nationkey")) & (F.col("c_acctbal") > 9000)
    return (
        customer.right_outer_join(nation, cond)
        .select("n_name", "c_custkey", "c_name")
        .to_df()
    )


@register(
    "q_join_full_outer",
    oracle="""
    SELECT c.c_custkey, c.c_name, o.o_orderkey
    FROM (SELECT * FROM customer WHERE c_custkey <= 80) c
    FULL JOIN (SELECT * FROM orders WHERE o_custkey >= 40 AND o_orderkey <= 3000) o
      ON c.c_custkey = o.o_custkey
    """,
    category="join",
)
def q_join_full_outer(spark, sf_dir):
    """FULL OUTER join (ref: SortMergeFullOuterJoinIterator.java)."""
    customer = Table(read(spark, sf_dir, "customer")).filter("c_custkey <= 80")
    orders = Table(read(spark, sf_dir, "orders")).filter("o_custkey >= 40 AND o_orderkey <= 3000")
    return (
        customer.full_outer_join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .select("c_custkey", "c_name", "o_orderkey")
        .to_df()
    )


@register(
    "q_join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 200000)
    """,
    category="join",
)
def q_join_semi(spark, sf_dir):
    """LEFT SEMI join = EXISTS (ref: SemiJoinITCase.scala,
    FlinkSubQueryRemoveRule.scala)."""
    customer = Table(read(spark, sf_dir, "customer"))
    big_orders = Table(read(spark, sf_dir, "orders")).filter("o_totalprice > 200000")
    return (
        customer.semi_join(big_orders, F.col("c_custkey") == F.col("o_custkey"))
        .select("c_custkey", "c_name")
        .to_df()
    )


@register(
    "q_join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    category="join",
)
def q_join_anti(spark, sf_dir):
    """LEFT ANTI join = NOT EXISTS (ref: ReplaceMinusWithAntiJoinRule.scala)."""
    customer = Table(read(spark, sf_dir, "customer"))
    orders = Table(read(spark, sf_dir, "orders"))
    return (
        customer.anti_join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .select("c_custkey", "c_name")
        .to_df()
    )


@register(
    "q_join_cross",
    oracle="""
    SELECT r_name, n_name FROM region CROSS JOIN nation
    """,
    category="join",
)
def q_join_cross(spark, sf_dir):
    """Cartesian product (ref: DataSet.cross:1056, CrossDriver.java) —
    small×small only; planner uses BroadcastNestedLoopJoin."""
    region = Table(read(spark, sf_dir, "region"))
    nation = Table(read(spark, sf_dir, "nation"))
    return region.cross_join(nation).select("r_name", "n_name").to_df()


@register(
    "q_join_theta",
    oracle="""
    SELECT s_name, c_name
    FROM supplier JOIN customer
      ON s_nationkey = c_nationkey AND s_acctbal < c_acctbal
    WHERE c_custkey <= 100
    """,
    category="join",
)
def q_join_theta(spark, sf_dir):
    """Theta join: equi-part carries the partitioning, the inequality is a
    post-join residual (never a full nested loop at scale)."""
    supplier = Table(read(spark, sf_dir, "supplier"))
    customer = Table(read(spark, sf_dir, "customer")).filter("c_custkey <= 100")
    cond = (F.col("s_nationkey") == F.col("c_nationkey")) & (
        F.col("s_acctbal") < F.col("c_acctbal")
    )
    return supplier.join(customer, cond).select("s_name", "c_name").to_df()


@register(
    "q_join_broadcast_star",
    oracle="""
    SELECT r_name, n_name, count(*) AS customers, sum(c_acctbal) AS total_bal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    """,
    category="join",
)
def q_join_broadcast_star(spark, sf_dir):
    """Star join through two broadcast dims (ref: DataSet.joinWithTiny:751,
    LookupableTableSource.java:33 — the batch analog of a lookup join).

    `broadcast()` pins BroadcastHashJoin: the fact table streams through
    map-side joins with zero shuffle — the critical 100 TB pattern.
    """
    customer = Table(read(spark, sf_dir, "customer"))
    nation = Table(read(spark, sf_dir, "nation"))
    region = Table(read(spark, sf_dir, "region"))
    return (
        customer.join_with_tiny(nation, F.col("c_nationkey") == F.col("n_nationkey"))
        .join_with_tiny(region, F.col("n_regionkey") == F.col("r_regionkey"))
        .group_by("r_name", "n_name")
        .select(
            F.count(F.lit(1)).alias("customers"),
            F.sum("c_acctbal").alias("total_bal"),
        )
        .to_df()
    )


@register(
    "q_scalar_subquery",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders) * 1.8
    """,
    category="subquery",
)
def q_scalar_subquery(spark, sf_dir):
    """Uncorrelated scalar subquery (ref: FlinkSubQueryRemoveRule.scala)."""
    from my_flink_1_10_2_spark.queries import register_views

    register_views(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice FROM orders
        WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders) * 1.8
        """
    )


@register(
    "q_in_subquery",
    oracle="""
    SELECT p_partkey, p_name FROM part
    WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity >= 49)
    """,
    category="subquery",
)
def q_in_subquery(spark, sf_dir):
    """IN subquery → semi join rewrite (ref: FlinkSubQueryRemoveRule.scala)."""
    from my_flink_1_10_2_spark.queries import register_views

    register_views(spark, sf_dir, "part", "lineitem")
    return spark.sql(
        """
        SELECT p_partkey, p_name FROM part
        WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity >= 49)
        """
    )


@register(
    "q_correlated_exists",
    oracle="""
    SELECT s_suppkey, s_name FROM supplier
    WHERE EXISTS (
      SELECT 1 FROM lineitem WHERE l_suppkey = s_suppkey AND l_extendedprice > 90000
    )
    """,
    category="subquery",
)
def q_correlated_exists(spark, sf_dir):
    """Correlated EXISTS → decorrelated semi join
    (ref: FlinkDecorrelateProgram.scala)."""
    from my_flink_1_10_2_spark.queries import register_views

    register_views(spark, sf_dir, "supplier", "lineitem")
    return spark.sql(
        """
        SELECT s_suppkey, s_name FROM supplier
        WHERE EXISTS (
          SELECT 1 FROM lineitem WHERE l_suppkey = s_suppkey AND l_extendedprice > 90000
        )
        """
    )


@register(
    "q3_shipping_priority",
    oracle="""
    SELECT l_orderkey, round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue, o_orderdate
    FROM customer, orders, lineitem
    WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
    category="join",
)
def q3_shipping_priority(spark, sf_dir):
    """TPC-H Q3 shape: 3-way join + agg + top-k
    (ref: flink-tpch-test harness queries)."""
    customer = Table(read(spark, sf_dir, "customer")).filter("c_mktsegment = 'BUILDING'")
    orders = Table(read(spark, sf_dir, "orders")).filter(
        F.col("o_orderdate") < F.lit("1995-03-15 00:00:00").cast("timestamp_ntz")
    )
    lineitem = Table(read(spark, sf_dir, "lineitem"))
    return (
        customer.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(lineitem, F.col("l_orderkey") == F.col("o_orderkey"))
        .group_by("l_orderkey", "o_orderdate")
        .select(F.round(F.sum(F.expr("l_extendedprice * (1 - l_discount)")), 4).alias("revenue"))
        .order_by(F.col("revenue").desc(), F.col("o_orderdate"), F.col("l_orderkey"))
        .limit(10)
        .to_df()
    )


@register(
    "q5_local_supplier",
    oracle="""
    SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey AND l_suppkey = s_suppkey
      AND c_nationkey = s_nationkey AND s_nationkey = n_nationkey
      AND n_regionkey = r_regionkey AND r_name = 'ASIA'
    GROUP BY n_name ORDER BY revenue DESC
    """,
    category="join",
)
def q5_local_supplier(spark, sf_dir):
    """TPC-H Q5 shape: 6-way join — exercises join reordering + broadcast
    dim tables (ref: flink-optimizer cost-based join strategies)."""
    from my_flink_1_10_2_spark.queries import register_views

    register_views(spark, sf_dir, "customer", "orders", "lineitem", "supplier", "nation", "region")
    return spark.sql(
        """
        SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
        FROM customer, orders, lineitem, supplier, nation, region
        WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey AND l_suppkey = s_suppkey
          AND c_nationkey = s_nationkey AND s_nationkey = n_nationkey
          AND n_regionkey = r_regionkey AND r_name = 'ASIA'
        GROUP BY n_name ORDER BY revenue DESC
        """
    )


@register(
    "q10_returned_items",
    oracle="""
    SELECT c_custkey, c_name, round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
           c_acctbal, n_name
    FROM customer, orders, lineitem, nation
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND l_returnflag = 'R' AND c_nationkey = n_nationkey
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey LIMIT 20
    """,
    category="join",
)
def q10_returned_items(spark, sf_dir):
    """TPC-H Q10 shape: join + agg + ordered top-k."""
    from my_flink_1_10_2_spark.queries import register_views

    register_views(spark, sf_dir, "customer", "orders", "lineitem", "nation")
    return spark.sql(
        """
        SELECT c_custkey, c_name, round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
               c_acctbal, n_name
        FROM customer, orders, lineitem, nation
        WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
          AND l_returnflag = 'R' AND c_nationkey = n_nationkey
        GROUP BY c_custkey, c_name, c_acctbal, n_name
        ORDER BY revenue DESC, c_custkey LIMIT 20
        """
    )
