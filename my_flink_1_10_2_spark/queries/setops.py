"""Set operations (SURVEY §2.7): UNION [ALL], INTERSECT [ALL], EXCEPT [ALL].

Reference: StreamExecUnion.scala / BatchExecUnion.scala, Table.java:655-742,
ReplaceIntersectWithSemiJoinRule.scala, RewriteIntersectAllRule.scala,
ReplaceMinusWithAntiJoinRule.scala, RewriteMinusAllRule.scala.

Spark plans INTERSECT/EXCEPT as semi/anti joins and the ALL variants via
count-expansion — the same strategies the reference's rewrite rules
produce, chosen by Catalyst.
"""

from __future__ import annotations

from my_flink_1_10_2_spark.queries import read, register
from my_flink_1_10_2_spark.table import Table


def _sides(spark, sf_dir):
    customer = Table(read(spark, sf_dir, "customer"))
    a = customer.filter("c_custkey <= 100").select("c_nationkey", "c_mktsegment")
    b = customer.filter("c_custkey > 50").select("c_nationkey", "c_mktsegment")
    return a, b


_A = "SELECT c_nationkey, c_mktsegment FROM customer WHERE c_custkey <= 100"
_B = "SELECT c_nationkey, c_mktsegment FROM customer WHERE c_custkey > 50"


@register("q_union_all", oracle=f"{_A} UNION ALL {_B}", category="setop")
def q_union_all(spark, sf_dir):
    """UNION ALL (ref: Table.unionAll:706) — pure concatenation, no shuffle."""
    a, b = _sides(spark, sf_dir)
    return a.union_all(b).to_df()


@register("q_union_distinct", oracle=f"{_A} UNION {_B}", category="setop")
def q_union_distinct(spark, sf_dir):
    """UNION (distinct) (ref: Table.union:690) = union-all + dedup agg."""
    a, b = _sides(spark, sf_dir)
    return a.union(b).to_df()


@register("q_intersect", oracle=f"{_A} INTERSECT {_B}", category="setop")
def q_intersect(spark, sf_dir):
    """INTERSECT (ref: ReplaceIntersectWithSemiJoinRule.scala)."""
    a, b = _sides(spark, sf_dir)
    return a.intersect(b).to_df()


@register("q_intersect_all", oracle=f"{_A} INTERSECT ALL {_B}", category="setop")
def q_intersect_all(spark, sf_dir):
    """INTERSECT ALL (ref: RewriteIntersectAllRule.scala)."""
    a, b = _sides(spark, sf_dir)
    return a.intersect_all(b).to_df()


@register("q_except", oracle=f"{_A} EXCEPT {_B}", category="setop")
def q_except(spark, sf_dir):
    """EXCEPT/MINUS (ref: ReplaceMinusWithAntiJoinRule.scala)."""
    a, b = _sides(spark, sf_dir)
    return a.minus(b).to_df()


@register("q_except_all", oracle=f"{_A} EXCEPT ALL {_B}", category="setop")
def q_except_all(spark, sf_dir):
    """EXCEPT ALL (ref: RewriteMinusAllRule.scala)."""
    a, b = _sides(spark, sf_dir)
    return a.minus_all(b).to_df()
