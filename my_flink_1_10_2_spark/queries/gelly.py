"""Gelly graph-algorithm queries (SURVEY §2.6 iterations; ref:
flink-libraries/flink-gelly/.../library/linkanalysis/PageRank.java,
LabelPropagation.java, TriangleEnumerator.java, and
DataSet.iterateDelta DataSet.java:1206).

All three algorithms run on one deterministic graph derived
arithmetically from the `customer` fixture (40 nodes, several hundred
edges), so the DuckDB oracle can rebuild the identical graph and
cross-check with a genuinely different formulation: the iterative
algorithms are unrolled to fixed-depth CTE chains on the oracle side —
independent of the engine's iterate/iterateDelta machinery, so parity
validates both the graph construction and the iteration semantics.

Float outputs (PageRank) round to 9 decimals on both sides.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from my_flink_1_10_2_spark.operators.gelly import (
    label_propagation,
    pagerank,
    triangle_enumerate,
)
from my_flink_1_10_2_spark.operators.iterate import connected_components_delta
from my_flink_1_10_2_spark.queries import read, register
from my_flink_1_10_2_spark.queries.graph import _CC_ORACLE, neardup_pairs

# 37-node deterministic dense edge set (~490 directed edges, ~1600
# triangles at sf0.01): the `// 7` term varies dst within a src class, so
# out-degrees > 1 and the graph has real community/triangle structure
_EDGE_SQL = """
    SELECT DISTINCT c_custkey % 37 AS src,
                    (c_custkey // 7 + c_custkey % 11) % 37 AS dst
    FROM customer
    WHERE c_custkey <= 500
      AND c_custkey % 37 <> (c_custkey // 7 + c_custkey % 11) % 37
"""

_PR_ITERS, _DAMPING = 5, 0.85
_LPA_ITERS = 3


def _edges(spark, sf_dir):
    c = read(spark, sf_dir, "customer").filter("c_custkey <= 500")
    return (
        c.select(
            (F.col("c_custkey") % 37).alias("src"),
            F.expr("(c_custkey div 7 + c_custkey % 11) % 37").alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def _pagerank_oracle() -> str:
    sql = f"""
    WITH edges AS ({_EDGE_SQL}),
    nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
    n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS cnt FROM nodes),
    deg AS (SELECT src, CAST(COUNT(*) AS DOUBLE) AS degree FROM edges GROUP BY src),
    r0 AS (SELECT node, 1.0 / (SELECT cnt FROM n) AS pr FROM nodes)"""
    for i in range(1, _PR_ITERS + 1):
        sql += f""",
    r{i} AS (
      SELECT nodes.node,
             (1.0 - {_DAMPING}) / (SELECT cnt FROM n)
             + {_DAMPING} * COALESCE(SUM(r{i - 1}.pr / deg.degree), 0) AS pr
      FROM nodes
      LEFT JOIN edges ON edges.dst = nodes.node
      LEFT JOIN deg   ON deg.src   = edges.src
      LEFT JOIN r{i - 1} ON r{i - 1}.node = edges.src
      GROUP BY nodes.node)"""
    return sql + f"\n    SELECT node, round(pr, 9) AS pr FROM r{_PR_ITERS}"


@register("q_pagerank", oracle=_pagerank_oracle(), category="graph")
def q_pagerank(spark, sf_dir):
    """Fixed-iteration PageRank (ref: flink-gelly
    library/linkanalysis/PageRank.java); oracle = the power method
    unrolled to a 5-level CTE chain."""
    out = pagerank(_edges(spark, sf_dir), _DAMPING, _PR_ITERS)
    return out.select("node", F.round("rank", 9).alias("pr"))


def _lpa_oracle() -> str:
    sql = f"""
    WITH edges0 AS ({_EDGE_SQL}),
    sym AS (SELECT src AS e_src, dst AS e_dst FROM edges0
            UNION SELECT dst, src FROM edges0),
    l0 AS (SELECT DISTINCT e_src AS node, e_src AS label FROM sym)"""
    for i in range(1, _LPA_ITERS + 1):
        sql += f""",
    c{i} AS (
      SELECT sym.e_dst AS node, l{i - 1}.label, COUNT(*) AS cnt
      FROM sym JOIN l{i - 1} ON sym.e_src = l{i - 1}.node
      GROUP BY sym.e_dst, l{i - 1}.label),
    b{i} AS (
      SELECT node, label AS new_label FROM (
        SELECT node, label,
               row_number() OVER (PARTITION BY node ORDER BY cnt DESC, label) AS rn
        FROM c{i}) WHERE rn = 1),
    l{i} AS (
      SELECT l{i - 1}.node, COALESCE(b{i}.new_label, l{i - 1}.label) AS label
      FROM l{i - 1} LEFT JOIN b{i} ON b{i}.node = l{i - 1}.node)"""
    return sql + f"\n    SELECT node, label FROM l{_LPA_ITERS}"


@register("q_label_propagation", oracle=_lpa_oracle(), category="graph")
def q_label_propagation(spark, sf_dir):
    """Synchronous label propagation, most-frequent-neighbor-label with
    min tie-break (ref: flink-gelly library/LabelPropagation.java);
    oracle = 3 unrolled count/argmax rounds."""
    return label_propagation(_edges(spark, sf_dir), _LPA_ITERS)


@register(
    "q_triangle_count",
    oracle=f"""
    WITH edges0 AS ({_EDGE_SQL}),
    e AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
          FROM edges0 WHERE src <> dst)
    SELECT e1.a AS v1, e1.b AS v2, e2.b AS v3
    FROM e e1
    JOIN e e2 ON e1.b = e2.a
    JOIN e e3 ON e1.a = e3.a AND e2.b = e3.b
    """,
    category="graph",
)
def q_triangle_count(spark, sf_dir):
    """Triangle enumeration via the canonical-edge two-join shape (ref:
    flink-gelly library/TriangleEnumerator.java)."""
    return triangle_enumerate(_edges(spark, sf_dir))


@register("q_connected_components_delta", oracle=_CC_ORACLE, category="graph")
def q_connected_components_delta(spark, sf_dir):
    """Connected components as a DELTA iteration (ref:
    DataSet.iterateDelta, DataSet.java:1206): only the frontier —
    vertices whose label improved — shuffles each superstep. Same
    recursive-CTE oracle as the bulk variant; parity proves the
    workset formulation reaches the identical fixpoint."""
    emb = read(spark, sf_dir, "embeddings")
    edges = neardup_pairs(emb).select("src", "dst")
    return connected_components_delta(
        edges, vertices=emb.select("vec_id"), max_iterations=30
    )
