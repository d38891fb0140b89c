"""Gelly graph-algorithm library (ref: flink-libraries/flink-gelly/src/
main/java/org/apache/flink/graph/library/ — linkanalysis/PageRank.java,
LabelPropagation.java, TriangleEnumerator.java), re-expressed as
DataFrame programs over the bulk-iteration operator.

Scale shape per superstep (same data movement as Gelly's scatter-gather):
one shuffle join of the vertex-state relation with the (checkpointed)
edge relation, one hash aggregation back to vertex granularity. The edge
relation is checkpointed once and reused every round; vertex state is
|V|-sized, never |E|-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from my_flink_1_10_2_spark.operators.iterate import iterate


def _nodes(e: DataFrame, src: str, dst: str) -> DataFrame:
    return (
        e.select(F.col(src).alias("node"))
        .union(e.select(F.col(dst).alias("node")))
        .distinct()
    )


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    iterations: int = 5,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Fixed-iteration PageRank power method (ref: flink-gelly
    library/linkanalysis/PageRank.java — same vertex-centric update:
    rank = (1-d)/N + d * Σ rank(u)/outdeg(u) over in-neighbors).

    Dangling mass is not redistributed (leaks, as in the reference's
    simple variant); returns (node, rank). N reaches the driver as one
    scalar count — the only driver-side value in the loop.
    """
    e = edges.select(src, dst).distinct()
    nodes = _nodes(e, src, dst).localCheckpoint(eager=True)
    n_nodes = nodes.count()
    deg = e.groupBy(src).agg(F.count("*").alias("__deg"))
    e_deg = e.join(deg, src).localCheckpoint(eager=True)

    init = nodes.withColumn("rank", F.lit(1.0 / n_nodes))
    teleport = (1.0 - damping) / n_nodes

    def step(r: DataFrame, i: int) -> DataFrame:
        contrib = (
            e_deg.join(r, e_deg[src] == r.node)
            .select(
                F.col(dst).alias("node"),
                (F.col("rank") / F.col("__deg")).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("contrib"))
        )
        return nodes.join(contrib, "node", "left").select(
            "node",
            (
                F.lit(teleport)
                + F.lit(damping) * F.coalesce("contrib", F.lit(0.0))
            ).alias("rank"),
        )

    return iterate(init, step, iterations)


def label_propagation(
    edges: DataFrame,
    iterations: int = 3,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Synchronous label propagation (ref: flink-gelly
    library/LabelPropagation.java): every round each vertex adopts the
    most frequent label among its neighbors' current labels, ties broken
    by the smallest label; isolated vertices keep their label. Labels
    start as the vertex id. Returns (node, label)."""
    sym = (
        edges.select(F.col(src).alias("e_src"), F.col(dst).alias("e_dst"))
        .union(edges.select(F.col(dst).alias("e_src"), F.col(src).alias("e_dst")))
        .filter(F.col("e_src") != F.col("e_dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    init = _nodes(sym, "e_src", "e_dst").withColumn("label", F.col("node"))

    def step(lbl: DataFrame, i: int) -> DataFrame:
        msgs = sym.join(lbl, sym.e_src == lbl.node).select(
            F.col("e_dst").alias("node"), "label"
        )
        counts = msgs.groupBy("node", "label").agg(F.count("*").alias("cnt"))
        w = Window.partitionBy("node").orderBy(F.col("cnt").desc(), F.col("label"))
        best = (
            counts.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select("node", F.col("label").alias("__new"))
        )
        return (
            lbl.join(best, "node", "left")
            .select("node", F.coalesce("__new", "label").alias("label"))
        )

    return iterate(init, step, iterations)


def triangle_enumerate(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Triangle enumeration (ref: flink-gelly library/
    TriangleEnumerator.java — canonical-edge + open-triad join).

    Edges are canonicalized to a < b, open triads (a-b, b-c) are built by
    one self-join, and a second join against the edge set closes them.
    Returns (v1, v2, v3) with v1 < v2 < v3, each triangle once. Both
    joins are key-equi (shuffle on vertex id) — no nested loop; the
    reference's same two-join shape."""
    e = (
        edges.select(F.least(src, dst).alias("a"), F.greatest(src, dst).alias("b"))
        .filter(F.col("a") < F.col("b"))
        .distinct()
    )
    e1, e2, e3 = e.alias("e1"), e.alias("e2"), e.alias("e3")
    return (
        e1.join(e2, F.col("e1.b") == F.col("e2.a"))
        .join(
            e3,
            (F.col("e1.a") == F.col("e3.a")) & (F.col("e2.b") == F.col("e3.b")),
        )
        .select(
            F.col("e1.a").alias("v1"),
            F.col("e1.b").alias("v2"),
            F.col("e2.b").alias("v3"),
        )
    )
