"""Graph / iteration queries (SURVEY §2.6 iterations, Gelly §1.1).

q_connected_components clusters the embedding near-duplicate graph:
nodes = vectors, edges = pairs with cosine ≥ 0.425 (threshold sits in a
wide gap of the similarity distribution so float rounding can't flip
membership). The engine runs min-label propagation to a fixpoint through
the generic `iterate` operator; the oracle computes the same components
with a recursive CTE — a genuinely independent algorithm, so parity
validates both the pair generation and the iteration.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from my_flink_1_10_2_spark.operators.iterate import connected_components
from my_flink_1_10_2_spark.queries import read, register

_THRESHOLD = 0.425

_CC_ORACLE = f"""
WITH RECURSIVE pairs AS (
  SELECT a.vec_id AS src, b.vec_id AS dst
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
  WHERE list_cosine_similarity(
          list_transform(a.embedding, x -> CAST(x AS DOUBLE)),
          list_transform(b.embedding, x -> CAST(x AS DOUBLE))) >= {_THRESHOLD}
),
edges AS (SELECT src, dst FROM pairs UNION ALL SELECT dst, src FROM pairs),
walk AS (
  SELECT vec_id AS node, vec_id AS reach FROM embeddings
  UNION
  SELECT w.node, e.dst AS reach FROM walk w JOIN edges e ON w.reach = e.src
)
SELECT node, min(reach) AS component FROM walk GROUP BY node
"""


def _cosine(a, b):
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)
    na = F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda s, x: s + x))
    nb = F.sqrt(F.aggregate(F.transform(b, lambda x: x * x), F.lit(0.0), lambda s, x: s + x))
    return dot / (na * nb)


def neardup_pairs(emb, threshold: float = _THRESHOLD):
    """Cosine near-duplicate candidate pairs (brute-force O(n²) at test
    scale; at 100 TB the LSH bucket join in llm/dedup.py generates the
    candidates and this predicate verifies them)."""
    a = emb.select(
        F.col("vec_id").alias("src"), F.col("embedding").cast("array<double>").alias("va")
    )
    b = emb.select(
        F.col("vec_id").alias("dst"), F.col("embedding").cast("array<double>").alias("vb")
    )
    return (
        a.join(b, F.col("src") < F.col("dst"))
        .withColumn("cosine", _cosine(F.col("va"), F.col("vb")))
        .where(F.col("cosine") >= threshold)
        .select("src", "dst", "cosine")
    )


@register("q_connected_components", oracle=_CC_ORACLE, category="graph")
def q_connected_components(spark, sf_dir):
    """Near-dup clusters via iterative min-label propagation (ref:
    flink-gelly library/ConnectedComponents.java; DataSet.iterate
    DataSet.java:1156)."""
    emb = read(spark, sf_dir, "embeddings")
    edges = neardup_pairs(emb).select("src", "dst")
    return connected_components(
        edges, vertices=emb.select("vec_id"), max_iterations=30
    )


@register(
    "q_embedding_neardup",
    oracle=f"""
    SELECT a.vec_id AS src, b.vec_id AS dst,
           list_cosine_similarity(
             list_transform(a.embedding, x -> CAST(x AS DOUBLE)),
             list_transform(b.embedding, x -> CAST(x AS DOUBLE))) AS cosine
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(
             list_transform(a.embedding, x -> CAST(x AS DOUBLE)),
             list_transform(b.embedding, x -> CAST(x AS DOUBLE))) >= {_THRESHOLD}
    """,
    category="llm_dedup",
)
def q_embedding_neardup(spark, sf_dir):
    """Embedding-cosine near-duplicate detection (the 5th dedup family
    from the pipeline brief): JVM-side zip_with/aggregate arithmetic —
    no Python in the pair loop."""
    return neardup_pairs(read(spark, sf_dir, "embeddings"))
