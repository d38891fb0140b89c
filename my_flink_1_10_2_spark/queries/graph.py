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


def neardup_pairs(emb, threshold: float = _THRESHOLD):
    """Cosine near-duplicate candidate pairs.

    Execution shape: the unit-normalized matrix of one side is broadcast
    (like a broadcast hash join's build side); the other side streams
    through ``mapInPandas`` partitions where a single BLAS matmul scores
    each Arrow batch against the whole build side — thousands of dot
    products per numpy call instead of one Catalyst higher-order-function
    evaluation per pair (measured ~25× on sf0.1).

    Scale path: broadcast works to ~10⁶ vectors (a 64-dim float64 matrix
    at 10⁶ rows is 512 MB). Beyond that, generate candidates with the
    LSH bucket join (llm/dedup.py) and use this exact kernel per bucket —
    same code, bounded build side.
    """
    import numpy as np
    import pandas as pd

    pdf = emb.select("vec_id", "embedding").toPandas()
    ids = pdf["vec_id"].to_numpy()
    mat = np.stack(pdf["embedding"].to_numpy()).astype("float64")
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    bc = emb.sparkSession.sparkContext.broadcast((ids, mat))

    def score(batches):
        b_ids, b_mat = bc.value
        for batch in batches:
            if not len(batch):
                continue
            rows = np.stack(batch["embedding"].to_numpy()).astype("float64")
            rows /= np.linalg.norm(rows, axis=1, keepdims=True)
            sims = rows @ b_mat.T  # (batch × corpus) in one BLAS call
            src = batch["vec_id"].to_numpy()
            for i, s in enumerate(src):
                row = sims[i]
                hit = (row >= threshold) & (b_ids > s)  # s < dst: each pair once
                if hit.any():
                    yield pd.DataFrame(
                        {"src": s, "dst": b_ids[hit], "cosine": row[hit]}
                    )

    return emb.select("vec_id", "embedding").mapInPandas(
        score, "src long, dst long, cosine double"
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
