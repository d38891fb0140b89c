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


def neardup_pairs(
    emb,
    threshold: float = _THRESHOLD,
    n_blocks: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Exact cosine near-duplicate pairs via a block-pair self-join — no
    driver-side materialization of the corpus anywhere in the path.

    Execution shape: each vector is hashed into one of ``n_blocks``
    blocks and replicated to every block PAIR it participates in (one
    ``posexplode``, so the shuffle is n×n_blocks rows keyed on the pair
    id); ``applyInPandas`` then scores each pair group with a single
    BLAS matmul (block_i × block_j) and emits only the pairs over the
    threshold. Every unordered (src < dst) pair lands in exactly one
    group, so the result is identical to the full cross product.

    Scale: the O(n²) similarity arithmetic is inherent to EXACT all-pairs
    but fully distributed — B(B+1)/2 independent groups, each holding
    2n/B vectors (pick n_blocks so a group fits an executor: n=10⁸,
    B=10³ ⇒ 2·10⁵ vectors/group). Replication cost is n×B rows, the
    standard block-nested-loop trade. For sub-quadratic candidate
    generation use the MinHash/LSH paths (llm/dedup.py) — approximate by
    nature, which is why this exact kernel stays the oracle-checked
    default.
    """
    import numpy as np
    import pandas as pd

    blk = F.pmod(F.hash(F.col(id_col)), F.lit(n_blocks))
    pair_keys = F.array(
        *[
            F.struct(
                F.least(F.col("blk"), F.lit(o)).alias("bi"),
                F.greatest(F.col("blk"), F.lit(o)).alias("bj"),
            )
            for o in range(n_blocks)
        ]
    )
    replicated = (
        emb.select(
            F.col(id_col).alias("id"), F.col(vec_col).alias("vec"), blk.alias("blk")
        )
        .select("id", "vec", "blk", F.explode(F.array_distinct(pair_keys)).alias("pk"))
        .select("id", "vec", "blk", F.col("pk.bi").alias("bi"), F.col("pk.bj").alias("bj"))
    )

    def score(pdf: pd.DataFrame) -> pd.DataFrame:
        bi, bj = int(pdf["bi"].iloc[0]), int(pdf["bj"].iloc[0])
        ids = pdf["id"].to_numpy()
        mat = np.stack(pdf["vec"].to_numpy()).astype("float64")
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        mat /= np.where(norms == 0, 1.0, norms)
        if bi == bj:  # within-block: upper triangle of one matrix
            sims = mat @ mat.T
            src_idx, dst_idx = np.nonzero(sims >= threshold)
            keep = ids[src_idx] < ids[dst_idx]
            src, dst = ids[src_idx][keep], ids[dst_idx][keep]
            cos = sims[src_idx[keep], dst_idx[keep]]
        else:  # cross-block: left rows × right rows, each pair once
            left, right = pdf["blk"].to_numpy() == bi, pdf["blk"].to_numpy() == bj
            l_ids, r_ids = ids[left], ids[right]
            sims = mat[left] @ mat[right].T
            li, ri = np.nonzero(sims >= threshold)
            a, b = l_ids[li], r_ids[ri]
            src, dst = np.minimum(a, b), np.maximum(a, b)
            cos = sims[li, ri]
        return pd.DataFrame({"src": src, "dst": dst, "cosine": cos})

    return replicated.groupBy("bi", "bj").applyInPandas(
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
           round(list_cosine_similarity(
             list_transform(a.embedding, x -> CAST(x AS DOUBLE)),
             list_transform(b.embedding, x -> CAST(x AS DOUBLE))), 9) AS cosine
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(
             list_transform(a.embedding, x -> CAST(x AS DOUBLE)),
             list_transform(b.embedding, x -> CAST(x AS DOUBLE))) >= {_THRESHOLD}
    """,
    category="llm_dedup",
)
def q_embedding_neardup(spark, sf_dir):
    """Embedding-cosine near-duplicate detection (the 5th dedup family
    from the pipeline brief): exact block-pair BLAS kernel, fully
    distributed — no driver collect. cosine is rounded to 9 decimals on
    both sides (BLAS vs DuckDB last-ULP)."""
    return neardup_pairs(read(spark, sf_dir, "embeddings")).withColumn(
        "cosine", F.round("cosine", 9)
    )


@register(
    "q_dedup_representative",
    oracle=f"""
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
    ),
    cc AS (SELECT node, min(reach) AS component FROM walk GROUP BY node),
    ranked AS (
      SELECT c.component,
             CAST(count(*) OVER (PARTITION BY c.component) AS BIGINT) AS n_members,
             d.doc_id, d.n_chars,
             row_number() OVER (PARTITION BY c.component
                                ORDER BY d.n_chars DESC, d.doc_id) AS rn
      FROM cc c JOIN documents d ON c.node = d.doc_id
    )
    SELECT component, n_members, doc_id AS kept_doc,
           CAST(n_chars AS BIGINT) AS kept_chars
    FROM ranked WHERE rn = 1
    ORDER BY component
    """,
    category="llm_dedup",
)
def q_dedup_representative(spark, sf_dir):
    """The stage after clustering: one representative document per
    near-duplicate cluster, chosen by quality (longest doc, ties to the
    lowest id) — the "keep list" a dedup pipeline actually emits.

    Components come from the same distributed pointer-jumping iteration
    as q_connected_components; the selection is a per-component window
    rank over the already-clustered rows, so the added cost at 100 TB is
    one shuffle keyed on component — no new all-pairs work."""
    from pyspark.sql import Window

    emb = read(spark, sf_dir, "embeddings")
    edges = neardup_pairs(emb).select("src", "dst")
    cc = connected_components(
        edges, vertices=emb.select("vec_id"), max_iterations=30
    )
    docs = read(spark, sf_dir, "documents").select("doc_id", "n_chars")
    joined = cc.join(docs, cc.node == docs.doc_id)
    w = Window.partitionBy("component")
    rank_w = w.orderBy(F.col("n_chars").desc(), F.col("doc_id"))
    return (
        joined.withColumn("n_members", F.count(F.lit(1)).over(w))
        .withColumn("rn", F.row_number().over(rank_w))
        .where(F.col("rn") == 1)
        .select(
            "component",
            F.col("n_members").cast("bigint").alias("n_members"),
            F.col("doc_id").alias("kept_doc"),
            F.col("n_chars").cast("bigint").alias("kept_chars"),
        )
        .orderBy("component")
    )


@register(
    "q_cluster_size_histogram",
    oracle=f"""
    WITH comp AS ({_CC_ORACLE})
    SELECT sz, CAST(count(*) AS BIGINT) AS n_clusters FROM (
      SELECT component, CAST(count(*) AS BIGINT) AS sz
      FROM comp GROUP BY component)
    GROUP BY sz
    """,
    category="graph",
)
def q_cluster_size_histogram(spark, sf_dir):
    """Near-dup cluster size histogram — the dedup run's health report
    (a giant cluster usually means boilerplate or a broken threshold).
    Composes the CC fixpoint with two tiny rollups; only the |V|-sized
    component table shuffles."""
    from my_flink_1_10_2_spark.operators.iterate import connected_components
    from my_flink_1_10_2_spark.queries import read as _read

    emb = _read(spark, sf_dir, "embeddings")
    edges = neardup_pairs(emb).select("src", "dst")
    comp = connected_components(edges, vertices=emb.select("vec_id"))
    sizes = comp.groupBy("component").agg(
        F.count(F.lit(1)).cast("bigint").alias("sz")
    )
    return sizes.groupBy("sz").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_clusters")
    )
