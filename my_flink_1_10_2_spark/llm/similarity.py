"""Similarity search over embedding columns (array<float>).

Two paths, same results contract:
  - ``cosine_topk_bruteforce`` — exact: query-set × corpus join with a
    JVM-side cosine (zip_with/aggregate HOFs), top-k via the rank
    operator.  This is the correctness oracle; at scale it's only usable
    for small query sets (the corpus side stays distributed; the join
    broadcasts the queries, so cost is one corpus scan per batch of
    queries — acceptable and shuffle-free).
  - ``cosine_topk_lsh`` — approximate: random-hyperplane LSH buckets
    (SimHash for vectors); candidates share a bucket, then exact cosine +
    top-k within candidates.  Deterministic planes derived from md5 so
    results are reproducible.  At 100 TB the bucket join replaces the
    full cross product.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from my_flink_1_10_2_spark.operators.rank import top_n


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a, b):
    """Cosine similarity between two array columns — pure JVM HOFs."""
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k neighbors per query by cosine.

    ``queries`` is broadcast (small side); the corpus never shuffles.
    Output: (query_id, vec_id, sim, rank) — excludes self-matches.
    """
    q = queries.select(
        F.col(id_col).alias(query_id_col), F.col(vec_col).alias("q_vec")
    )
    scored = corpus.join(F.broadcast(q), F.col(id_col) != F.col(query_id_col)).select(
        query_id_col,
        id_col,
        cosine(F.col("q_vec"), F.col(vec_col)).alias("sim"),
    )
    return top_n(
        scored,
        [query_id_col],
        [F.col("sim").desc(), F.col(id_col)],
        k,
        ascending=True,
        rank_col="rank",
    )


def _planes(dim: int, num_planes: int, table: int = 0) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes from md5 — reproducible
    across runs/engines without any RNG dependency. `table` seeds an
    independent plane set per LSH hash table (OR-amplification)."""
    planes = []
    for p in range(num_planes):
        vals = []
        for d in range(dim):
            h = hashlib.md5(f"plane|{table}|{p}|{d}".encode()).hexdigest()
            # map 8 hex chars to [-1, 1)
            vals.append(int(h[:8], 16) / float(2**31) - 1.0)
        planes.append(vals)
    return planes


def lsh_bucket(vec_col, dim: int, num_planes: int = 8, table: int = 0):
    """Random-hyperplane LSH bucket id (0..2^num_planes-1) for a vector."""
    planes = _planes(dim, num_planes, table)
    bucket = None
    for p, plane in enumerate(planes):
        arr = F.array(*[F.lit(v) for v in plane])
        bit = F.when(_dot(vec_col, arr) > 0, F.lit(2**p)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    return bucket.cast("int")


def cosine_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    num_planes: int = 8,
    num_tables: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k: candidates = same bucket in ANY of `num_tables`
    independent hash tables (OR-amplification), then exact cosine.

    Recall ≈ 1 − (1 − p)^L for per-table collision probability p — one
    table alone misses most true neighbors once vectors are
    near-orthogonal. The (table, bucket) equi-join is the scale path:
    shuffle keyed on the composite bucket id, candidate volume
    ≈ L·n/2^planes per query instead of n; raising `num_planes` shrinks
    buckets, raising `num_tables` buys recall.
    """
    tables = list(range(num_tables))
    c_buckets = F.array(
        *[lsh_bucket(F.col(vec_col), dim, num_planes, t) for t in tables]
    )
    q_buckets = F.array(
        *[lsh_bucket(F.col("q_vec"), dim, num_planes, t) for t in tables]
    )
    cb = corpus.select(
        id_col, vec_col, F.posexplode(c_buckets).alias("tbl", "bucket")
    )
    q = queries.select(
        F.col(id_col).alias(query_id_col), F.col(vec_col).alias("q_vec")
    ).select(query_id_col, "q_vec", F.posexplode(q_buckets).alias("tbl", "bucket"))
    scored = (
        cb.join(q, ["tbl", "bucket"])
        .filter(F.col(id_col) != F.col(query_id_col))
        .select(query_id_col, id_col, F.col(vec_col).alias("c_vec"), F.col("q_vec"))
        .dropDuplicates([query_id_col, id_col])  # same pair from several tables
        .select(query_id_col, id_col, cosine(F.col("q_vec"), F.col("c_vec")).alias("sim"))
    )
    return top_n(
        scored,
        [query_id_col],
        [F.col("sim").desc(), F.col(id_col)],
        k,
        ascending=True,
        rank_col="rank",
    )
