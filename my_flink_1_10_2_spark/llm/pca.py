"""Distributed PCA (top principal component) over an embedding column —
the dimensionality-reduction / decorrelation step a training-data
pipeline runs before whitening, visualization bucketing, or
spread-by-projection sharding.  The reference has no linear-algebra
operator; this is pipeline surface on top of its relational core, built
the way production systems do it (e.g. Spark MLlib's RowMatrix
computePrincipalComponents: a distributed Gram matrix + a driver-side
eigen step on the O(dim²) summary).

Scale shape (the part that must survive 100 TB):

  - ONE pass over the corpus computes the Gram matrix ``S = Σ v vᵀ`` and
    the column sums ``m`` as **partition-local integer matmuls** inside
    an Arrow kernel (numpy int64 — exact, every partial < 2^63), each
    partition emitting one dim×dim partial — the shuffle carries
    ``partitions × dim²`` rows, never the data;
  - the dim×dim covariance ``C = n·S − m mᵀ`` (an integer multiple of
    the true covariance — same eigenvectors) lives on the driver:
    O(dim²) index metadata, exactly like the IVF centroid list and PQ
    codebooks;
  - the power iteration runs on that 64×64 matrix in exact Python
    integers, re-quantizing the iterate each round through a fixed
    engine-portable protocol (below);
  - projections are one map over the corpus: an exact BIGINT dot
    product per row.

Exactness protocol (what lets DuckDB replay the whole factorization
bitwise): vectors are integer units (``round(x·1000)``); S, m, C and
every mat-vec product are exact (arbitrary-precision on the driver,
HUGEINT in the oracle); each iteration converts the exact mat-vec
result to IEEE doubles (correctly-rounded int→double, identical in any
engine), divides by the max |component| and re-quantizes to ±1e6
integer units via the explicit half-away formula
``sign(x)·floor(|x|+0.5)`` — spelled the same way in SQL, so both
engines run identical IEEE ops.  The final sign is fixed by making the
first nonzero component positive.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from my_flink_1_10_2_spark.llm.similarity import int_vec


def gram_and_colsums(
    emb: DataFrame, vec_col: str = "embedding", scale: int = 1000
) -> DataFrame:
    """One-pass distributed Gram matrix: rows (i, j, s, m, c) where
    ``s = Σ vi·vj`` over the integer-unit corpus, ``m = Σ vi`` and
    ``c`` the corpus row count (both repeated per (i,j) row for
    convenience, exact).  Partition-local numpy int64 matmul partials →
    one (i,j)-keyed sum; the shuffle is O(partitions · dim²).  The
    count partial makes downstream consumers one-pass: no separate
    ``emb.count()`` scan that could observe a different input."""
    import numpy as np
    import pandas as pd

    src = emb.select(int_vec(F.col(vec_col), scale).alias("__vi"))

    def kernel(batches):
        acc_s = None
        acc_m = None
        acc_n = 0
        for b in batches:
            if not len(b):
                continue
            v = np.stack(b["__vi"].to_numpy()).astype(np.int64)
            s = v.T @ v  # int64-exact: |terms| < 2^63 by unit bounds
            m = v.sum(axis=0)
            acc_s = s if acc_s is None else acc_s + s
            acc_m = m if acc_m is None else acc_m + m
            acc_n += len(b)
        if acc_s is None:
            return
        dim = acc_s.shape[0]
        ii, jj = np.meshgrid(np.arange(dim), np.arange(dim), indexing="ij")
        yield pd.DataFrame(
            {
                "i": ii.ravel().astype(np.int32),
                "j": jj.ravel().astype(np.int32),
                "s": acc_s.ravel(),
                "m": acc_m[ii.ravel()],
                "c": np.full(dim * dim, acc_n, dtype=np.int64),
            }
        )

    partials = src.mapInPandas(kernel, "i int, j int, s long, m long, c long")
    return partials.groupBy("i", "j").agg(
        F.sum("s").alias("s"), F.sum("m").alias("m"), F.sum("c").alias("c")
    )


def _requantize(w: list[int]) -> list[int]:
    """One iteration's re-quantization: exact integers → IEEE doubles →
    ±1e6 integer units via sign(x)·floor(|x|+0.5) on x = (w/max|w|)·1e6.
    Every step is an IEEE operation on identical operands in any
    engine."""
    wd = [float(x) for x in w]  # correctly-rounded int→double
    q = max(abs(x) for x in wd)
    if q == 0.0:
        return [0] * len(w)
    out = []
    for x in wd:
        t = (x / q) * 1e6
        out.append(int(math.copysign(math.floor(abs(t) + 0.5), t)))
    return out


def pca_top_component(
    emb: DataFrame,
    vec_col: str = "embedding",
    scale: int = 1000,
    iterations: int = 12,
) -> list[int]:
    """Top eigenvector of the (scaled) covariance in ±1e6 integer units,
    via exact-integer power iteration on the driver-side dim×dim
    summary.  Deterministic: fixed all-ones start, fixed iteration
    count, the re-quantization protocol above, and first-nonzero-
    positive sign convention."""
    rows = gram_and_colsums(emb, vec_col, scale).collect()
    if not rows:
        raise ValueError("pca: empty corpus")
    n = int(rows[0]["c"])  # from the one-pass kernel — no second scan
    dim = max(r["i"] for r in rows) + 1
    S = [[0] * dim for _ in range(dim)]
    m = [0] * dim
    for r in rows:
        S[r["i"]][r["j"]] = int(r["s"])
        m[r["i"]] = int(r["m"])
    C = [[n * S[i][j] - m[i] * m[j] for j in range(dim)] for i in range(dim)]
    v = [1] * dim
    for _ in range(iterations):
        w = [sum(C[i][j] * v[j] for j in range(dim)) for i in range(dim)]
        v = _requantize(w)
    for x in v:
        if x != 0:
            if x < 0:
                v = [-y for y in v]
            break
    return v


def pca_project(
    emb: DataFrame,
    component: list[int],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1000,
    out_col: str = "proj",
) -> DataFrame:
    """Exact BIGINT projection of every vector onto ``component``
    (integer units both sides): one narrow map, no shuffle."""
    vi = int_vec(F.col(vec_col), scale)
    comp = F.array(*[F.lit(int(c)) for c in component])
    dot = F.aggregate(
        F.zip_with(vi, comp, lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return emb.select(F.col(id_col), dot.alias(out_col))
