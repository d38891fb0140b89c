"""Distributed sketches for 100 TB-scale approximate analytics.

The reference exposes approximate aggregates through its agg-function
surface (APPROX_COUNT_DISTINCT in FlinkSqlOperatorTable.java; runtime
HllBuffer in flink-table-runtime-blink). Spark's built-ins
(`approx_count_distinct`, `percentile_approx`) cover the HLL/KLL cases
natively — use those in production.

This module adds a **KMV (k-minimum-values) distinct-count sketch**
built from md5, for two reasons:

  - it is *deterministic and engine-portable*, so the DuckDB oracle can
    replay the exact estimate (the driver's hash-match gate, which a
    HLL implementation difference would fail);
  - it is mergeable the same way production sketches are: the k smallest
    hashes of a union = merge of per-partition k smallest — Spark plans
    the TakeOrdered/limit push-down automatically, so the shuffle
    carries k rows per partition, not the data.

Estimator (Bar-Yossef et al., "Counting distinct elements in a data
stream"): with h(v) uniform on (0,1] and h_(k) the k-th smallest hash of
the distinct values, E[distinct] ≈ (k-1)/h_(k).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# 15 hex chars = 60 bits — exact in a double (< 2^53 after the /16 scale
# below would lose bits, so normalize with the full 60-bit denominator).
_DENOM = float(16**15)


def _norm_hash(col):
    """Deterministic uniform hash of `col` into (0, 1] — md5-based, so
    DuckDB computes the identical value."""
    hx = F.substring(F.md5(F.col(col).cast("string")), 1, 15)
    return (F.conv(hx, 16, 10).cast("double") + F.lit(1.0)) / F.lit(_DENOM)


def kmv_distinct(df: DataFrame, col: str, k: int = 128) -> DataFrame:
    """KMV distinct-count estimate for `col` → 1-row (estimate double).

    Plan shape at scale: hash-project → per-partition top-k
    (TakeOrdered partial) → k-row merge on one reducer → closed-form
    estimate. No groupBy of the full domain, no sketch buffer classes —
    the k smallest hashes ARE the sketch.
    """
    hashes = df.select(_norm_hash(col).alias("h")).dropDuplicates(["h"])
    kth = hashes.orderBy("h").limit(k).agg(
        F.max("h").alias("hk"), F.count("*").alias("n")
    )
    # fewer than k distinct values → the sketch is exact (n itself)
    return kth.select(
        F.when(F.col("n") < k, F.col("n").cast("double"))
        .otherwise((F.lit(float(k - 1))) / F.col("hk"))
        .alias("estimate")
    )


def kmv_distinct_by(df: DataFrame, group_cols: list[str], col: str, k: int = 64) -> DataFrame:
    """Grouped KMV estimates: one sketch per group.

    Per-group k-th smallest via row_number window — the window input is
    already deduped to distinct (group, hash) pairs, so state is
    O(distinct), and only k rows per group survive to the aggregate.
    """
    from pyspark.sql import Window as W

    hashed = df.select(*group_cols, _norm_hash(col).alias("h")).dropDuplicates(
        [*group_cols, "h"]
    )
    w = W.partitionBy(*group_cols).orderBy("h")
    topk = hashed.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= k)
    return topk.groupBy(*group_cols).agg(
        F.when(F.count("*") < k, F.count("*").cast("double"))
        .otherwise(F.lit(float(k - 1)) / F.max("h"))
        .alias("estimate")
    )
