"""Global row indexing — the reference's ``DataSetUtils.zipWithIndex`` /
``zipWithUniqueId``
(flink-java/src/main/java/org/apache/flink/api/java/utils/DataSetUtils.java:55,104)
re-expressed Spark-first.

The naive Spark spelling — ``row_number() OVER (ORDER BY key)`` — funnels
the whole table through ONE task (Window with empty PARTITION BY). The
reference avoids the same trap with its two-pass design (count elements
per partition, then re-map with offsets). Here the two passes stay fully
declarative:

1. bucket each row by an equal-width range of the (numeric) key — the
   bounds come from one tiny min/max aggregate that Catalyst broadcasts;
2. ``row_number`` WITHIN each bucket (parallel windows);
3. add each bucket's starting offset — a running sum over the per-bucket
   counts, a ~``n_buckets``-row window that costs nothing.

Index = offset + local rank - 1: contiguous, deterministic, ordered by
the key. Equal-width bucketing assumes the key isn't pathologically
skewed (ids from a sequence are near-uniform); crank ``n_buckets`` up so
the worst bucket still fits an executor.

``zip_with_unique_id`` mirrors the reference's cheaper contract — unique
but non-contiguous ids with no ordering promise — which needs no passes
at all: Spark's ``monotonically_increasing_id`` is exactly that design
(31-bit partition id << 33 | per-partition counter).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def zip_with_index(
    df: DataFrame,
    key: str,
    *,
    index_col: str = "idx",
    n_buckets: int = 32,
) -> DataFrame:
    """Contiguous 0-based index ordered by a numeric ``key`` column.

    Equivalent result to ``row_number() OVER (ORDER BY key) - 1`` but
    with all windows partition-parallel — no single-task global sort.
    Ties on ``key`` would make the index nondeterministic, so ``key``
    must be unique (ids); enforced upstream by the caller.

    NULL keys fail fast: ``floor(NULL/span)`` would land in a NULL
    bucket and the bucket join would silently drop those rows (a
    shorter table with no error).  Instead the bounds aggregate also
    counts NULL keys and poisons ``__lo`` with ``raise_error`` when any
    exist — the job fails at execution with a clear message, still
    fully lazy and distributed (no driver-side count).  Callers with
    nullable keys must filter or fill first; the reference's
    ``zipWithIndex`` likewise indexes every record, never drops.
    """
    bounds = df.agg(
        F.min(key).alias("__lo_raw"),
        F.max(key).alias("__hi"),
        (F.count(F.lit(1)) - F.count(key)).alias("__nulls"),
    ).select(
        F.when(
            F.col("__nulls") > 0,
            F.raise_error(
                F.lit(
                    f"zip_with_index: NULL values in key column '{key}'"
                    " — filter or fill them first"
                )
            ),
        )
        .otherwise(F.col("__lo_raw"))
        .alias("__lo"),
        "__hi",
    )
    span = (F.col("__hi") - F.col("__lo") + 1) / n_buckets
    bucketed = df.join(F.broadcast(bounds)).withColumn(
        "__b",
        F.least(
            F.floor((F.col(key) - F.col("__lo")) / span).cast("int"),
            F.lit(n_buckets - 1),
        ),
    )
    local = Window.partitionBy("__b").orderBy(key)
    counts = bucketed.groupBy("__b").agg(F.count(F.lit(1)).alias("__n"))
    # exclusive prefix sum over the O(n_buckets) counts via a triangular
    # self-join — even this bounded step avoids the unpartitioned-window
    # shape the plan gate bans (Exchange SinglePartition -> Window)
    ca, cb = counts.alias("ca"), counts.alias("cb")
    offsets = (
        ca.join(F.broadcast(cb), F.col("cb.__b") < F.col("ca.__b"), "left")
        .groupBy(F.col("ca.__b").alias("__b"))
        .agg(F.coalesce(F.sum("cb.__n"), F.lit(0)).alias("__off"))
    )
    return (
        bucketed.withColumn("__rn", F.row_number().over(local))
        .join(F.broadcast(offsets), "__b")
        .withColumn(index_col, (F.col("__off") + F.col("__rn") - 1).cast("bigint"))
        .drop("__b", "__rn", "__off", "__lo", "__hi")
    )


def zip_with_unique_id(df: DataFrame, *, index_col: str = "uid") -> DataFrame:
    """Unique (non-contiguous, unordered) ids — the reference's
    ``zipWithUniqueId`` contract, one codegen expression, zero passes."""
    return df.withColumn(index_col, F.monotonically_increasing_id())
