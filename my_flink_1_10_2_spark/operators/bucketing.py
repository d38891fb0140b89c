"""Bucketed tables: shuffle-free co-located joins and aggregations.

The reference co-locates repeated joins by hash-partitioning both inputs
up front (DataSet.partitionByHash + the optimizer's reuse of existing
FORWARD partitioning, ref:
flink-java/src/main/java/org/apache/flink/api/java/DataSet.java and
flink-runtime ship-strategy selection).  Spark's durable analog is
*bucketing*: `bucketBy(n, keys)` at write time persists the hash
partitioning into the table layout, so every later equi-join or groupBy
on the bucket keys skips its Exchange entirely.

This is a headline 100 TB lever: a fact-to-fact join of two 100 TB
tables costs two full shuffles per run when unbucketed — bucketing both
on the join key amortizes that to zero for every subsequent query.
Bucket count guidance: total_size / bucket_count should land near the
executor task size sweet spot (128-512 MB); bucket counts of joined
tables must match (or be integer multiples with
spark.sql.bucketing.coalesceBucketsInJoin.enabled).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    n_buckets: int,
    *keys: str,
    sort_by: list[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist `df` as a parquet table bucketed (and optionally sorted)
    by `keys`.

    Note on sortBy: since Spark 3.0 the scan no longer *claims* the
    per-bucket sort order, so sort-merge joins keep their (cheap,
    already-nearly-sorted) Sort node; sortBy still pays for itself at
    scale through parquet min/max page pruning and run-length
    compression on the sorted key.  The Exchange elision — the expensive
    part — needs only bucketBy.
    """
    if not keys:
        raise ValueError("write_bucketed needs at least one bucket key")
    # Pre-shuffle into the bucket layout: repartition uses the same
    # murmur3 pmod hashing as bucketBy, so each write task holds exactly
    # one bucket and emits exactly one file.  Without it every task
    # writes a sliver of every bucket (tasks x buckets small files — an
    # HDFS-killer at scale) and multi-file buckets forfeit the sortBy
    # guarantee, putting the Sort back into downstream merge joins.
    from pyspark.sql import functions as F

    df = df.repartition(n_buckets, *[F.col(k) for k in keys])
    w = df.write.format("parquet").mode(mode).bucketBy(n_buckets, *keys)
    if sort_by:
        w = w.sortBy(*sort_by)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back (the bucket metadata rides on the
    catalog entry; a bare `spark.read.parquet(path)` would lose it and
    re-shuffle on join)."""
    return spark.table(table)
