"""Small-file compaction — the table-maintenance pass every long-running
ingestion needs (the reference's StreamingFileSink produces per-bucket
part files sized by its RollingPolicy, ref: flink-streaming-java/.../
functions/sink/filesystem/StreamingFileSink.java and
rollingpolicies/DefaultRollingPolicy.java; compaction is the downstream
half of the same contract: bounded file count AND bounded file size).

At 100 TB the small-file problem is a metadata killer: a listing of
millions of KB-sized parts dominates planning time.  Compaction is one
distributed read + one write with the output file count derived from the
actual byte size — no driver-side data movement.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def plan_target_files(total_bytes: int, target_file_bytes: int = 128 * 1024 * 1024) -> int:
    """Number of output files so each lands near ``target_file_bytes``
    (the parquet sweet spot: large enough to amortize footers/row-group
    overhead, small enough to split across executors)."""
    return max(1, (total_bytes + target_file_bytes - 1) // target_file_bytes)


def compact_parquet_dir(
    spark: SparkSession,
    src_dir: str,
    dst_dir: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_within_by: list[str] | None = None,
) -> DataFrame:
    """Rewrite a fragmented parquet directory into ~target-sized files.

    ``sort_within_by`` optionally sorts rows inside each output file
    (better column compression + min/max pruning for later scans) with
    ``sortWithinPartitions`` — no global shuffle.  Rows are preserved
    exactly; only the physical layout changes.  Returns the compacted
    DataFrame (lazy, over ``dst_dir``).
    """
    total = 0
    for root, _dirs, files in os.walk(src_dir):
        for f in files:
            if f.endswith(".parquet"):
                total += os.path.getsize(os.path.join(root, f))
    n_out = plan_target_files(total, target_file_bytes)
    df = spark.read.parquet(src_dir)
    out = df.repartition(n_out)
    if sort_within_by:
        out = out.sortWithinPartitions(*sort_within_by)
    out.write.mode("overwrite").parquet(dst_dir)
    return spark.read.parquet(dst_dir)
