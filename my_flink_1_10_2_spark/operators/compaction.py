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

from pyspark.sql import DataFrame, SparkSession


def _parquet_bytes(spark: SparkSession, src_dir: str) -> int:
    """Total size of ``*.parquet`` under ``src_dir`` via Hadoop's
    FileSystem API — correct for ANY supported scheme (local, HDFS,
    s3a://, ...), unlike os.walk which silently reports 0 for remote
    URIs.  Raises if no parquet files exist (a 0-byte estimate would
    degrade the compactor to one output task with no warning)."""
    jvm = spark._jvm
    path = jvm.org.apache.hadoop.fs.Path(src_dir)
    fs = path.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(path):
        raise FileNotFoundError(f"compact_parquet_dir: source does not exist: {src_dir}")
    total, n_files = 0, 0
    it = fs.listFiles(path, True)
    while it.hasNext():
        st = it.next()
        if st.getPath().getName().endswith(".parquet"):
            total += st.getLen()
            n_files += 1
    if n_files == 0:
        raise ValueError(f"compact_parquet_dir: no .parquet files under {src_dir}")
    return total


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
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    src_path = jvm.org.apache.hadoop.fs.Path(src_dir)
    dst_path = jvm.org.apache.hadoop.fs.Path(dst_dir)
    src_q = src_path.getFileSystem(hconf).makeQualified(src_path)
    dst_q = dst_path.getFileSystem(hconf).makeQualified(dst_path)
    if str(src_q) == str(dst_q):
        raise ValueError(
            "compact_parquet_dir: dst_dir must differ from src_dir "
            f"({src_q}) — overwrite-in-place would clobber the files being read"
        )
    total = _parquet_bytes(spark, src_dir)
    n_out = plan_target_files(total, target_file_bytes)
    df = spark.read.parquet(src_dir)
    out = df.repartition(n_out)
    if sort_within_by:
        out = out.sortWithinPartitions(*sort_within_by)
    out.write.mode("overwrite").parquet(dst_dir)
    return spark.read.parquet(dst_dir)
