"""Streaming sources & sinks (SURVEY §2.1, §2.10).

Sources map the reference's `addSource(SourceFunction)` surface
(ref: flink-streaming-java/.../StreamExecutionEnvironment.java:1517) onto
Structured Streaming's built-ins; the transactional sink reimplements the
`TwoPhaseCommitSinkFunction` idea (ref: flink-streaming-java/.../functions/
sink/TwoPhaseCommitSinkFunction.java:77) on Spark's micro-batch model:
the epoch/batchId plays the role of the transaction, and a committed-ids
manifest provides the idempotence that the reference gets from
checkpoint-coordinated commits.
"""

from __future__ import annotations

import json
import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def rate_source(spark: SparkSession, rows_per_second: int = 100) -> DataFrame:
    """Monotonic (timestamp, value) generator — the test-harness analog of
    a SourceFunction emitting a steady stream."""
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
    )


def file_stream_source(
    spark: SparkSession,
    path: str,
    schema,
    fmt: str = "parquet",
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """Directory-watching source (ref: StreamExecutionEnvironment
    .readFile with FileProcessingMode.PROCESS_CONTINUOUSLY).
    `maxFilesPerTrigger` bounds per-micro-batch work — the backpressure
    knob at scale."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .format(fmt)
        .load(path)
    )


def socket_text_stream(spark: SparkSession, host: str, port: int) -> DataFrame:
    """TCP line source (ref: StreamExecutionEnvironment.socketTextStream
    :1396)."""
    return (
        spark.readStream.format("socket")
        .option("host", host)
        .option("port", port)
        .load()
    )


def memory_sink(df: DataFrame, query_name: str, output_mode: str = "append"):
    """In-memory queryable sink for tests (ref analog: the reference's
    test harness collect sinks; also its queryable-state substitute,
    SURVEY §2.10)."""
    return (
        df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .start()
    )


def streaming_file_sink(
    df: DataFrame,
    path: str,
    checkpoint: str,
    fmt: str = "parquet",
    output_mode: str = "append",
):
    """Exactly-once file sink (ref: StreamingFileSink.java bucketing +
    part-file lifecycle). Structured Streaming's file sink keeps a
    _spark_metadata WAL of committed files — readers see only committed
    data, the same guarantee the reference builds from pending/committed
    part files."""
    return (
        df.writeStream.format(fmt)
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode(output_mode)
        .start()
    )


class TransactionalForeachBatchSink:
    """Two-phase-commit sink on micro-batches (ref:
    TwoPhaseCommitSinkFunction.java:77).

    The reference's protocol: beginTransaction → preCommit (flush) →
    commit on checkpoint-complete, with recovery replaying commits for
    persisted-but-uncommitted transactions. Here the micro-batch is the
    transaction: ``write_fn(batch_df, batch_id)`` must stage data
    atomically (e.g. write to a batch-id-suffixed temp dir + rename);
    this class records committed batch ids in a manifest and skips
    replayed ids, making the sink idempotent across failure/restart —
    end-to-end exactly-once together with the source WAL.
    """

    def __init__(self, write_fn: Callable[[DataFrame, int], None], manifest_dir: str):
        self.write_fn = write_fn
        self.manifest = os.path.join(manifest_dir, "committed_batches.json")
        os.makedirs(manifest_dir, exist_ok=True)

    def _committed(self) -> set[int]:
        if not os.path.exists(self.manifest):
            return set()
        with open(self.manifest) as f:
            return set(json.load(f))

    def _record(self, batch_id: int) -> None:
        ids = self._committed()
        ids.add(batch_id)
        tmp = self.manifest + ".tmp"
        with open(tmp, "w") as f:
            json.dump(sorted(ids), f)
        os.replace(tmp, self.manifest)  # atomic commit point

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        if batch_id in self._committed():
            return  # replayed transaction — already committed, skip
        self.write_fn(batch_df, batch_id)
        self._record(batch_id)

    def attach(self, df: DataFrame, checkpoint: str):
        return (
            df.writeStream.foreachBatch(self)
            .option("checkpointLocation", checkpoint)
            .start()
        )
