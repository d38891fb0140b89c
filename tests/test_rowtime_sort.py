"""Streaming rowtime sort (ref: StreamExecTemporalSort.scala,
RowTimeSortOperator.java): watermark-gated ordered emission + late drop."""

from __future__ import annotations

import os

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
    TimestampNTZType,
)

from my_flink_1_10_2_spark.streaming import StreamExecutionEnvironment

SCHEMA = StructType(
    [StructField("ts", TimestampNTZType()), StructField("id", LongType())]
)

T0 = dt.datetime(2024, 3, 1)


def _ts(i: int) -> dt.datetime:
    return T0 + dt.timedelta(minutes=i)


@pytest.fixture(scope="module")
def sort_dir(tmp_path_factory):
    """3 files = 3 micro-batches.  Arrival order has local swaps (covered
    by a 5-minute out-of-orderness allowance) plus one row (id=2) that
    arrives a whole batch late — behind the watermark — and must drop."""
    d = tmp_path_factory.mktemp("rowtime_sort")
    batches = [
        [1, 0, 3, 2, 5, 4, 6, 7, 9, 8],        # minutes 0..9, swapped pairs
        [11, 10, 13, 12, 15, 14, 17, 16, 19, 18],
        [21, 20, 23, 22, 2, 25, 24, 27, 26, 29, 28],  # "2" is very late
    ]
    for i, ids in enumerate(batches):
        pq.write_table(
            pa.table(
                {
                    "ts": pa.array([_ts(j) for j in ids], pa.timestamp("us")),
                    "id": pa.array([j for j in ids], pa.int64()),
                }
            ),
            d / f"{i}.parquet",
        )
        # FileStreamSource admits files in modification-time order; fast
        # consecutive writes can tie on mtime and invert batch order
        # under load — pin distinct mtimes so batch i really arrives i-th.
        os.utime(d / f"{i}.parquet", (1_700_000_000 + i * 10, 1_700_000_000 + i * 10))
    return str(d)


def test_rowtime_sort_emits_in_order_and_drops_late(spark, sort_dir):
    env = StreamExecutionEnvironment(spark)
    stream = env.from_files(sort_dir, SCHEMA, max_files_per_trigger=1)
    emitted: list[int] = []

    def emit(df, _bid):
        emitted.extend(r["id"] for r in df.collect())

    stream.rowtime_sort("ts", 5 * 60, emit, secondary=["id"])

    expected = sorted(set(range(30)) - {2} | {2})  # all ids 0..29
    # the duplicate-arriving id=2 appears once (its on-time copy in batch
    # 0); the batch-2 copy was behind the watermark and dropped
    assert emitted.count(2) == 1
    assert emitted == sorted(emitted), "global emission order violated"
    assert sorted(emitted) == expected


def test_rowtime_sort_single_batch_flush(spark, tmp_path):
    """Everything in one batch: nothing passes the watermark mid-stream;
    the end-of-stream flush emits all rows sorted."""
    pq.write_table(
        pa.table(
            {
                "ts": pa.array([_ts(j) for j in [3, 1, 2, 0]], pa.timestamp("us")),
                "id": pa.array([3, 1, 2, 0], pa.int64()),
            }
        ),
        tmp_path / "0.parquet",
    )
    env = StreamExecutionEnvironment(spark)
    stream = env.from_files(str(tmp_path), SCHEMA, max_files_per_trigger=1)
    emitted: list[int] = []

    def emit(df, _bid):
        emitted.extend(r["id"] for r in df.collect())

    stream.rowtime_sort("ts", 3600, emit, secondary=["id"])
    assert emitted == [0, 1, 2, 3]
