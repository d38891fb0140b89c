"""State Processor API (ref: flink-state-processing-api/Savepoint.java,
ExistingSavepoint.java, NewSavepoint.java): offline keyed-state reads of
Structured Streaming checkpoints (metadata, flattening, time-travel) and
read/bootstrap/transform of manifest-governed operator state."""

import pytest
from pyspark.sql import functions as F

from my_flink_1_10_2_spark.streaming.state_processor import (
    bootstrap_operator_state,
    read_keyed_state,
    read_operator_state,
    read_state_metadata,
    transform_operator_state,
)


@pytest.fixture()
def agg_checkpoint(spark, tmp_path):
    """A real streaming agg checkpoint over a small keyed table."""
    src = spark.createDataFrame(
        [(i % 4, i) for i in range(100)], "k long, v long"
    )
    src.repartition(4).write.mode("overwrite").parquet(str(tmp_path / "in"))
    stream = (
        spark.readStream.schema("k long, v long")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path / "in"))
    )
    agg = stream.groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")
    )
    q = (
        agg.writeStream.outputMode("update")
        .format("noop")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return str(tmp_path / "ckpt")


def test_metadata_lists_the_stateful_operator(spark, agg_checkpoint):
    meta = read_state_metadata(spark, agg_checkpoint).collect()
    assert len(meta) == 1
    assert meta[0].operatorName == "stateStoreSave"
    assert meta[0].maxBatchId >= 1  # multi-batch replay


def test_keyed_state_read_equals_batch_aggregate(spark, agg_checkpoint):
    state = read_keyed_state(spark, agg_checkpoint, operator_id=0)
    rows = {r[state.columns[0]]: (r[state.columns[1]], r[state.columns[2]])
            for r in state.collect()}
    # batch ground truth: 25 values per key, sum of arithmetic series
    assert rows == {
        k: (25, sum(i for i in range(100) if i % 4 == k)) for k in range(4)
    }


def test_keyed_state_time_travel_is_a_prefix(spark, agg_checkpoint):
    meta = read_state_metadata(spark, agg_checkpoint).collect()[0]
    early = read_keyed_state(
        spark, agg_checkpoint, operator_id=0, batch_id=meta.minBatchId
    )
    late = read_keyed_state(spark, agg_checkpoint, operator_id=0)
    ecnt = sum(r[early.columns[1]] for r in early.collect())
    lcnt = sum(r[late.columns[1]] for r in late.collect())
    assert ecnt < lcnt == 100  # older checkpoint holds fewer absorbed rows


def test_keyed_state_unflattened_keeps_structs(spark, agg_checkpoint):
    raw = read_keyed_state(spark, agg_checkpoint, flatten=False)
    assert {"key", "value", "partition_id"} <= set(raw.columns)


def test_operator_state_bootstrap_read_transform(spark, tmp_path):
    path = str(tmp_path / "op_state")
    df = spark.createDataFrame(
        [(i, f"v{i}") for i in range(10)], "id long, val string"
    )
    bootstrap_operator_state(df, path)
    back = read_operator_state(spark, path, "id long, val string")
    assert back.count() == 10

    # bootstrap marks nothing applied: batch 0 of a resumed job proceeds
    from my_flink_1_10_2_spark.streaming.state_dir import StateDir

    state = StateDir(spark, path, "id long, val string")
    assert state.applied_index() == -1
    state.write_batch(
        spark.createDataFrame([(100, "new")], "id long, val string"), 0
    )
    assert read_operator_state(spark, path, "id long, val string").count() == 11

    # offline rewrite: drop even ids
    transform_operator_state(
        spark, path, "id long, val string",
        lambda s: s.where(F.col("id") % 2 == 1),
    )
    rows = read_operator_state(spark, path, "id long, val string").collect()
    assert sorted(r.id for r in rows) == [1, 3, 5, 7, 9]
    # applied watermark preserved across the rewrite
    assert state.applied_index() == 0


def test_bootstrap_refuses_existing_state(spark, tmp_path):
    path = str(tmp_path / "op2")
    df = spark.createDataFrame([(1,)], "id long")
    bootstrap_operator_state(df, path)
    with pytest.raises(ValueError, match="already exists"):
        bootstrap_operator_state(df, path)


def test_transform_refuses_empty_state(spark, tmp_path):
    with pytest.raises(ValueError, match="empty"):
        transform_operator_state(
            spark, str(tmp_path / "none"), "id long", lambda s: s
        )


def test_read_operator_state_infers_schema_when_nonempty(spark, tmp_path):
    path = str(tmp_path / "op3")
    bootstrap_operator_state(
        spark.createDataFrame([(5, 2.5)], "id long, x double"), path
    )
    back = read_operator_state(spark, path)
    assert back.schema.simpleString() == "struct<id:bigint,x:double>"


def test_repeated_rewrites_with_interleaved_batches(spark, tmp_path):
    """Regression: a rewrite after (rewrite + more batches) must never
    pick a snapshot name already live — overwriting it and then
    sweeping old dirs would delete the new state."""
    from pyspark.sql import functions as F

    from my_flink_1_10_2_spark.streaming.state_dir import StateDir

    path = str(tmp_path / "op_rw")
    bootstrap_operator_state(
        spark.createDataFrame([(i,) for i in range(8)], "id long"), path
    )
    ident = lambda s: s  # noqa: E731
    transform_operator_state(spark, path, "id long", ident)
    state = StateDir(spark, path, "id long")
    state.write_batch(spark.createDataFrame([(100,)], "id long"), 0)
    assert state.live_dirs()[0].startswith("c_rewrite")
    # second rewrite with the first rewrite STILL live plus a batch dir
    transform_operator_state(
        spark, path, "id long", lambda s: s.where(F.col("id") != 3)
    )
    rows = sorted(
        r.id for r in read_operator_state(spark, path, "id long").collect()
    )
    assert rows == [0, 1, 2, 4, 5, 6, 7, 100]
    assert state.applied_index() == 0
