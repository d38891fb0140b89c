"""Streaming iterations (ref: DataStream.iterate() DataStream.java:534,
IterativeStream.java — feedback edges re-inject selected records into the
loop head).  The Spark spelling drives the feedback per micro-batch inside
foreachBatch; these tests script batches through the loop and assert the
emitted (exited) rows match the fixpoint a batch computation would reach —
the reference's own iterate example (decrement until ≤ 0,
IterateExample.java) in harness form.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from my_flink_1_10_2_spark.streaming.stream import Stream


def _file_stream(spark, tmp_path, rows, schema, n_batches=2):
    d = tmp_path / "iter_src"
    d.mkdir()
    per = max(1, len(rows) // n_batches)
    for i in range(0, len(rows), per):
        spark.createDataFrame(rows[i : i + per], schema).coalesce(1).write.mode(
            "append"
        ).parquet(str(d))
    return Stream(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(str(d))
    )


def test_iterate_decrement_until_zero(spark, tmp_path):
    """Classic feedback loop: subtract 3 while value stays positive; a row
    exits once its value ≤ 0.  Every input must exit with the analytically
    known residue value - 3*ceil(value/3)."""
    rows = [(i, float(v)) for i, v in enumerate([1, 3, 7, 10, 2, 14, 30, 9])]
    stream = _file_stream(spark, tmp_path, rows, "id long, value double")

    emitted: list = []

    stream.iterate(
        step=lambda df: df.withColumn("value", F.col("value") - F.lit(3.0)),
        feedback_predicate="value > 0",
        emit_fn=lambda df, _bid: emitted.extend(df.collect()),
    )

    got = {r.id: r.value for r in emitted}
    import math

    expect = {
        i: float(v) - 3.0 * math.ceil(v / 3.0)
        for i, v in enumerate([1, 3, 7, 10, 2, 14, 30, 9])
    }
    assert got == expect


def test_iterate_respects_max_iterations(spark, tmp_path):
    """A feedback predicate that never releases its rows must hit the
    superstep cap and raise (the reference's runaway-loop guard is a
    feedback timeout; the cap is the deterministic analog)."""
    import pytest

    rows = [(1, 5.0)]
    stream = _file_stream(spark, tmp_path, rows, "id long, value double", n_batches=1)

    with pytest.raises(Exception, match="did not converge"):
        stream.iterate(
            step=lambda df: df,  # no progress
            feedback_predicate="value > 0",
            emit_fn=lambda df, _bid: None,
            max_iterations=3,
        )


def test_iterate_emits_immediately_converged_rows(spark, tmp_path):
    """Rows that already fail the feedback predicate after one step exit in
    superstep 0 — no spurious extra feedback pass."""
    rows = [(i, float(i)) for i in range(4)]  # 0..3
    stream = _file_stream(spark, tmp_path, rows, "id long, value double", n_batches=1)

    batches: list = []
    stream.iterate(
        step=lambda df: df.withColumn("value", F.col("value") - 10.0),
        feedback_predicate="value > 0",
        emit_fn=lambda df, _bid: batches.append(df.collect()),
    )
    flat = [r for b in batches for r in b]
    assert sorted(r.id for r in flat) == [0, 1, 2, 3]
    assert all(r.value <= 0 for r in flat)
