"""Driver-graded queries for streaming-only operators.

These run a real Structured Streaming job (availableNow file replay)
inside the query function and return the materialized result, so the
driver's DuckDB oracle can grade operators whose semantics are streaming
(changelogs, retractions) against the equivalent batch SQL.

Reference: StreamingJoinOperator.java:37 (unbounded join + retractions),
RetractStreamTableSink semantics (BaseRow.java:40-47).
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

from my_flink_1_10_2_spark.queries import read, register


@register(
    "q_retract_join_materialized",
    oracle="""
    SELECT o.o_orderkey AS okey, o.o_totalprice AS price,
           c.c_custkey AS ckey, c.c_name AS cname
    FROM (SELECT * FROM orders WHERE o_orderkey % 100 < 2) o
    LEFT JOIN (SELECT * FROM customer WHERE c_custkey % 10 = 0) c
      ON o.o_custkey = c.c_custkey
    """,
    category="streaming",
)
def q_retract_join_materialized(spark, sf_dir):
    """Unbounded stream-stream LEFT join with retractions (ref:
    StreamingJoinOperator.java:37), replayed from files in micro-batches;
    the +I/-D changelog is applied to a multiset and must materialize to
    exactly the batch LEFT JOIN.

    The changelog materialization is fully distributed — this is the
    pattern to copy at 100 TB: each micro-batch appends its ±1-weighted
    rows to a parquet changelog sink (no driver collect), and the final
    table is groupBy(all columns).sum(weight) with the multiset expanded
    back by explode(sequence(1, n)) — one hash shuffle on the output
    key, never a byte through the driver."""
    from my_flink_1_10_2_spark.streaming import StreamExecutionEnvironment
    from my_flink_1_10_2_spark.streaming.retraction_join import CHANGE_COL

    left = (
        read(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 100 < 2)
        .select(
            F.col("o_orderkey").alias("okey"),
            F.col("o_custkey").alias("l_ck"),
            F.col("o_totalprice").alias("price"),
        )
    )
    right = (
        read(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % 10 == 0)
        .select(F.col("c_custkey").alias("ckey"), F.col("c_name").alias("cname"))
    )

    work = tempfile.mkdtemp(prefix="fl_rjoin_q_")
    try:
        left.repartition(3).write.mode("overwrite").parquet(f"{work}/l")
        right.repartition(3).write.mode("overwrite").parquet(f"{work}/r")
        env = StreamExecutionEnvironment(spark)
        ls = env.from_files(f"{work}/l", left.schema, max_files_per_trigger=1)
        rs = env.from_files(f"{work}/r", right.schema, max_files_per_trigger=1)

        out_fields = [f for f in left.schema.fields] + [
            f for f in right.schema.fields
        ]
        out_cols = [f.name for f in out_fields]
        log_dir = f"{work}/changelog"

        def sink(batch_df, _bid):
            # distributed per-batch append: +I rows weigh +1, -D rows -1
            (
                batch_df.withColumn(
                    "__w",
                    F.when(F.col(CHANGE_COL) == "+I", F.lit(1)).otherwise(
                        F.lit(-1)
                    ),
                )
                .drop(CHANGE_COL)
                .write.mode("append")
                .parquet(log_dir)
            )

        rj = ls.retract_join(rs, on=[("l_ck", "ckey")], how="left")
        try:
            rj.run(sink)
        finally:
            rj.cleanup()

        mult = (
            spark.read.parquet(log_dir)
            .groupBy(*out_cols)
            .agg(F.sum("__w").alias("__n"))
        )
        assert (
            mult.where(F.col("__n") < 0).limit(1).count() == 0
        ), "negative multiplicity in changelog"
        result = (
            mult.where(F.col("__n") > 0)
            .withColumn("__i", F.explode(F.sequence(F.lit(1), F.col("__n"))))
            .drop("__i", "__n")
        )
        # materialize distributedly before the tempdir vanishes: the
        # eager localCheckpoint pins the blocks executor-side and cuts
        # lineage to the temp parquet — no rows through the driver
        return result.select("okey", "price", "ckey", "cname").localCheckpoint(
            eager=True
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


@register(
    "q_stream_iterate",
    oracle="""
    SELECT event_id,
           vi - 97 * ((vi + 96) // 97) AS residue
    FROM (
      SELECT event_id, CAST(ceil(value) AS BIGINT) AS vi
      FROM events WHERE event_id % 200 = 0
    )
    """,
    category="streaming",
)
def q_stream_iterate(spark, sf_dir):
    """Streaming iteration fixpoint (ref: DataStream.iterate()
    DataStream.java:534, IterativeStream.java; the reference's
    IterateExample decrements until the value leaves the loop).

    Events are replayed as micro-batches; each batch loops through the
    feedback edge subtracting 97 until the value turns non-positive, and
    exiting rows append to a distributed parquet sink.  The oracle is the
    closed form of that loop — ``vi - 97*ceil(vi/97)`` in pure integer
    arithmetic, so repeated subtraction and the one-shot formula agree
    bitwise.  All loop work is distributed DataFrame ops; exits append to
    parquet, never the driver.
    """
    from my_flink_1_10_2_spark.streaming import StreamExecutionEnvironment

    src = (
        read(spark, sf_dir, "events")
        .filter(F.col("event_id") % 200 == 0)
        .select(
            "event_id", F.ceil("value").cast("bigint").alias("vi")
        )
    )
    work = tempfile.mkdtemp(prefix="fl_iter_q_")
    try:
        src.repartition(2).write.mode("overwrite").parquet(f"{work}/src")
        env = StreamExecutionEnvironment(spark)
        stream = env.from_files(f"{work}/src", src.schema, max_files_per_trigger=1)

        out_dir = f"{work}/exits"

        def sink(batch_df, _bid):
            batch_df.write.mode("append").parquet(out_dir)

        stream.iterate(
            step=lambda df: df.withColumn("vi", F.col("vi") - F.lit(97)),
            feedback_predicate="vi > 0",
            emit_fn=sink,
            max_iterations=16,
        )
        result = spark.read.parquet(out_dir).select(
            "event_id", F.col("vi").alias("residue")
        )
        return result.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)
