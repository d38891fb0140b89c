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
from collections import Counter

from pyspark.sql import functions as F
from pyspark.sql.types import StructType

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
    exactly the batch LEFT JOIN."""
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

        acc: Counter = Counter()

        def sink(batch_df, _bid):
            for row in batch_df.collect():
                d = row.asDict()
                change = d.pop(CHANGE_COL)
                key = tuple(d[c] for c in out_cols)
                acc[key] += 1 if change == "+I" else -1

        out_fields = [f for f in left.schema.fields] + [
            f for f in right.schema.fields
        ]
        out_cols = [f.name for f in out_fields]
        rj = ls.retract_join(rs, on=[("l_ck", "ckey")], how="left")
        try:
            rj.run(sink)
        finally:
            rj.cleanup()

        rows = []
        for key, n in acc.items():
            assert n >= 0, "negative multiplicity in changelog"
            rows.extend([key] * n)
        result = spark.createDataFrame(rows, StructType(out_fields))
        return result.select("okey", "price", "ckey", "cname")
    finally:
        shutil.rmtree(work, ignore_errors=True)
