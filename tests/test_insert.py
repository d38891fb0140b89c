"""INSERT INTO / INSERT OVERWRITE + sqlUpdate/execute job semantics.

Reference: Flink 1.10's TableEnvironment.sqlUpdate("INSERT ...") →
StreamExecSink/BatchExecSink (positional column matching, implicit
casts), deferred until execute(); SqlInsert's OVERWRITE flag; EXPLAIN
via TableEnvironment.explain.
"""

from __future__ import annotations

import os

import pytest

from my_flink_1_10_2_spark.session import TableEnvironment


@pytest.fixture()
def env_with_sink(spark, tmp_path):
    env = TableEnvironment(spark)
    env.execute_sql(
        f"""CREATE TABLE sink_t (
              k BIGINT,
              v STRING
            ) WITH (
              'connector' = 'filesystem',
              'path' = '{tmp_path / "sink_t"}',
              'format' = 'parquet'
            )"""
    )
    return env


def test_insert_into_appends(env_with_sink):
    env = env_with_sink
    r1 = env.execute_sql("INSERT INTO sink_t VALUES (1, 'a'), (2, 'b')")
    assert r1.collect()[0][0] == 2
    r2 = env.execute_sql("INSERT INTO sink_t SELECT 3, 'c'")
    assert r2.collect()[0][0] == 1  # rows written by THIS insert
    got = sorted((r.k, r.v) for r in env.sql_query("SELECT * FROM sink_t").df.collect())
    assert got == [(1, "a"), (2, "b"), (3, "c")]


def test_insert_overwrite_replaces(env_with_sink):
    env = env_with_sink
    env.execute_sql("INSERT INTO sink_t VALUES (1, 'a')")
    env.execute_sql("INSERT OVERWRITE sink_t VALUES (9, 'z')")
    got = [(r.k, r.v) for r in env.sql_query("SELECT * FROM sink_t").df.collect()]
    assert got == [(9, "z")]


def test_insert_positional_cast(env_with_sink):
    env = env_with_sink
    # ints for k, ints for v: v must be implicitly cast to STRING
    env.execute_sql("INSERT INTO sink_t SELECT 7, 42")
    got = [(r.k, r.v) for r in env.sql_query("SELECT * FROM sink_t").df.collect()]
    assert got == [(7, "42")]


def test_insert_column_list_subset(spark, tmp_path):
    env = TableEnvironment(spark)
    env.execute_sql(
        f"""CREATE TABLE wide_t (a BIGINT, b STRING, c DOUBLE) WITH (
              'connector' = 'filesystem',
              'path' = '{tmp_path / "wide_t"}',
              'format' = 'parquet'
            )"""
    )
    with pytest.raises(ValueError, match="unknown columns"):
        env.execute_sql("INSERT INTO wide_t (a, nope) VALUES (1, 'x')")
    with pytest.raises(ValueError, match="expects"):
        env.execute_sql("INSERT INTO wide_t VALUES (1, 'x')")


def test_insert_into_temp_view_rejected(spark):
    env = TableEnvironment(spark)
    spark.range(3).createOrReplaceTempView("just_a_view")
    with pytest.raises(ValueError, match="read-only|not a DDL"):
        env.execute_sql("INSERT INTO just_a_view SELECT 1")


def test_sql_update_buffers_until_execute(env_with_sink):
    env = env_with_sink
    env.sql_update("INSERT INTO sink_t VALUES (1, 'a')")
    env.sql_update("INSERT INTO sink_t VALUES (2, 'b')")
    # nothing ran yet (ref: Flink 1.10 deferred jobs)
    assert env.sql_query("SELECT count(*) AS n FROM sink_t").df.collect()[0].n == 0
    results = env.execute("nightly_job")
    assert len(results) == 2
    assert env.sql_query("SELECT count(*) AS n FROM sink_t").df.collect()[0].n == 2
    # buffer drained — second execute is a no-op
    assert env.execute() == []


def test_insert_partitioned_dynamic_overwrite(spark, tmp_path):
    env = TableEnvironment(spark)
    env.execute_sql(
        f"""CREATE TABLE part_t (k BIGINT, p STRING)
            PARTITIONED BY (p) WITH (
              'connector' = 'filesystem',
              'path' = '{tmp_path / "part_t"}',
              'format' = 'parquet'
            )"""
    )
    env.execute_sql("INSERT INTO part_t VALUES (1, 'x'), (2, 'y')")
    # dynamic overwrite touches only partition 'x'; 'y' survives
    env.execute_sql("INSERT OVERWRITE part_t VALUES (10, 'x')")
    got = sorted((r.k, r.p) for r in env.sql_query("SELECT * FROM part_t").df.collect())
    assert got == [(2, "y"), (10, "x")]
    # hive-layout directories on disk
    assert os.path.isdir(str(tmp_path / "part_t" / "p=x"))


def test_table_insert_into(env_with_sink, spark):
    env = env_with_sink
    from my_flink_1_10_2_spark.table import Table

    Table(spark.createDataFrame([(5, "e")], "k bigint, v string")).insert_into(
        env, "sink_t"
    )
    got = [(r.k, r.v) for r in env.sql_query("SELECT * FROM sink_t").df.collect()]
    assert got == [(5, "e")]


def test_explain_statement(env_with_sink):
    env = env_with_sink
    plan = env.execute_sql("EXPLAIN SELECT k, count(*) FROM sink_t GROUP BY k").collect()[0].plan
    assert "Physical Plan" in plan
    assert "HashAggregate" in plan or "SortAggregate" in plan


def test_map_with_broadcast_set(spark):
    """ref: DataSet.withBroadcastSet SingleInputUdfOperator.java:94 —
    rich function reads a broadcast dimension inside the UDF."""
    from my_flink_1_10_2_spark.table import Table

    rates = Table(
        spark.createDataFrame([("EUR", 1.1), ("GBP", 1.3)], "ccy string, rate double")
    )
    tx = Table(
        spark.createDataFrame(
            [(1, "EUR", 100.0), (2, "GBP", 50.0), (3, "USD", 10.0)],
            "id bigint, ccy string, amount double",
        )
    )

    def to_usd(pdf, bc):
        lookup = {r["ccy"]: r["rate"] for r in bc["rates"]}
        pdf["usd"] = pdf["amount"] * pdf["ccy"].map(lambda c: lookup.get(c, 1.0))
        return pdf[["id", "usd"]]

    out = tx.map_with_broadcast(
        to_usd, "id bigint, usd double", {"rates": rates}
    )
    got = {r.id: round(r.usd, 6) for r in out.df.collect()}
    assert got == {1: 110.0, 2: 65.0, 3: 10.0}


def test_insert_column_list_order_and_null_fill(spark, tmp_path):
    """Regression: the column list matches the SELECT in USER order, and
    unlisted columns are null-filled (never dropped)."""
    env = TableEnvironment(spark)
    env.execute_sql(
        f"""CREATE TABLE ord_t (a BIGINT, b STRING, c DOUBLE) WITH (
              'connector' = 'filesystem',
              'path' = '{tmp_path / "ord_t"}',
              'format' = 'parquet')"""
    )
    # reversed column list: 'x' -> b, 7 -> a; c null-filled
    env.execute_sql("INSERT INTO ord_t (b, a) SELECT 'x', 7")
    got = [(r.a, r.b, r.c) for r in env.sql_query("SELECT * FROM ord_t").df.collect()]
    assert got == [(7, "x", None)]
    # and the table stays readable with the full 3-column schema
    env.execute_sql("INSERT INTO ord_t (a, b, c) SELECT 1, 'y', 2.5")
    assert env.sql_query("SELECT count(*) AS n FROM ord_t").df.collect()[0].n == 2
