"""DDL surface tests (ref: SqlCreateTable.java:56, SqlWatermark.java —
CREATE TABLE ... WITH (...) + WATERMARK FOR registered from SQL text)."""

from __future__ import annotations

import datetime as dt

from my_flink_1_10_2_spark.ddl import parse_create_table
from my_flink_1_10_2_spark.session import TableEnvironment

_DDL = """
CREATE TABLE clicks (
  user_id BIGINT,
  value DOUBLE,
  ts TIMESTAMP(3),
  WATERMARK FOR ts AS ts - INTERVAL '5' SECOND
) WITH (
  'connector' = 'filesystem',
  'path' = '{path}',
  'format' = 'parquet'
)
"""


def _write_fixture(spark, path: str) -> None:
    base = dt.datetime(2024, 1, 1)
    rows = [
        (u, float(v), base + dt.timedelta(minutes=m))
        for u in (1, 2)
        for m, v in enumerate(range(10))
    ]
    spark.createDataFrame(
        rows, "user_id long, value double, ts timestamp_ntz"
    ).coalesce(1).write.mode("overwrite").parquet(path)


def test_parse_create_table_full_clause():
    ct = parse_create_table(_DDL.format(path="/tmp/x"))
    assert ct.name == "clicks"
    assert ct.columns == [
        ("user_id", "bigint"), ("value", "double"), ("ts", "timestamp_ntz")
    ]
    assert ct.watermark == ("ts", "5 seconds")
    assert ct.options["format"] == "parquet"
    assert ct.options["path"] == "/tmp/x"


def test_ddl_registers_batch_view_for_group_window_sql(spark, tmp_path):
    """The DDL-registered view feeds the Flink group-window SQL surface
    (TUMBLE rewritten to window()) like any catalog table."""
    path = str(tmp_path / "clicks")
    _write_fixture(spark, path)
    te = TableEnvironment(spark)
    te.execute_sql(_DDL.format(path=path))
    out = te.sql(
        """
        SELECT user_id, TUMBLE_START(ts, INTERVAL '5' MINUTE) AS w_start,
               SUM(value) AS total
        FROM clicks
        GROUP BY user_id, TUMBLE(ts, INTERVAL '5' MINUTE)
        """
    ).df
    rows = {(r.user_id, r.w_start): r.total for r in out.collect()}
    base = dt.datetime(2024, 1, 1)
    # minutes 0-4 carry values 0..4 → 10; minutes 5-9 carry 5..9 → 35
    assert rows[(1, base)] == 10.0
    assert rows[(1, base + dt.timedelta(minutes=5))] == 35.0
    assert len(rows) == 4


def test_ddl_stream_table_applies_watermark_and_windows(spark, tmp_path):
    """stream_table() reads the same source with readStream and the
    declared watermark; a windowed agg over it converges to the batch
    answer (availableNow drain into a memory sink)."""
    from pyspark.sql import functions as F

    path = str(tmp_path / "clicks")
    _write_fixture(spark, path)
    te = TableEnvironment(spark)
    te.execute_sql(_DDL.format(path=path))
    stream = te.stream_table("clicks")
    assert stream.isStreaming
    # watermark node must be on the plan
    assert "EventTimeWatermark" in stream._jdf.queryExecution().logical().toString()

    agg = stream.groupBy(
        "user_id", F.window("ts", "5 minutes").alias("w")
    ).agg(F.sum("value").alias("total"))
    q = (
        agg.writeStream.format("memory")
        .queryName("ddl_stream_out")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.user_id, r.w.start): r.total
        for r in spark.table("ddl_stream_out").collect()
    }
    base = dt.datetime(2024, 1, 1)
    assert got[(2, base)] == 10.0
    assert got[(2, base + dt.timedelta(minutes=5))] == 35.0
    assert len(got) == 4


# module-level so CREATE FUNCTION can resolve 'tests.test_ddl.<attr>'
def plain_upper(s):
    return (s or "").upper()


def __getattr__(name):
    # PEP 562 lazy attr: building a pyspark UDF object needs an active
    # session, so create it only when CREATE FUNCTION resolves the path
    if name == "typed_double":
        from pyspark.sql import functions as F

        return F.udf(lambda x: float(x) * 2.0, "double")
    raise AttributeError(name)


def test_create_view_with_flink_sql_body(spark):
    """CREATE VIEW whose body uses Flink TUMBLE SQL — the rewriter must
    apply inside the view definition (ref: SqlCreateView.java)."""
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "ts": pd.to_datetime([0, 60, 3600, 3660], unit="s"),
            "v": [1.0, 2.0, 3.0, 4.0],
        }
    )
    spark.createDataFrame(pdf).createOrReplaceTempView("cv_events")
    te = TableEnvironment(spark)
    te.execute_sql(
        """
        CREATE TEMPORARY VIEW hourly AS
        SELECT TUMBLE_START(ts, INTERVAL '1' HOUR) AS ws, sum(v) AS total
        FROM cv_events
        GROUP BY TUMBLE(ts, INTERVAL '1' HOUR)
        """
    )
    got = {r.ws: r.total for r in spark.table("hourly").collect()}
    assert list(sorted(got.values())) == [3.0, 7.0]
    # column-list form renames the projection
    te.execute_sql("CREATE VIEW hourly2(w, t) AS SELECT * FROM hourly")
    assert spark.table("hourly2").columns == ["w", "t"]


def test_create_function_typed_and_plain(spark):
    """CREATE FUNCTION AS 'module.attr' — a pyspark UDF object keeps its
    return type; a plain callable defaults to STRING (ref:
    SqlCreateFunction.java, catalog createFunction)."""
    te = TableEnvironment(spark)
    te.execute_sql(
        "CREATE TEMPORARY FUNCTION dbl AS 'tests.test_ddl.typed_double'"
    )
    te.execute_sql(
        "CREATE FUNCTION up AS 'tests.test_ddl.plain_upper' LANGUAGE PYTHON"
    )
    row = spark.sql("SELECT dbl(21) AS d, up('abc') AS u").first()
    assert row.d == 42.0 and row.u == "ABC"
    assert dict(spark.sql("SELECT dbl(1) AS d").dtypes)["d"] == "double"


def test_create_function_errors(spark):
    import pytest

    te = TableEnvironment(spark)
    with pytest.raises(ValueError, match="resolve"):
        te.execute_sql("CREATE FUNCTION nope AS 'tests.test_ddl.missing'")
    with pytest.raises(ValueError, match="dotted"):
        te.execute_sql("CREATE FUNCTION nope AS 'bare'")
    with pytest.raises(ValueError, match="LANGUAGE"):
        te.execute_sql("CREATE FUNCTION j AS 'a.b' LANGUAGE JAVA")


def test_time_type_ddl_and_literal_roundtrip(spark):
    """TIME(p) maps to int millis-of-day (SURVEY §1.2 / TimeType.java);
    literal formatting and reparsing are lossless at the edges."""
    from my_flink_1_10_2_spark.ddl import _flink_type
    from my_flink_1_10_2_spark.types import (
        DataTypes,
        millis_to_time_string,
        time_string_to_millis,
    )
    import pyspark.sql.types as T
    from pyspark.sql import functions as F

    assert _flink_type("TIME") == "int"
    assert _flink_type("TIME(3)") == "int"
    assert isinstance(DataTypes.TIME(3), T.IntegerType)

    df = spark.createDataFrame(
        [(0,), (1,), (999,), (43_200_000,), (86_399_999,)], "ms int"
    )
    out = df.select(
        "ms",
        millis_to_time_string("ms").alias("s3"),
        millis_to_time_string("ms", precision=0).alias("s0"),
    ).withColumn("back", time_string_to_millis("s3"))
    rows = {r.ms: r for r in out.collect()}
    assert rows[0].s3 == "00:00:00.000" and rows[0].s0 == "00:00:00"
    assert rows[999].s3 == "00:00:00.999"
    assert rows[43_200_000].s3 == "12:00:00.000"
    assert rows[86_399_999].s3 == "23:59:59.999" and rows[86_399_999].s0 == "23:59:59"
    assert all(r.back == r.ms for r in rows.values())
    # seconds-precision literals reparse too ('HH:MM:SS' → whole-second ms)
    sec = spark.range(1).select(F.lit("07:08:09").alias("s"))
    assert sec.select(time_string_to_millis("s").alias("m")).first().m == 25_689_000
