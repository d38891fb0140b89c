"""Flink-SQL dialect rewriter tests: textual mappings + end-to-end
execution through TableEnvironment.sql (ref SQL surface:
FlinkSqlOperatorTable.java:777-824; IT model WindowAggregateITCase)."""

from __future__ import annotations

from my_flink_1_10_2_spark.sql import rewrite_flink_sql
from tests.conftest import SF_DIR


def test_passthrough_untouched():
    q = "SELECT a, count(*) FROM t WHERE b > 3 GROUP BY a"
    assert rewrite_flink_sql(q) == q


def test_tumble_rewrite():
    q = rewrite_flink_sql(
        "SELECT TUMBLE_START(ts, INTERVAL '1' HOUR) AS ws, count(*) c "
        "FROM events GROUP BY TUMBLE(ts, INTERVAL '1' HOUR)"
    )
    assert "window(ts, '1 hours')" in q
    assert "window.start AS ws" in q
    assert "TUMBLE" not in q.upper().replace("WINDOW", "")


def test_hop_swaps_slide_and_size():
    q = rewrite_flink_sql(
        "SELECT count(*) FROM events "
        "GROUP BY HOP(ts, INTERVAL '30' MINUTE, INTERVAL '1' HOUR)"
    )
    assert "window(ts, '1 hours', '30 minutes')" in q


def test_session_rewrite():
    q = rewrite_flink_sql(
        "SELECT SESSION_END(ts, INTERVAL '30' MINUTE) AS se, count(*) "
        "FROM events GROUP BY user_id, SESSION(ts, INTERVAL '30' MINUTE)"
    )
    assert "session_window(ts, '30 minutes')" in q
    assert "session_window.end AS se" in q


def test_rowtime_maps_to_window_end():
    q = rewrite_flink_sql("SELECT TUMBLE_ROWTIME(ts, INTERVAL '5' MINUTE) FROM e GROUP BY TUMBLE(ts, INTERVAL '5' MINUTE)")
    assert "window.end" in q


def test_proctime():
    assert rewrite_flink_sql("SELECT PROCTIME() FROM t") == "SELECT current_timestamp() FROM t"


def test_tumble_sql_executes_and_matches_dataframe_path(spark):
    """The rewritten SQL must produce exactly the DataFrame tumble()
    results."""
    from pyspark.sql import functions as F

    from my_flink_1_10_2_spark.operators.windows import tumble
    from my_flink_1_10_2_spark.queries import read
    from my_flink_1_10_2_spark.session import TableEnvironment

    te = TableEnvironment(spark)
    events = read(spark, SF_DIR, "events")
    events.createOrReplaceTempView("events")

    got = te.sql(
        "SELECT TUMBLE_START(ts, INTERVAL '1' HOUR) AS window_start, "
        "       count(*) AS cnt, sum(value) AS sum_value "
        "FROM events GROUP BY TUMBLE(ts, INTERVAL '1' HOUR)"
    ).df

    want = (
        tumble(events, "ts", "1 hour")
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("value").alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "cnt", "sum_value")
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_temporal_table_function_join(spark):
    """Table.createTemporalTableFunction + temporal join (ref:
    Table.java:139, TemporalRowTimeJoinOperator.java:71): each probe row
    sees the latest build-side version at its own rowtime; keys with no
    prior version stay NULL (left-outer as-of semantics)."""
    import datetime as dt

    from my_flink_1_10_2_spark import TableEnvironment

    env = TableEnvironment(spark)
    T = dt.datetime
    rates = env.from_elements(
        [("EUR", T(2024, 1, 1), 1.0), ("EUR", T(2024, 1, 3), 1.2), ("USD", T(2024, 1, 1), 0.9)],
        "ccy string, rate_ts timestamp_ntz, rate double",
    )
    orders = env.from_elements(
        [(1, "EUR", T(2024, 1, 2)), (2, "EUR", T(2024, 1, 4)), (3, "USD", T(2024, 1, 2)), (4, "GBP", T(2024, 1, 2))],
        "oid long, ccy string, o_ts timestamp_ntz",
    )
    ttf = rates.create_temporal_table_function("rate_ts", "ccy")
    out = orders.temporal_join(ttf, probe_time="o_ts", probe_key="ccy")
    got = {r.oid: r.rate for r in out.df.collect()}
    assert got == {1: 1.0, 2: 1.2, 3: 0.9, 4: None}


def test_for_system_time_as_of_sql(spark):
    """SQL temporal join (ref: StreamExecTemporalJoin.scala:51 SQL
    surface): FOR SYSTEM_TIME AS OF against a versioned view compiles
    onto the single-shuffle as-of join."""
    import datetime as dt

    from my_flink_1_10_2_spark import TableEnvironment

    env = TableEnvironment(spark)
    T = dt.datetime
    rates = env.from_elements(
        [("EUR", T(2024, 1, 1), 1.0), ("EUR", T(2024, 1, 3), 1.2), ("USD", T(2024, 1, 1), 0.9)],
        "ccy string, rate_ts timestamp_ntz, rate double",
    )
    orders = env.from_elements(
        [(1, "EUR", T(2024, 1, 2)), (2, "EUR", T(2024, 1, 4)), (3, "USD", T(2024, 1, 2))],
        "oid long, ccy string, o_ts timestamp_ntz",
    )
    env.create_temporary_view("orders_t", orders)
    env.create_versioned_view("rates_t", rates, time_attr="rate_ts", primary_key="ccy")
    out = env.sql(
        """
        SELECT o.oid, o.ccy, r.rate
        FROM orders_t o
        JOIN rates_t FOR SYSTEM_TIME AS OF o.o_ts AS r
        ON r.ccy = o.ccy
        WHERE o.oid < 10
        """
    )
    got = {r.oid: r.rate for r in out.df.collect()}
    assert got == {1: 1.0, 2: 1.2, 3: 0.9}


def test_for_system_time_requires_versioned_view(spark):
    import pytest as _pytest

    from my_flink_1_10_2_spark import TableEnvironment

    env = TableEnvironment(spark)
    env.create_temporary_view("plain_t", env.from_elements([(1,)], "x long"))
    env.create_temporary_view("probe_t", env.from_elements([(1,)], "x long"))
    with _pytest.raises(ValueError, match="versioned view"):
        env.sql(
            "SELECT p.x FROM probe_t p JOIN plain_t FOR SYSTEM_TIME AS OF p.x AS b ON b.x = p.x"
        )


def test_lateral_table_rewrites_to_lateral_view():
    from my_flink_1_10_2_spark.sql import rewrite_flink_sql

    q = rewrite_flink_sql(
        "SELECT a, w FROM t CROSS JOIN LATERAL TABLE(explode(split(s, ' '))) AS T(w)"
    )
    assert "LATERAL VIEW explode(split(s, ' ')) T AS w" in q
    q2 = rewrite_flink_sql(
        "SELECT a, k, v FROM t, LATERAL TABLE(json_tuple(js, 'k', 'v')) AS J(k, v)"
    )
    assert "LATERAL VIEW json_tuple(js, 'k', 'v') J AS k, v" in q2
    # non-Flink SQL passes through untouched
    assert rewrite_flink_sql("SELECT 1") == "SELECT 1"


def test_rewriter_passthrough_property():
    """Property (hypothesis): SQL text without Flink-only constructs
    passes through rewrite_flink_sql byte-identical — the rewriter must
    never corrupt ordinary queries."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from my_flink_1_10_2_spark.sql import rewrite_flink_sql

    ident = st.text(
        alphabet="abcdefghijklmnopqrstuvwxyz_", min_size=1, max_size=12
    )
    frag = st.one_of(
        ident,
        st.sampled_from(
            [
                "SELECT", "FROM", "WHERE", "GROUP BY", "ORDER BY", "JOIN",
                "ON", "AND", "OR", "sum(x)", "count(*)", "over (partition by k)",
                "window(ts, '1 hour')", "'a string literal'", "1.5", "(", ")", ",",
            ]
        ),
    )

    @settings(max_examples=300, deadline=None)
    @given(st.lists(frag, max_size=20))
    def check(parts):
        q = " ".join(parts)
        # exclude spellings the rewriter is SUPPOSED to transform
        for kw in ("TUMBLE", "HOP", "SESSION", "PROCTIME", "LATERAL TABLE", "MATCH_RECOGNIZE"):
            if kw in q.upper():
                return
        assert rewrite_flink_sql(q) == q

    check()
