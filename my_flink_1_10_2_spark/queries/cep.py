"""CEP / MATCH_RECOGNIZE queries (SURVEY §2.10, §7.2-6).

q_cep_v_shape uses a fixed-length 3-step pattern with SKIP TO NEXT ROW
so every match position is independently checkable — which makes the
query expressible as window lag/lead SQL for the DuckDB oracle. The
engine side still runs the full backtracking NFA
(operators/cep.py), so the oracle genuinely validates the NFA path.

q_cep_rally uses a `+` quantifier (variable-length match) — beyond
window-function SQL, so it gets the rows-only check (driver records the
weaker gate; the pytest harness adds a hand-computed fixture test in
tests/test_cep.py).
"""

from __future__ import annotations

from my_flink_1_10_2_spark.operators.cep import Pattern, match_recognize
from my_flink_1_10_2_spark.queries import read, register


def _v_pattern() -> Pattern:
    return (
        Pattern.begin("a", lambda row, ctx: True)
        .next("b", lambda row, ctx: row["value"] < ctx["a"][-1]["value"])
        .next("c", lambda row, ctx: row["value"] > ctx["b"][-1]["value"])
    )


@register(
    "q_cep_v_shape",
    oracle="""
    SELECT user_id, ts AS start_ts, value AS a_val, b_val, c_val
    FROM (
      SELECT user_id, ts, value,
             lead(value, 1) OVER w AS b_val,
             lead(value, 2) OVER w AS c_val
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    WHERE b_val < value AND c_val > b_val
    """,
    category="cep",
)
def q_cep_v_shape(spark, sf_dir):
    """MATCH_RECOGNIZE (A B C) with B.value < A.value, C.value > B.value,
    AFTER MATCH SKIP TO NEXT ROW (ref: StreamExecMatch.scala:69;
    navigation FlinkSqlOperatorTable.java:989-995)."""
    events = read(spark, sf_dir, "events")
    return match_recognize(
        events,
        partition_by=["user_id"],
        order_by=["ts", "event_id"],
        pattern=_v_pattern(),
        measures={
            "user_id": lambda m: m["a"][0]["user_id"],
            "start_ts": lambda m: m["a"][0]["ts"],
            "a_val": lambda m: float(m["a"][0]["value"]),
            "b_val": lambda m: float(m["b"][0]["value"]),
            "c_val": lambda m: float(m["c"][0]["value"]),
        },
        output_schema="user_id long, start_ts timestamp_ntz, a_val double, b_val double, c_val double",
        after_match="skip_to_next_row",
    )


@register(
    "q_cep_rally",
    oracle="""
    WITH m AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN lag(value) OVER w IS NULL
                    OR value <= lag(value) OVER w THEN 1 ELSE 0 END AS brk
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), runs AS (
      SELECT user_id, ts, value,
             sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS run_id
      FROM m
    )
    SELECT user_id, min(ts) AS start_ts,
           CAST(count(*) AS INTEGER) AS run_len,
           min(value) AS low, max(value) AS high
    FROM runs
    GROUP BY user_id, run_id
    HAVING count(*) >= 3
    """,
    category="cep",
)
def q_cep_rally(spark, sf_dir):
    """Variable-length pattern: maximal strictly-rising runs of length
    ≥ 3 per user. Exercises greedy `+` with backtracking and SKIP PAST
    LAST ROW (the reference's default after-match strategy). The oracle
    recomputes the same runs with gaps-and-islands SQL — an independent
    algorithm, so parity validates the NFA's greedy/skip semantics on
    variable-length matches."""
    events = read(spark, sf_dir, "events")
    pattern = (
        Pattern.begin("start", lambda row, ctx: True)
        .next(
            "rise",
            lambda row, ctx: row["value"]
            > (ctx["rise"][-1]["value"] if ctx["rise"] else ctx["start"][-1]["value"]),
            "+",
        )
    )
    return match_recognize(
        events,
        partition_by=["user_id"],
        order_by=["ts", "event_id"],
        pattern=pattern,
        measures={
            "user_id": lambda m: m["start"][0]["user_id"],
            "start_ts": lambda m: m["start"][0]["ts"],
            "run_len": lambda m: 1 + len(m["rise"]),
            "low": lambda m: float(m["start"][0]["value"]),
            "high": lambda m: float(m["rise"][-1]["value"]),
        },
        output_schema="user_id long, start_ts timestamp_ntz, run_len int, low double, high double",
        after_match="skip_past_last_row",
    ).where("run_len >= 3")


@register(
    "q_sql_match_recognize",
    oracle="""
    SELECT user_id, value AS a_val, b_val, c_val
    FROM (
      SELECT user_id, ts, value,
             lead(value, 1) OVER w AS b_val,
             lead(value, 2) OVER w AS c_val
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    WHERE b_val < value AND c_val > b_val
    """,
    category="cep",
)
def q_sql_match_recognize(spark, sf_dir):
    """The reference's MATCH_RECOGNIZE SQL surface verbatim
    (ref: MatchRecognizeITCase.scala), compiled by operators/cep_sql.py
    onto the NFA."""
    from my_flink_1_10_2_spark.queries import register_views
    from my_flink_1_10_2_spark.session import TableEnvironment

    register_views(spark, sf_dir, "events")
    te = TableEnvironment(spark)
    return te.sql(
        """
        SELECT * FROM events MATCH_RECOGNIZE (
          PARTITION BY user_id
          ORDER BY ts, event_id
          MEASURES A.value AS a_val, B.value AS b_val, C.value AS c_val
          AFTER MATCH SKIP TO NEXT ROW
          PATTERN (A B C)
          DEFINE B AS B.value < PREV(B.value),
                 C AS C.value > LAST(B.value)
        )
        """
    ).df


@register(
    "q_cep_funnel_within",
    oracle="""
    SELECT v.user_id, v.ts AS view_ts, min(p.ts) AS purchase_ts
    FROM events v JOIN events p
      ON p.user_id = v.user_id
     AND p.event_type = 'purchase'
     AND p.ts > v.ts
     AND p.ts <= v.ts + INTERVAL 1 HOUR
    WHERE v.event_type = 'view'
    GROUP BY v.user_id, v.ts
    """,
    category="cep",
)
def q_cep_funnel_within(spark, sf_dir):
    """Conversion funnel: view FOLLOWED BY purchase WITHIN 1 hour —
    relaxed contiguity + time-windowed match (ref: Pattern.followedBy,
    Pattern.within(Time), NFA.java:85 IGNORE transitions + window
    timeout). AFTER MATCH SKIP TO NEXT ROW, so every view that converts
    inside the hour produces exactly one match, and the relaxed scan
    binds the EARLIEST qualifying purchase — which makes the query
    SQL-expressible (min over the bounded time range) for the oracle.
    """
    events = read(spark, sf_dir, "events")
    pattern = (
        Pattern.begin("v", lambda row, ctx: row["event_type"] == "view")
        .followed_by("p", lambda row, ctx: row["event_type"] == "purchase")
        .within("1 hour")
    )
    return match_recognize(
        events,
        partition_by=["user_id"],
        order_by=["ts", "event_id"],
        pattern=pattern,
        measures={
            "user_id": lambda m: m["v"][0]["user_id"],
            "view_ts": lambda m: m["v"][0]["ts"],
            "purchase_ts": lambda m: m["p"][0]["ts"],
        },
        output_schema="user_id long, view_ts timestamp_ntz, purchase_ts timestamp_ntz",
        after_match="skip_to_next_row",
    )


@register(
    "q_sql_match_skip_to_first",
    oracle="""
    WITH m AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN lag(value) OVER w IS NULL
                    OR value <= lag(value) OVER w THEN 1 ELSE 0 END AS brk
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), runs AS (
      SELECT user_id, ts, event_id, value,
             sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS run_id
      FROM m
    ), rr AS (
      SELECT user_id, run_id, ts, value,
             row_number() OVER (PARTITION BY user_id, run_id
                                ORDER BY ts, event_id) AS pos,
             count(*)   OVER (PARTITION BY user_id, run_id) AS rl,
             max(value) OVER (PARTITION BY user_id, run_id) AS high
      FROM runs
    )
    SELECT user_id, ts AS start_ts, value AS low, high
    FROM rr WHERE pos < rl
    """,
    category="cep",
)
def q_sql_match_skip_to_first(spark, sf_dir):
    """AFTER MATCH SKIP TO FIRST var (ref: AfterMatchSkipStrategy.java,
    SQL spelling per MatchRecognizeITCase.scala): after a greedy rising
    run A B+, the scan resumes AT the first B row, so every suffix of a
    maximal run is its own match. The oracle enumerates exactly those
    suffixes with gaps-and-islands SQL — one output row per non-final
    position of each maximal rising run."""
    from my_flink_1_10_2_spark.queries import register_views
    from my_flink_1_10_2_spark.session import TableEnvironment

    register_views(spark, sf_dir, "events")
    te = TableEnvironment(spark)
    return te.sql(
        """
        SELECT * FROM events MATCH_RECOGNIZE (
          PARTITION BY user_id
          ORDER BY ts, event_id
          MEASURES A.ts AS start_ts, A.value AS low, B.value AS high
          AFTER MATCH SKIP TO FIRST B
          PATTERN (A B+)
          DEFINE B AS B.value > PREV(B.value)
        )
        """
    ).df


@register(
    "q_sql_match_within",
    oracle="""
    SELECT user_id, ts AS view_ts, next_ts AS purchase_ts
    FROM (
      SELECT user_id, ts, event_type,
             lead(ts) OVER w AS next_ts,
             lead(event_type) OVER w AS next_type
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    WHERE event_type = 'view' AND next_type = 'purchase'
      AND next_ts <= ts + INTERVAL 30 MINUTE
    """,
    category="cep",
)
def q_sql_match_within(spark, sf_dir):
    """PATTERN (...) WITHIN INTERVAL (ref: Pattern.within(Time) /
    NFA window timeout; SQL spelling per the reference's
    MATCH_RECOGNIZE surface): a view IMMEDIATELY followed by a purchase
    counts only when the pair spans ≤ 30 minutes. Strict contiguity
    makes the oracle a lead() check with the same time bound."""
    from my_flink_1_10_2_spark.queries import register_views
    from my_flink_1_10_2_spark.session import TableEnvironment

    register_views(spark, sf_dir, "events")
    te = TableEnvironment(spark)
    return te.sql(
        """
        SELECT * FROM events MATCH_RECOGNIZE (
          PARTITION BY user_id
          ORDER BY ts, event_id
          MEASURES V.ts AS view_ts, P.ts AS purchase_ts
          AFTER MATCH SKIP TO NEXT ROW
          PATTERN (V P) WITHIN INTERVAL '30' MINUTE
          DEFINE V AS V.event_type = 'view',
                 P AS P.event_type = 'purchase'
        )
        """
    ).df
