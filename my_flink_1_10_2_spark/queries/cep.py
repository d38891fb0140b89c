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


@register(
    "q_cep_times",
    oracle="""
    SELECT user_id, ts AS start_ts, l3 AS top_val
    FROM (
      SELECT user_id, ts, value,
             lead(value, 1) OVER w AS l1,
             lead(value, 2) OVER w AS l2,
             lead(value, 3) OVER w AS l3
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    WHERE l1 > value AND l2 > l1 AND l3 > l2
    """,
    category="cep",
)
def q_cep_times(spark, sf_dir):
    """times(3) — PATTERN (A R{3}): an anchor row followed by exactly
    three consecutive rises (ref: Pattern.times(int) / Quantifier.java
    TIMES; SQL `{n}` per MatchRecognizeITCase.scala). SKIP TO NEXT ROW
    makes every position independently checkable, so the oracle is a
    three-deep lead() chain — an independent algorithm validating the
    bounded-loop consumption in the NFA."""
    events = read(spark, sf_dir, "events")
    pattern = Pattern.begin("a", lambda row, ctx: True).next(
        "r",
        lambda row, ctx: row["value"]
        > (ctx["r"][-1]["value"] if ctx["r"] else ctx["a"][-1]["value"]),
        "{3}",
    )
    return match_recognize(
        events,
        partition_by=["user_id"],
        order_by=["ts", "event_id"],
        pattern=pattern,
        measures={
            "user_id": lambda m: m["a"][0]["user_id"],
            "start_ts": lambda m: m["a"][0]["ts"],
            "top_val": lambda m: float(m["r"][-1]["value"]),
        },
        output_schema="user_id long, start_ts timestamp_ntz, top_val double",
        after_match="skip_to_next_row",
    )


@register(
    "q_cep_times_or_more",
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
def q_cep_times_or_more(spark, sf_dir):
    """timesOrMore(2) — PATTERN (S R{2,}): maximal rising runs with at
    least two rises (ref: Pattern.timesOrMore / Quantifier.java; SQL
    `{n,}`). Greedy unbounded consumption with a lower bound; the
    gaps-and-islands oracle keeps runs of total length >= 3."""
    events = read(spark, sf_dir, "events")
    pattern = Pattern.begin("s", lambda row, ctx: True).next(
        "r",
        lambda row, ctx: row["value"]
        > (ctx["r"][-1]["value"] if ctx["r"] else ctx["s"][-1]["value"]),
        "{2,}",
    )
    return match_recognize(
        events,
        partition_by=["user_id"],
        order_by=["ts", "event_id"],
        pattern=pattern,
        measures={
            "user_id": lambda m: m["s"][0]["user_id"],
            "start_ts": lambda m: m["s"][0]["ts"],
            "run_len": lambda m: 1 + len(m["r"]),
            "low": lambda m: float(m["s"][0]["value"]),
            "high": lambda m: float(m["r"][-1]["value"]),
        },
        output_schema=(
            "user_id long, start_ts timestamp_ntz, run_len int, "
            "low double, high double"
        ),
        after_match="skip_past_last_row",
    )


@register(
    "q_cep_not_next",
    oracle="""
    SELECT user_id, ts AS signup_ts, nxt AS next_type
    FROM (
      SELECT user_id, ts, event_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS nxt
      FROM events
    )
    WHERE event_type = 'signup' AND nxt IS NOT NULL AND nxt <> 'error'
    """,
    category="cep",
)
def q_cep_not_next(spark, sf_dir):
    """notNext — signups whose immediately following event is not an
    error (ref: Pattern.notNext, a negative step that consumes
    nothing). The oracle is a lead() check on the adjacent row."""
    events = read(spark, sf_dir, "events")
    pattern = (
        Pattern.begin("a", lambda row, ctx: row["event_type"] == "signup")
        .not_next("z", lambda row, ctx: row["event_type"] == "error")
        .next("b", lambda row, ctx: True)
    )
    return match_recognize(
        events,
        partition_by=["user_id"],
        order_by=["ts", "event_id"],
        pattern=pattern,
        measures={
            "user_id": lambda m: m["a"][0]["user_id"],
            "signup_ts": lambda m: m["a"][0]["ts"],
            "next_type": lambda m: m["b"][0]["event_type"],
        },
        output_schema="user_id long, signup_ts timestamp_ntz, next_type string",
        after_match="skip_to_next_row",
    )


@register(
    "q_cep_not_followed_by",
    oracle="""
    WITH e AS (
      SELECT user_id, ts, event_id, event_type,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events
    ), nxt AS (
      SELECT user_id, ts, event_type, rn,
             min(CASE WHEN event_type = 'purchase' THEN rn END)
               OVER (PARTITION BY user_id ORDER BY rn
                     ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS np,
             min(CASE WHEN event_type = 'error' THEN rn END)
               OVER (PARTITION BY user_id ORDER BY rn
                     ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS ne
      FROM e
    )
    SELECT s.user_id, s.ts AS signup_ts, p.ts AS purchase_ts
    FROM nxt s JOIN e p ON p.user_id = s.user_id AND p.rn = s.np
    WHERE s.event_type = 'signup' AND (s.ne IS NULL OR s.np < s.ne)
    """,
    category="cep",
)
def q_cep_not_followed_by(spark, sf_dir):
    """notFollowedBy — signup reaching its next purchase with NO error
    in between (ref: Pattern.notFollowedBy; the NFA's STOP state). The
    banned predicate prunes every later candidate once an error enters
    the gap, so a match exists iff the next purchase precedes the next
    error; the oracle states exactly that with next-occurrence window
    minima — an independent formulation."""
    events = read(spark, sf_dir, "events")
    pattern = (
        Pattern.begin("a", lambda row, ctx: row["event_type"] == "signup")
        .not_followed_by("z", lambda row, ctx: row["event_type"] == "error")
        .followed_by("c", lambda row, ctx: row["event_type"] == "purchase")
    )
    return match_recognize(
        events,
        partition_by=["user_id"],
        order_by=["ts", "event_id"],
        pattern=pattern,
        measures={
            "user_id": lambda m: m["a"][0]["user_id"],
            "signup_ts": lambda m: m["a"][0]["ts"],
            "purchase_ts": lambda m: m["c"][0]["ts"],
        },
        output_schema="user_id long, signup_ts timestamp_ntz, purchase_ts timestamp_ntz",
        after_match="skip_to_next_row",
    )


@register(
    "q_cep_until",
    oracle="""
    WITH m AS (
      SELECT user_id, ts, event_id, value, event_type,
             CASE WHEN lag(value) OVER w IS NULL
                    OR value <= lag(value) OVER w
                    OR event_type = 'error' THEN 1 ELSE 0 END AS brk
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), runs AS (
      SELECT user_id, ts, value,
             sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS run_id
      FROM m
    )
    SELECT user_id, min(ts) AS start_ts,
           CAST(count(*) AS INTEGER) AS run_len, max(value) AS high
    FROM runs
    GROUP BY user_id, run_id
    HAVING count(*) >= 2
    """,
    category="cep",
)
def q_cep_until(spark, sf_dir):
    """until — rising runs whose loop stops at the first error row; the
    error row is NOT consumed and seeds the next match (ref:
    Pattern.until / Quantifier stop condition). The oracle breaks its
    islands on both run breaks and error rows — the identical cut
    points, derived independently."""
    events = read(spark, sf_dir, "events")
    pattern = (
        Pattern.begin("s", lambda row, ctx: True)
        .next(
            "r",
            lambda row, ctx: row["value"]
            > (ctx["r"][-1]["value"] if ctx["r"] else ctx["s"][-1]["value"]),
            "+",
        )
        .until(lambda row, ctx: row["event_type"] == "error")
    )
    return match_recognize(
        events,
        partition_by=["user_id"],
        order_by=["ts", "event_id"],
        pattern=pattern,
        measures={
            "user_id": lambda m: m["s"][0]["user_id"],
            "start_ts": lambda m: m["s"][0]["ts"],
            "run_len": lambda m: 1 + len(m["r"]),
            "high": lambda m: float(m["r"][-1]["value"]),
        },
        output_schema=(
            "user_id long, start_ts timestamp_ntz, run_len int, high double"
        ),
        after_match="skip_past_last_row",
    )


@register(
    "q_sql_match_times",
    oracle="""
    SELECT user_id, value AS a_val, l2 AS top_val
    FROM (
      SELECT user_id, ts, value,
             lead(value, 1) OVER w AS l1,
             lead(value, 2) OVER w AS l2
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    WHERE l1 > value AND l2 > l1
    """,
    category="cep",
)
def q_sql_match_times(spark, sf_dir):
    """SQL `{n}` quantifier — PATTERN (A R{2}) through MATCH_RECOGNIZE
    (ref: MatchRecognizeITCase.scala quantifier tests, Quantifier.java
    TIMES)."""
    from my_flink_1_10_2_spark.queries import register_views
    from my_flink_1_10_2_spark.session import TableEnvironment

    register_views(spark, sf_dir, "events")
    te = TableEnvironment(spark)
    return te.sql(
        """
        SELECT * FROM events MATCH_RECOGNIZE (
          PARTITION BY user_id
          ORDER BY ts, event_id
          MEASURES FIRST(A.value) AS a_val, LAST(R.value) AS top_val
          AFTER MATCH SKIP TO NEXT ROW
          PATTERN (A R{2})
          DEFINE R AS R.value > PREV(R.value)
        )
        """
    ).df


@register(
    "q_cep_followed_by_any",
    oracle="""
    SELECT s.user_id, s.event_id AS signup_id, p.event_id AS purchase_id,
           p.value AS purchase_value
    FROM events s JOIN events p
      ON p.user_id = s.user_id
     AND p.event_type = 'purchase'
     AND (p.ts > s.ts OR (p.ts = s.ts AND p.event_id > s.event_id))
     AND p.ts <= s.ts + INTERVAL 30 MINUTE
    WHERE s.event_type = 'signup'
    ORDER BY s.user_id, signup_id, purchase_id
    """,
    category="cep",
)
def q_cep_followed_by_any(spark, sf_dir):
    """followedByAny (ref: Pattern.followedByAny — non-deterministic
    relaxed contiguity, the NFA's IGNORE-after-TAKE edge): every
    purchase within 30 minutes of a signup yields its OWN match, so the
    full (signup, purchase) fan is emitted — unlike followedBy, which
    binds only the earliest.  SQL-expressible as the time-bounded join
    of all qualifying pairs, which is exactly what makes the semantics
    oracle-checkable."""
    events = read(spark, sf_dir, "events")
    pattern = (
        Pattern.begin("s", lambda row, ctx: row["event_type"] == "signup")
        .followed_by_any("p", lambda row, ctx: row["event_type"] == "purchase")
        .within("30 minutes")
    )
    return match_recognize(
        events,
        partition_by=["user_id"],
        order_by=["ts", "event_id"],
        pattern=pattern,
        measures={
            "user_id": lambda m: m["s"][0]["user_id"],
            "signup_id": lambda m: m["s"][0]["event_id"],
            "purchase_id": lambda m: m["p"][0]["event_id"],
            "purchase_value": lambda m: m["p"][0]["value"],
        },
        output_schema=(
            "user_id long, signup_id long, purchase_id long,"
            " purchase_value double"
        ),
        after_match="skip_to_next_row",
    ).orderBy("user_id", "signup_id", "purchase_id")


@register(
    "q_cep_allow_combinations",
    oracle="""
    SELECT s.user_id, s.event_id AS signup_id,
           p1.event_id AS p1_id, p2.event_id AS p2_id
    FROM events s
    JOIN events p1 ON p1.user_id = s.user_id AND p1.event_type = 'purchase'
     AND (p1.ts > s.ts OR (p1.ts = s.ts AND p1.event_id > s.event_id))
     AND p1.ts <= s.ts + INTERVAL 6 HOUR
    JOIN events p2 ON p2.user_id = s.user_id AND p2.event_type = 'purchase'
     AND (p2.ts > p1.ts OR (p2.ts = p1.ts AND p2.event_id > p1.event_id))
     AND p2.ts <= s.ts + INTERVAL 6 HOUR
    WHERE s.event_type = 'signup'
    ORDER BY s.user_id, signup_id, p1_id, p2_id
    """,
    category="cep",
)
def q_cep_allow_combinations(spark, sf_dir):
    """allowCombinations (ref: Pattern.allowCombinations /
    Quantifier.ConsumingStrategy SKIP_TILL_ANY): signup followed by
    purchase{2} where the two purchases may be ANY increasing pair
    within the 6-hour window — every subset forks its own match.
    The oracle enumerates the same pairs as a time-bounded triple
    self-join."""
    events = read(spark, sf_dir, "events")
    pattern = (
        Pattern.begin("s", lambda row, ctx: row["event_type"] == "signup")
        .followed_by("p", lambda row, ctx: row["event_type"] == "purchase")
        .times(2)
        .allow_combinations()
        .within("6 hours")
    )
    return match_recognize(
        events,
        partition_by=["user_id"],
        order_by=["ts", "event_id"],
        pattern=pattern,
        measures={
            "user_id": lambda m: m["s"][0]["user_id"],
            "signup_id": lambda m: m["s"][0]["event_id"],
            "p1_id": lambda m: m["p"][0]["event_id"],
            "p2_id": lambda m: m["p"][1]["event_id"],
        },
        output_schema="user_id long, signup_id long, p1_id long, p2_id long",
        after_match="skip_to_next_row",
    ).orderBy("user_id", "signup_id", "p1_id", "p2_id")
