"""CEP NFA unit + harness tests (ref test model:
flink-libraries/flink-cep/src/test/java/org/apache/flink/cep/nfa/NFATest.java
and MatchRecognizeITCase.scala — scripted inputs, exact expected
matches)."""

from __future__ import annotations

import datetime as dt

import pytest

from my_flink_1_10_2_spark.operators.cep import Pattern, match_recognize


def _events(spark, values, user=1):
    base = dt.datetime(2024, 1, 1)
    rows = [
        (user, i, base + dt.timedelta(seconds=i), float(v)) for i, v in enumerate(values)
    ]
    return spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp_ntz, value double"
    )


V = (
    Pattern.begin("a", lambda r, c: True)
    .next("b", lambda r, c: r["value"] < c["a"][-1]["value"])
    .next("c", lambda r, c: r["value"] > c["b"][-1]["value"])
)


def _run(df, pattern, after="skip_past_last_row", extra_measures=None):
    measures = {
        "start_id": lambda m: int(m[pattern.steps[0].name][0]["event_id"]),
    }
    measures.update(extra_measures or {})
    schema = "start_id long" + "".join(f", {k} double" for k in (extra_measures or {}))
    out = match_recognize(
        df,
        partition_by=["user_id"],
        order_by=["ts", "event_id"],
        pattern=pattern,
        measures=measures,
        output_schema=schema,
        after_match=after,
    )
    return sorted(r.start_id for r in out.collect())


def test_v_shape_skip_to_next_row_finds_overlaps(spark):
    # values: 5 3 4 2 6 → V at idx0 (5,3,4) and idx2 (4,2,6)
    df = _events(spark, [5, 3, 4, 2, 6])
    assert _run(df, V, after="skip_to_next_row") == [0, 2]


def test_v_shape_skip_past_last_row_consumes(spark):
    df = _events(spark, [5, 3, 4, 2, 6])
    # after matching rows 0-2, scanning resumes at row 3 → no second match
    assert _run(df, V, after="skip_past_last_row") == [0]


def test_plus_quantifier_greedy_with_backtracking(spark):
    # rising run 1 2 3 4 then drop: start=idx0, rise consumes 1..3 greedily
    rally = Pattern.begin("s", lambda r, c: True).next(
        "rise",
        lambda r, c: r["value"]
        > (c["rise"][-1]["value"] if c["rise"] else c["s"][-1]["value"]),
        "+",
    )
    df = _events(spark, [1, 2, 3, 4, 2, 3])
    out = match_recognize(
        df,
        partition_by=["user_id"],
        order_by=["ts", "event_id"],
        pattern=rally,
        measures={
            "start_id": lambda m: int(m["s"][0]["event_id"]),
            "run_len": lambda m: 1 + len(m["rise"]),
        },
        output_schema="start_id long, run_len int",
        after_match="skip_past_last_row",
    )
    got = sorted((r.start_id, r.run_len) for r in out.collect())
    assert got == [(0, 4), (4, 2)]


def test_optional_quantifier(spark):
    # a (b?) c : b = value<prev, c = value>5
    pat = (
        Pattern.begin("a", lambda r, c: True)
        .next("b", lambda r, c: r["value"] < c["a"][-1]["value"], "?")
        .next("c", lambda r, c: r["value"] > 5)
    )
    df = _events(spark, [4, 9])  # no b needed: a=idx0, c=idx1
    assert _run(df, pat) == [0]


def test_no_match_empty_result(spark):
    df = _events(spark, [3, 3, 3])
    assert _run(df, V) == []


def test_multiple_keys_parallel(spark):
    df = _events(spark, [5, 3, 6]).union(_events(spark, [9, 1, 2], user=2))
    assert _run(df, V, after="skip_to_next_row") == [0, 0]


def test_invalid_quantifier_rejected():
    with pytest.raises(ValueError):
        Pattern.begin("a", lambda r, c: True, "{3,2}")  # upper < lower
    with pytest.raises(ValueError):
        Pattern.begin("a", lambda r, c: True, "{x}")
    with pytest.raises(ValueError):
        Pattern.begin("a", lambda r, c: True, "++")


def test_sql_match_recognize_plus_quantifier(spark):
    """SQL surface with a + quantifier and literal comparison."""
    from my_flink_1_10_2_spark.session import TableEnvironment

    df = _events(spark, [1, 2, 3, 4, 2, 3, 9])
    df.createOrReplaceTempView("seq_events")
    te = TableEnvironment(spark)
    out = te.sql(
        """
        SELECT * FROM seq_events MATCH_RECOGNIZE (
          PARTITION BY user_id
          ORDER BY ts
          MEASURES FIRST(R.value) AS first_rise, LAST(R.value) AS top
          PATTERN (S R+)
          DEFINE R AS R.value > PREV(R.value)
        )
        """
    ).df
    rows = sorted((r.first_rise, r.top) for r in out.collect())
    # runs: 1→(2,3,4) and 2→(3,9)
    assert rows == [(2.0, 4.0), (3.0, 9.0)]


def test_sql_match_recognize_rejects_unsupported(spark):
    from my_flink_1_10_2_spark.operators.cep_sql import compile_match_recognize

    with pytest.raises(ValueError):
        compile_match_recognize(spark, "SELECT 1")


def test_followed_by_skips_noise(spark):
    """Relaxed contiguity (ref: Pattern.followedBy): noise rows between
    the steps are ignored; strict `next` finds nothing."""
    # values: 10, noise, noise, 20 — pattern: 10 then 20
    df = _events(spark, [10, 1, 2, 20])
    relaxed = Pattern.begin("a", lambda r, c: r["value"] == 10.0).followed_by(
        "b", lambda r, c: r["value"] == 20.0
    )
    strict = Pattern.begin("a", lambda r, c: r["value"] == 10.0).next(
        "b", lambda r, c: r["value"] == 20.0
    )
    assert _run(df, relaxed) == [0]
    assert _run(df, strict) == []


def test_followed_by_binds_earliest(spark):
    """The relaxed scan takes the FIRST qualifying row (reference
    followedBy: IGNORE loop stops at the first take)."""
    df = _events(spark, [10, 20, 20])
    relaxed = Pattern.begin("a", lambda r, c: r["value"] == 10.0).followed_by(
        "b", lambda r, c: r["value"] == 20.0
    )
    out = _run(df, relaxed, extra_measures={"b_id": lambda m: float(m["b"][0]["event_id"])})
    assert out == [0]


def test_within_rejects_slow_matches(spark):
    """within() bounds first→last event time (ref: Pattern.within(Time)).
    Rows are 1s apart; a 2s window allows idx gap ≤2."""
    df = _events(spark, [10, 1, 1, 1, 20])  # match span = 4s
    base = Pattern.begin("a", lambda r, c: r["value"] == 10.0).followed_by(
        "b", lambda r, c: r["value"] == 20.0
    )
    assert _run(df, base) == [0]
    assert _run(df, base.within("2 seconds")) == []
    assert _run(df, base.within("4 seconds")) == [0]


def test_within_backtracks_to_shorter_match(spark):
    """If the greedy `+` overshoots the window, backtracking must find
    the shorter in-window alternative, not drop the match."""
    df = _events(spark, [1, 2, 3, 4, 5, 6])
    rising = Pattern.begin("a", lambda r, c: True).next(
        "b", lambda r, c: not c["b"] or r["value"] > c["b"][-1]["value"], "+"
    )
    n_rows = {"n": lambda m: float(len(m["b"]))}
    full = _run(df, rising, extra_measures=n_rows)
    capped = _run(df, rising.within("3 seconds"), extra_measures=n_rows)
    assert full == [0]   # greedy: one match consuming everything
    assert capped == [0, 4]  # 3s window: (a=0, b=1..3), then (a=4, b=5)


def test_skip_past_last_row_with_relaxed_gaps(spark):
    """AFTER MATCH SKIP PAST LAST ROW must resume after the last matched
    row's INDEX — with followedBy the match has gaps, and consumed rows
    must not seed later matches (ref: AfterMatchSkipStrategy.java).
    A(v>=1) followedBy B(v>=10) over [1, 1, 10, 10] is exactly one match
    (a=row0, b=row2); row1/row2 were rescanned by the old count-based
    skip and produced a bogus second match."""
    df = _events(spark, [1, 1, 10, 10])
    pat = Pattern.begin("a", lambda r, c: r["value"] >= 1.0).followed_by(
        "b", lambda r, c: r["value"] >= 10.0
    )
    assert _run(df, pat, after="skip_past_last_row") == [0]
    # SKIP TO NEXT ROW still finds the overlapping alternatives
    assert _run(df, pat, after="skip_to_next_row") == [0, 1, 2]


def test_skip_to_last_var(spark):
    """SKIP TO LAST B resumes AT the last B row: over a single rising
    run the resumed attempt fails (run was maximal), so matches equal
    SKIP PAST LAST ROW — but over back-to-back runs sharing a boundary
    row the boundary is re-used as the next match's A."""
    df = _events(spark, [1, 2, 3, 1, 2])
    rising = Pattern.begin("a", lambda r, c: True).next(
        "b",
        lambda r, c: r["value"] > (c["b"][-1]["value"] if c["b"] else c["a"][-1]["value"]),
        "+",
    )
    out = _run(df, rising, after=("skip_to_last", "b"))
    assert out == [0, 3]


def test_skip_to_first_var(spark):
    """SKIP TO FIRST B resumes at the FIRST B row: every suffix of a
    maximal rising run matches."""
    df = _events(spark, [1, 2, 3, 4])
    rising = Pattern.begin("a", lambda r, c: True).next(
        "b",
        lambda r, c: r["value"] > (c["b"][-1]["value"] if c["b"] else c["a"][-1]["value"]),
        "+",
    )
    assert _run(df, rising, after=("skip_to_first", "b")) == [0, 1, 2]


def test_skip_to_first_of_leading_var_raises(spark):
    """SKIP TO FIRST A where A starts the match can never advance — the
    reference rejects this degenerate spec; so do we."""
    import pytest as _pytest

    df = _events(spark, [1, 2])
    pat = Pattern.begin("a", lambda r, c: True).next("b", lambda r, c: True)
    with _pytest.raises(Exception):
        _run(df, pat, after=("skip_to_first", "a"))


def test_cep_facade_matches_match_recognize(spark):
    """ref: CEP.java:38 + PatternStream.select:128 — the fluent facade
    must produce exactly what match_recognize produces."""
    from my_flink_1_10_2_spark.operators.cep import CEP, Pattern, match_recognize

    rows = [
        ("a", 1, 5.0), ("a", 2, 3.0), ("a", 3, 7.0),
        ("b", 1, 9.0), ("b", 2, 2.0), ("b", 3, 1.0),
    ]
    df = spark.createDataFrame(rows, "k string, seq long, v double")
    # down-then-up V shape
    pat = (
        Pattern.begin("down", lambda r, c: c["down"] == [] or r["v"] < c["down"][-1]["v"])
        .followed_by("up", lambda r, c: r["v"] > c["down"][-1]["v"])
    )
    measures = {
        "k": lambda g: g["down"][0]["k"],
        "bottom": lambda g: min(r["v"] for r in g["down"]),
        "rebound": lambda g: g["up"][-1]["v"],
    }
    schema = "k string, bottom double, rebound double"
    via_facade = CEP.pattern(df, pat, key_by="k", order_by="seq").select(measures, schema)
    direct = match_recognize(df, ["k"], ["seq"], pat, measures, schema)
    assert sorted(map(tuple, via_facade.collect())) == sorted(map(tuple, direct.collect()))
    assert len(via_facade.collect()) > 0


def test_cep_facade_global_pattern(spark):
    from my_flink_1_10_2_spark.operators.cep import CEP, Pattern

    df = spark.createDataFrame([(1, 1.0), (2, 5.0), (3, 2.0)], "seq long, v double")
    pat = Pattern.begin("spike", lambda r, c: r["v"] >= 5.0)
    out = CEP.pattern(df, pat, order_by="seq").select(
        {"v": lambda g: g["spike"][0]["v"]}, "v double"
    )
    assert [r.v for r in out.collect()] == [5.0]

    import pytest

    with pytest.raises(ValueError, match="order_by"):
        CEP.pattern(df, pat)


# -- timeout side output (ref: PatternStream.select(OutputTag, ...)) --------


def _typed_events(spark, seq, user=1):
    """seq: list of (second_offset, event_type)."""
    base = dt.datetime(2024, 1, 1)
    rows = [
        (user, i, base + dt.timedelta(seconds=s), t)
        for i, (s, t) in enumerate(seq)
    ]
    return spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp_ntz, event_type string"
    )


def _funnel(within="10 seconds"):
    return (
        Pattern.begin("a", lambda r, c: r["event_type"] == "click")
        .followed_by("b", lambda r, c: r["event_type"] == "purchase")
        .within(within)
    )


def _run_timeouts(df, pattern, after="skip_to_next_row"):
    from my_flink_1_10_2_spark.operators.cep import match_recognize_with_timeouts

    out = match_recognize_with_timeouts(
        df,
        partition_by=["user_id"],
        order_by=["ts", "event_id"],
        pattern=pattern,
        measures={"start_id": lambda m: int(m["a"][0]["event_id"])},
        timeout_measures={"start_id": lambda m: int(m["a"][0]["event_id"])},
        output_schema="side string, start_id long",
        after_match=after,
    )
    return sorted((r.side, r.start_id) for r in out.collect())


def test_timeout_relaxed_waiting_run_times_out(spark):
    """click at t=0 completes (purchase t=5 in window); click at t=20
    never sees a purchase → timed out at drain; click at t=30 has a
    purchase but OUTSIDE the window → timed out too."""
    df = _typed_events(
        spark,
        [(0, "click"), (2, "view"), (5, "purchase"),
         (20, "click"), (22, "view"),
         (30, "click"), (45, "purchase")],
    )
    assert _run_timeouts(df, _funnel()) == [
        ("match", 0),
        ("timeout", 3),
        ("timeout", 5),
    ]


def test_timeout_strict_next_death_emits_nothing(spark):
    """With strict contiguity, a click whose IMMEDIATE successor (inside
    the window) is not a purchase dies — no timeout row; a click that is
    the last row is still waiting → timeout."""
    p = (
        Pattern.begin("a", lambda r, c: r["event_type"] == "click")
        .next("b", lambda r, c: r["event_type"] == "purchase")
        .within("10 seconds")
    )
    df = _typed_events(
        spark, [(0, "click"), (2, "view"), (5, "click")]
    )
    # click@0 died (view follows in-window); click@5 waits at end → timeout
    assert _run_timeouts(df, p) == [("timeout", 2)]


def test_timeout_three_step_partial_binding(spark):
    """A run that matched a AND b but never saw c emits the 2-step
    partial; the timeout measure can read both bound steps."""
    from my_flink_1_10_2_spark.operators.cep import match_recognize_with_timeouts

    p = (
        Pattern.begin("a", lambda r, c: r["event_type"] == "click")
        .followed_by("b", lambda r, c: r["event_type"] == "signup")
        .followed_by("c", lambda r, c: r["event_type"] == "purchase")
        .within("10 seconds")
    )
    df = _typed_events(spark, [(0, "click"), (3, "signup"), (40, "view")])
    out = match_recognize_with_timeouts(
        df,
        partition_by=["user_id"],
        order_by=["ts", "event_id"],
        pattern=p,
        measures={
            "start_id": lambda m: int(m["a"][0]["event_id"]),
            "n_bound": lambda m: sum(len(v) for v in m.values()),
        },
        timeout_measures={
            "start_id": lambda m: int(m["a"][0]["event_id"]),
            "n_bound": lambda m: sum(len(v) for v in m.values()),
        },
        output_schema="side string, start_id long, n_bound long",
    ).collect()
    assert [(r.side, r.start_id, r.n_bound) for r in out] == [("timeout", 0, 2)]


def test_timeout_requires_within(spark):
    df = _typed_events(spark, [(0, "click")])
    p = Pattern.begin("a", lambda r, c: r["event_type"] == "click").followed_by(
        "b", lambda r, c: r["event_type"] == "purchase"
    )
    with pytest.raises(ValueError, match="within"):
        _run_timeouts(df, p)
