"""CEP pattern-algebra unit tests: times(n), timesOrMore, {n,m} ranges,
greedy vs reluctant, notNext / notFollowedBy, until — the quantifier
surface of the reference's Pattern.java/Quantifier.java, run directly on
the NFA (same code path match_recognize drives per key group)."""

from __future__ import annotations

import pandas as pd
import pytest

from my_flink_1_10_2_spark.operators.cep import Pattern, _run_nfa


def _pdf(values, types=None):
    return pd.DataFrame(
        {
            "i": range(len(values)),
            "value": [float(v) for v in values],
            "event_type": types if types is not None else ["x"] * len(values),
        }
    )


def _lens(out, col="n"):
    return list(out[col]) if len(out) else []


ANY = lambda r, c: True  # noqa: E731


def _measure_counts(*names):
    return {n: (lambda nn: lambda m: len(m[nn]))(n) for n in names}


def test_times_exact():
    """A{3} over six all-matching rows with SKIP PAST LAST ROW: two
    non-overlapping triples."""
    p = Pattern.begin("a", ANY, "{3}")
    out = _run_nfa(_pdf([1] * 6), p.steps, _measure_counts("a"), "skip_past_last_row")
    assert _lens(out, "a") == [3, 3]
    # seven rows: the trailing singleton can't complete a triple
    out = _run_nfa(_pdf([1] * 7), p.steps, _measure_counts("a"), "skip_past_last_row")
    assert _lens(out, "a") == [3, 3]


def test_times_range_greedy_and_reluctant():
    p_greedy = Pattern.begin("a", ANY, "{2,3}")
    out = _run_nfa(
        _pdf([1] * 5), p_greedy.steps, _measure_counts("a"), "skip_past_last_row"
    )
    assert _lens(out, "a") == [3, 2]
    p_rel = Pattern.begin("a", ANY, "{2,3}?")
    out = _run_nfa(
        _pdf([1] * 5), p_rel.steps, _measure_counts("a"), "skip_past_last_row"
    )
    assert _lens(out, "a") == [2, 2]


def test_times_or_more():
    """A{2,} greedy consumes everything it can."""
    p = Pattern.begin("a", lambda r, c: r["value"] > 0, "{2,}")
    out = _run_nfa(
        _pdf([1, 1, 1, 0, 1]), p.steps, _measure_counts("a"), "skip_past_last_row"
    )
    assert _lens(out, "a") == [3]  # trailing lone 1 can't reach min 2
    out = _run_nfa(
        _pdf([1, 1, 0, 1, 1]), p.steps, _measure_counts("a"), "skip_past_last_row"
    )
    assert _lens(out, "a") == [2, 2]


def test_fluent_times_modifiers():
    p = Pattern.begin("a", ANY).times(2)
    assert p.steps[-1].min_count == 2 and p.steps[-1].max_count == 2
    p = Pattern.begin("a", ANY).times(2, 4)
    assert p.steps[-1].min_count == 2 and p.steps[-1].max_count == 4
    p = Pattern.begin("a", ANY).times_or_more(3)
    assert p.steps[-1].min_count == 3 and p.steps[-1].max_count == float("inf")
    p = Pattern.begin("a", ANY).times(2, 4).reluctant()
    assert not p.steps[-1].greedy
    p = Pattern.begin("a", ANY, "+").optional()
    assert p.steps[-1].min_count == 0 and p.steps[-1].max_count == float("inf")


def test_not_next():
    """a . notNext(zero) . b — pairs whose second row is nonzero."""
    p = (
        Pattern.begin("a", ANY)
        .not_next("z", lambda r, c: r["value"] == 0)
        .next("b", ANY)
    )
    meas = {"ai": lambda m: int(m["a"][0]["i"]), "bi": lambda m: int(m["b"][0]["i"])}
    out = _run_nfa(_pdf([5, 0, 7, 8]), p.steps, meas, "skip_to_next_row")
    # (0,1) blocked by zero at idx1; (1,2) ok (7!=0); (2,3) ok
    assert list(zip(out["ai"], out["bi"])) == [(1, 2), (2, 3)]


def test_not_followed_by_blocks_until_next_positive():
    """a(=1) . notFollowedBy(zero) . followedBy c(=2): match only when
    the first 2 after the 1 comes before any 0."""
    p = (
        Pattern.begin("a", lambda r, c: r["value"] == 1)
        .not_followed_by("z", lambda r, c: r["value"] == 0)
        .followed_by("c", lambda r, c: r["value"] == 2)
    )
    meas = {"ai": lambda m: int(m["a"][0]["i"]), "ci": lambda m: int(m["c"][0]["i"])}
    # 1 . 3 . 0 . 2 : zero intervenes -> no match from idx0
    out = _run_nfa(_pdf([1, 3, 0, 2]), p.steps, meas, "skip_to_next_row")
    assert len(out) == 0
    # 1 . 3 . 2 . 0 : first 2 precedes the 0 -> match
    out = _run_nfa(_pdf([1, 3, 2, 0]), p.steps, meas, "skip_to_next_row")
    assert list(zip(out["ai"], out["ci"])) == [(0, 2)]


def test_trailing_not_followed_by_requires_within():
    p = Pattern.begin("a", lambda r, c: r["value"] == 1).not_followed_by(
        "z", lambda r, c: r["value"] == 0
    )
    with pytest.raises(ValueError, match="within"):
        _run_nfa(_pdf([1, 2]), p.steps, {"ai": lambda m: 0}, "skip_to_next_row")


def test_trailing_not_followed_by_with_within():
    """a(=1) notFollowedBy(zero) within 2s: match iff no 0 in the 2s
    window after the 1."""
    pdf = pd.DataFrame(
        {
            "i": range(4),
            "ts": pd.to_datetime([0, 1, 3, 10], unit="s"),
            "value": [1.0, 0.0, 1.0, 5.0],
        }
    )
    p = (
        Pattern.begin("a", lambda r, c: r["value"] == 1)
        .not_followed_by("z", lambda r, c: r["value"] == 0)
        .within("2 seconds")
    )
    meas = {"ai": lambda m: int(m["a"][0]["i"])}
    out = _run_nfa(
        pdf, p.steps, meas, "skip_to_next_row", ts_col="ts", within=p.within_td
    )
    # idx0 (t=0): zero at t=1 inside window -> blocked. idx2 (t=3): no
    # zero in (3, 5] -> match.
    assert list(out["ai"]) == [2]


def test_until_stops_loop_without_consuming():
    """rise+ until(type=='stop'): the stop row caps consumption and is
    left for the next scan position."""
    p = (
        Pattern.begin("s", ANY)
        .next(
            "r",
            lambda r, c: r["value"]
            > (c["r"][-1]["value"] if c["r"] else c["s"][-1]["value"]),
            "+",
        )
        .until(lambda r, c: r["event_type"] == "stop")
    )
    types = ["x", "x", "stop", "x", "x", "x"]
    meas = {"si": lambda m: int(m["s"][0]["i"]), "n": lambda m: len(m["r"])}
    out = _run_nfa(_pdf([1, 2, 3, 4, 5, 6], types), p.steps, meas, "skip_past_last_row")
    # run 1: s=idx0, rises=[idx1] (idx2 is 'stop'); run 2: s=idx2 (the
    # stop row itself restarts), rises=[idx3, idx4, idx5]
    assert list(zip(out["si"], out["n"])) == [(0, 1), (2, 3)]


def test_until_requires_loop():
    with pytest.raises(ValueError, match="looping"):
        Pattern.begin("a", ANY).until(lambda r, c: True)


def test_sql_times_quantifier(spark):
    """SQL PATTERN (A R{2}) through the MATCH_RECOGNIZE compiler."""
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "user_id": [1] * 5,
            "ts": pd.to_datetime([0, 1, 2, 3, 4], unit="s"),
            "event_id": range(5),
            "value": [3.0, 1.0, 2.0, 5.0, 4.0],
        }
    )
    spark.createDataFrame(pdf).createOrReplaceTempView("algebra_events")
    from my_flink_1_10_2_spark.session import TableEnvironment

    out = (
        TableEnvironment(spark)
        .sql(
            """
        SELECT * FROM algebra_events MATCH_RECOGNIZE (
          PARTITION BY user_id
          ORDER BY ts, event_id
          MEASURES FIRST(A.value) AS a_val, LAST(R.value) AS top_val
          AFTER MATCH SKIP TO NEXT ROW
          PATTERN (A R{2})
          DEFINE R AS R.value > PREV(R.value)
        )
        """
        )
        .df.toPandas()
        .sort_values("a_val")
    )
    # rises of length 2: (1,2,5) from a=1.0 — a=3 has (1,2) falling first,
    # a=2 has (5,4) not rising twice
    assert list(out["a_val"]) == [1.0]
    assert list(out["top_val"]) == [5.0]


# ---------------------------------------------------------------------------
# followedByAny — non-deterministic relaxed contiguity
# ---------------------------------------------------------------------------


def _is(t):
    return lambda r, c: r["event_type"] == t


def test_followed_by_any_emits_every_viable_position():
    """a followedByAny b over [a, b, b]: both b's produce a match
    (ref: Pattern.followedByAny — the NFA's IGNORE-after-TAKE edge);
    plain followedBy keeps only the first."""
    pdf = _pdf([1, 2, 3], types=["a", "b", "b"])
    meas = {"bi": lambda m: m["b"][0]["i"]}
    p_any = Pattern.begin("a", _is("a")).followed_by_any("b", _is("b"))
    out = _run_nfa(pdf, p_any.steps, meas, "skip_to_next_row")
    assert sorted(out["bi"]) == [1, 2]
    p_det = Pattern.begin("a", _is("a")).followed_by("b", _is("b"))
    out = _run_nfa(pdf, p_det.steps, meas, "skip_to_next_row")
    assert sorted(out["bi"]) == [1]


def test_followed_by_any_combines_with_later_steps():
    """a fAny b next c: each b branch must find its own strictly-next
    c — [a, b, c, b, x] yields only the first (b, c) pair."""
    pdf = _pdf([1, 2, 3, 4, 5], types=["a", "b", "c", "b", "x"])
    meas = {"bi": lambda m: m["b"][0]["i"], "ci": lambda m: m["c"][0]["i"]}
    p = (
        Pattern.begin("a", _is("a"))
        .followed_by_any("b", _is("b"))
        .next("c", _is("c"))
    )
    out = _run_nfa(pdf, p.steps, meas, "skip_to_next_row")
    assert sorted(zip(out["bi"], out["ci"])) == [(1, 2)]
    # make the second branch viable too
    pdf2 = _pdf([1, 2, 3, 4, 5], types=["a", "b", "c", "b", "c"])
    out2 = _run_nfa(pdf2, p.steps, meas, "skip_to_next_row")
    assert sorted(zip(out2["bi"], out2["ci"])) == [(1, 2), (3, 4)]


def test_followed_by_any_multiple_starts():
    """Every a start contributes its own fan of b matches."""
    pdf = _pdf([1, 2, 3, 4], types=["a", "a", "b", "b"])
    meas = {
        "ai": lambda m: m["a"][0]["i"],
        "bi": lambda m: m["b"][0]["i"],
    }
    p = Pattern.begin("a", _is("a")).followed_by_any("b", _is("b"))
    out = _run_nfa(pdf, p.steps, meas, "skip_to_next_row")
    assert sorted(zip(out["ai"], out["bi"])) == [(0, 2), (0, 3), (1, 2), (1, 3)]


def test_followed_by_any_rejects_skip_past():
    p = Pattern.begin("a", _is("a")).followed_by_any("b", _is("b"))
    with pytest.raises(ValueError, match="skip_to_next_row"):
        _run_nfa(
            _pdf([1, 2], types=["a", "b"]),
            p.steps,
            _measure_counts("a"),
            "skip_past_last_row",
        )


def test_followed_by_any_respects_within():
    """The match window still bounds how far the any-branches reach."""
    pdf = _pdf([1, 2, 3], types=["a", "b", "b"])
    pdf["ts"] = pd.to_datetime(["2024-01-01 00:00", "2024-01-01 00:10", "2024-01-01 02:00"])
    meas = {"bi": lambda m: m["b"][0]["i"]}
    p = Pattern.begin("a", _is("a")).followed_by_any("b", _is("b")).within("1 hour")
    out = _run_nfa(pdf, p.steps, meas, "skip_to_next_row", ts_col="ts", within=p.within_td)
    assert sorted(out["bi"]) == [1]


# ---------------------------------------------------------------------------
# repeat contiguity: consecutive (default) / relaxed / allowCombinations
# ---------------------------------------------------------------------------


def test_relaxed_repeats_skip_gap_rows():
    """b+ with relaxed repeats over [b, x, b, x, b]: one match of three
    b's (gap rows ignored — ref ConsumingStrategy SKIP_TILL_NEXT);
    strict default stops at the first gap."""
    pdf = _pdf([1, 2, 3, 4, 5], types=["b", "x", "b", "x", "b"])
    p_rel = Pattern.begin("b", _is("b"), "+").relaxed_repeats()
    out = _run_nfa(pdf, p_rel.steps, _measure_counts("b"), "skip_past_last_row")
    assert _lens(out, "b") == [3]
    p_strict = Pattern.begin("b", _is("b"), "+")
    out = _run_nfa(pdf, p_strict.steps, _measure_counts("b"), "skip_past_last_row")
    assert _lens(out, "b") == [1, 1, 1]


def test_relaxed_repeats_respect_until():
    """until() cuts the relaxed chain at the stop row."""
    pdf = _pdf([1, 2, 3, 9, 4], types=["b", "x", "b", "s", "b"])
    p = (
        Pattern.begin("b", _is("b"), "+")
        .relaxed_repeats()
        .until(lambda r, c: r["event_type"] == "s")
    )
    out = _run_nfa(pdf, p.steps, _measure_counts("b"), "skip_past_last_row")
    # chain stops before the 's' row: only the two b's preceding it,
    # then the final b matches separately
    assert _lens(out, "b") == [2, 1]


def test_allow_combinations_enumerates_subsets():
    """a then b{2} with allowCombinations over [a, b, b, b]: every
    2-subset of the three b's is its own match (ref:
    Pattern.allowCombinations)."""
    pdf = _pdf([1, 2, 3, 4], types=["a", "b", "b", "b"])
    p = (
        Pattern.begin("a", _is("a"))
        .followed_by("b", _is("b"))
        .times(2)
        .allow_combinations()
    )
    meas = {
        "b0": lambda m: m["b"][0]["i"],
        "b1": lambda m: m["b"][1]["i"],
    }
    out = _run_nfa(pdf, p.steps, meas, "skip_to_next_row")
    assert sorted(zip(out["b0"], out["b1"])) == [(1, 2), (1, 3), (2, 3)]


def test_allow_combinations_rejects_skip_past():
    p = Pattern.begin("b", _is("b"), "+").allow_combinations()
    with pytest.raises(ValueError, match="skip_to_next_row"):
        _run_nfa(
            _pdf([1, 2], types=["b", "b"]),
            p.steps,
            _measure_counts("b"),
            "skip_past_last_row",
        )


def test_consecutive_is_default_noop():
    pdf = _pdf([1, 2, 3], types=["b", "x", "b"])
    p = Pattern.begin("b", _is("b"), "+").consecutive()
    out = _run_nfa(pdf, p.steps, _measure_counts("b"), "skip_past_last_row")
    assert _lens(out, "b") == [1, 1]
