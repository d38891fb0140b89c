"""Property-based NFA tests (hypothesis): the backtracking NFA must agree
with independently-coded pure-Python references on random inputs.

The NFA (operators/cep.py) is the trickiest hand-written component —
greedy quantifiers, backtracking, skip strategies — so it gets the
randomized coverage the example-based tests can't provide. References
are deliberately implemented with different algorithms (scan for the
V-pattern, gaps-and-islands for runs) so agreement is meaningful.

These run the NFA directly on plain dicts (no Spark) — the same code
path match_recognize drives per group, so coverage transfers.
"""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from my_flink_1_10_2_spark.operators.cep import Pattern, _run_nfa

SEQ = st.lists(st.integers(min_value=0, max_value=5), min_size=0, max_size=24)


def _pdf(values):
    return pd.DataFrame({"i": range(len(values)), "value": [float(v) for v in values]})


V = (
    Pattern.begin("a", lambda r, c: True)
    .next("b", lambda r, c: r["value"] < c["a"][-1]["value"])
    .next("c", lambda r, c: r["value"] > c["b"][-1]["value"])
)

RALLY = Pattern.begin("s", lambda r, c: True).next(
    "rise",
    lambda r, c: r["value"] > (c["rise"][-1]["value"] if c["rise"] else c["s"][-1]["value"]),
    "+",
)


@settings(max_examples=200, deadline=None)
@given(SEQ)
def test_v_pattern_skip_to_next_row_equals_scan(values):
    """Reference: direct triple-scan over adjacent positions."""
    out = _run_nfa(
        _pdf(values),
        V.steps,
        {"start": lambda m: int(m["a"][0]["i"])},
        "skip_to_next_row",
    )
    got = sorted(out["start"]) if len(out) else []
    want = [
        i
        for i in range(len(values) - 2)
        if values[i + 1] < values[i] and values[i + 2] > values[i + 1]
    ]
    assert got == want


@settings(max_examples=200, deadline=None)
@given(SEQ)
def test_v_pattern_skip_past_last_row_consumes(values):
    """Reference: greedy left-to-right scan consuming 3 rows per match."""
    out = _run_nfa(
        _pdf(values),
        V.steps,
        {"start": lambda m: int(m["a"][0]["i"])},
        "skip_past_last_row",
    )
    got = sorted(out["start"]) if len(out) else []
    want, i = [], 0
    while i < len(values) - 2:
        if values[i + 1] < values[i] and values[i + 2] > values[i + 1]:
            want.append(i)
            i += 3
        else:
            i += 1
    assert got == want


@settings(max_examples=200, deadline=None)
@given(SEQ)
def test_rally_equals_gaps_and_islands(values):
    """Reference: maximal strictly-rising islands (len ≥ 2) computed by
    run-splitting, not by automaton."""
    out = _run_nfa(
        _pdf(values),
        RALLY.steps,
        {
            "start": lambda m: int(m["s"][0]["i"]),
            "length": lambda m: 1 + len(m["rise"]),
        },
        "skip_past_last_row",
    )
    got = sorted(zip(out["start"], out["length"])) if len(out) else []

    want = []
    i = 0
    while i < len(values):
        j = i
        while j + 1 < len(values) and values[j + 1] > values[j]:
            j += 1
        if j > i:
            want.append((i, j - i + 1))
        i = max(j, i + 1) if j == i else j + 1
    assert got == want
