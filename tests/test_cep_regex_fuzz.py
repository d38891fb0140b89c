"""Random-PATTERN differential for the CEP NFA: strict-contiguity
patterns with constant predicates are isomorphic to regular
expressions over a value-to-character encoding, so Python's `re`
engine (an independent, battle-tested backtracker) is an exact
reference for both skip strategies:

- skip_past_last_row  == non-overlapping leftmost matches (finditer),
- skip_to_next_row    == a match attempt anchored at every position.

The existing property tests fix three patterns and randomize the data;
this randomizes the PATTERN TOO — quantifiers {1, ?, +, *, {n}, {n,m}}
with greedy and reluctant variants across 2-4 steps — the space where
backtracking bugs live.
"""

from __future__ import annotations

import random
import re

import pandas as pd
import pytest

from my_flink_1_10_2_spark.operators.cep import Pattern, _run_nfa

VALS = 4  # row values 0..3 -> chars a..d


def _pdf(values):
    return pd.DataFrame(
        {"i": range(len(values)), "value": [float(v) for v in values]}
    )


def _rand_step(rng: random.Random, first: bool):
    kind = rng.choice(["eq", "ge", "le"])
    k = rng.randrange(VALS)
    if kind == "eq":
        pred = lambda r, c, k=k: r["value"] == k  # noqa: E731
        cls = chr(ord("a") + k)
    elif kind == "ge":
        pred = lambda r, c, k=k: r["value"] >= k  # noqa: E731
        cls = f"[{chr(ord('a') + k)}-{chr(ord('a') + VALS - 1)}]"
    else:
        pred = lambda r, c, k=k: r["value"] <= k  # noqa: E731
        cls = f"[a-{chr(ord('a') + k)}]"
    quants = ["1", "+", "?", "{2}", "{1,3}", "{2,}"]
    if first:
        quants = ["1", "+", "{2}", "{1,3}", "{2,}"]  # start must consume
    q = rng.choice(quants)
    if q != "1" and rng.random() < 0.3:
        q += "?"  # reluctant
    rx_q = "" if q == "1" else q.replace("{2,}", "{2,}")
    return pred, q, cls + rx_q


def _rand_pattern(rng: random.Random):
    n_steps = rng.randint(2, 4)
    pred, q, rx = _rand_step(rng, first=True)
    pat = Pattern.begin("s0", pred, q)
    regex = rx
    for s in range(1, n_steps):
        pred, q, rx = _rand_step(rng, first=False)
        pat = pat.next(f"s{s}", pred, q)
        regex += rx
    return pat, regex, n_steps


def _encode(values):
    return "".join(chr(ord("a") + v) for v in values)


def _rx_followed_by(ch: str, q: str) -> str:
    """Regex image of a followed_by (relaxed-contiguity) step: the gap
    is a LAZY `.*?` (skip-till-next takes the first viable row), repeats
    of a looping quantifier are consecutive (repeats='strict'), and a
    GREEDY OPTIONAL prefers taking the step through the gap — so its
    image is `(?:.*?c)?`, NOT `.*?c?` (the probe that built this test
    found exactly that divergence in the naive mapping; the engine
    matches Flink's greedy semantics, the naive regex did not)."""
    if q == "1":
        return f".*?{ch}"
    if q == "+":
        return f".*?{ch}+"
    if q == "?":
        return f"(?:.*?{ch})?"
    if q == "{1,2}":
        return f".*?{ch}{{1,2}}"
    raise ValueError(q)


def test_mixed_contiguity_patterns_match_regex_reference():
    """next + followed_by mixes with quantifiers vs the refined regex
    mapping — pins the relaxed-contiguity semantics (lazy gap, greedy
    optional-through-gap) against an independent backtracker."""
    rng = random.Random(1210)
    for trial in range(150):
        n_steps = rng.randint(2, 3)
        ks = [rng.randrange(3) for _ in range(n_steps)]
        quants = ["1"] + [
            rng.choice(["1", "+", "{1,2}", "?"]) for _ in range(n_steps - 1)
        ]
        pat = Pattern.begin(
            "s0", lambda r, c, k=ks[0]: r["value"] == k, quants[0]
        )
        regex = chr(97 + ks[0])
        for j in range(1, n_steps):
            ch = chr(97 + ks[j])
            if rng.random() < 0.5:
                pat = pat.next(
                    f"s{j}", lambda r, c, k=ks[j]: r["value"] == k, quants[j]
                )
                regex += ch + ("" if quants[j] == "1" else quants[j])
            else:
                pat = pat.followed_by(
                    f"s{j}", lambda r, c, k=ks[j]: r["value"] == k, quants[j]
                )
                regex += _rx_followed_by(ch, quants[j])
        values = [rng.randrange(3) for _ in range(rng.randint(0, 24))]
        s = "".join(chr(97 + v) for v in values)
        out = _run_nfa(
            _pdf(values),
            pat.steps,
            {"start": lambda m: int(m["s0"][0]["i"])},
            "skip_past_last_row",
        )
        got = sorted(out["start"]) if len(out) else []
        want = [m.start() for m in re.finditer(regex, s) if m.end() > m.start()]
        assert got == want, (
            f"trial {trial} regex={regex!r} seq={s!r} got={got} want={want}"
        )


@pytest.mark.parametrize("strategy", ["skip_past_last_row", "skip_to_next_row"])
def test_random_patterns_match_regex_reference(strategy):
    rng = random.Random(1080 if strategy == "skip_past_last_row" else 1081)
    for trial in range(60):
        pat, regex, n_steps = _rand_pattern(rng)
        values = [rng.randrange(VALS) for _ in range(rng.randint(0, 30))]
        s = _encode(values)
        measures = {
            "start": lambda m: int(m["s0"][0]["i"]),
            "length": lambda m: sum(
                len(m.get(f"s{j}", [])) for j in range(n_steps)
            ),
        }
        out = _run_nfa(_pdf(values), pat.steps, measures, strategy)
        got = (
            sorted(zip(out["start"], out["length"])) if len(out) else []
        )
        if strategy == "skip_past_last_row":
            want = [
                (m.start(), m.end() - m.start())
                for m in re.finditer(regex, s)
                if m.end() > m.start()
            ]
        else:
            want = []
            for i in range(len(s)):
                m = re.match(regex, s[i:])
                if m and m.end() > 0:
                    want.append((i, m.end()))
        assert got == want, (
            f"trial {trial} strategy={strategy} regex={regex!r} "
            f"seq={s!r}\ngot={got}\nwant={want}"
        )
