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
