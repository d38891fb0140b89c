"""Randomized differential for the Gopher intra-document repetition
signals (llm/text.py::gopher_repetition) — four exact-integer metrics
with distinct failure modes (line-instance vs distinct-line counting,
tie-broken top-2-gram, maximal-span 6-gram coverage), recomputed in
plain Python on random documents with planted repetition.
"""

from __future__ import annotations

import random
import re
from collections import Counter

import pytest

from my_flink_1_10_2_spark.llm.text import gopher_repetition

VOCAB = ["ash", "birch", "cedar", "dune", "elm"]


def _grams(words, n):
    """Mirror shingle_rows_pos: positions 0..max(len-n, 0); short docs
    yield one gram of whatever words exist."""
    hi = max(len(words) - n, 0)
    return [" ".join(words[p : p + n]) for p in range(hi + 1)]


def _reference(text: str):
    words = re.split(r"\s+", text)
    n_words = max(len(words), 1)
    text_chars = max(len(text), 1)

    lines = [ln for ln in text.split("\n") if ln != ""]
    cnt = Counter(lines)
    n_lines = len(lines)
    n_dup = sum(1 for ln in lines if cnt[ln] >= 2)
    line_chars = sum(len(ln) for ln in lines)
    dup_chars = sum(len(ln) for ln in lines if cnt[ln] >= 2)

    g2 = Counter(_grams(words, 2))
    top_gram, top_c = min(g2.items(), key=lambda kv: (-kv[1], kv[0]))
    top2_chars = top_c * len(top_gram)

    g6 = _grams(words, 6)
    rep = {g for g, c in Counter(g6).items() if c >= 2}
    hits = sorted({p for p, g in enumerate(g6) if g in rep})
    cov = 0
    prev = None
    for p in hits:
        cov += 6 if prev is None else min(6, p - prev)
        prev = p

    return (
        n_lines,
        n_dup,
        n_dup * 1_000_000 // max(n_lines, 1),
        dup_chars * 1_000_000 // max(line_chars, 1),
        top_c,
        top2_chars * 1_000_000 // text_chars,
        cov,
        cov * 1_000_000 // n_words,
    )


def _doc(rng: random.Random) -> str:
    lines = []
    for _ in range(rng.randint(1, 6)):
        n = rng.randint(1, 20)
        words = [rng.choice(VOCAB) for _ in range(n)]
        if n >= 12 and rng.random() < 0.6:  # plant a repeated 6-gram run
            run = words[:6]
            at = rng.randint(6, n - 6)
            words[at : at + 6] = run
        lines.append(" ".join(words))
    if rng.random() < 0.5:  # plant duplicate lines
        lines.append(lines[0])
    return "\n".join(lines)


@pytest.mark.parametrize("trial", range(3))
def test_gopher_repetition_matches_reference(spark, trial):
    rng = random.Random(1050 + trial)
    docs = [(i, _doc(rng)) for i in range(rng.randint(2, 6))]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (
            r["n_lines"], r["n_dup_lines"], r["dup_line_frac_e6"],
            r["dup_line_char_frac_e6"], r["top2_occurrences"],
            r["top2_char_frac_e6"], r["dup6_covered_tokens"],
            r["dup6_tok_frac_e6"],
        )
        for r in gopher_repetition(df).collect()
    }
    for i, text in docs:
        assert got[i] == _reference(text), f"trial {trial} doc {i}: {text!r}"
