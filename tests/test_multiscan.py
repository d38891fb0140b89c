"""Aho-Corasick tests: textbook automaton behavior (nested patterns,
overlaps, failure transitions), brute-force equivalence, and the Spark
surface."""

from __future__ import annotations

import pytest

from my_flink_1_10_2_spark.llm.multiscan import AhoCorasick, multiscan_counts
from my_flink_1_10_2_spark.queries import read
from tests.conftest import SF_DIR


def test_textbook_he_she_his_hers():
    ac = AhoCorasick(["he", "she", "his", "hers"])
    text = "ushers"
    # 'ushers': she@1-3, he@2-3, hers@2-5
    assert ac.count_matches(text) == [1, 1, 0, 1]
    hits = sorted(ac.find_all(text))
    assert hits == [(3, 0), (3, 1), (5, 3)]


def test_overlapping_same_pattern_counted():
    ac = AhoCorasick(["aa"])
    assert ac.count_matches("aaaa") == [3]  # overlapping occurrences


def test_bruteforce_equivalence_randomized():
    import random

    rng = random.Random(808)
    alphabet = "abc"
    for _ in range(50):
        pats = list(
            {
                "".join(rng.choice(alphabet) for _ in range(rng.randrange(1, 4)))
                for _ in range(rng.randrange(1, 6))
            }
        )
        text = "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 60)))
        ac = AhoCorasick(pats)
        got = ac.count_matches(text)
        for pi, p in enumerate(pats):
            want = sum(
                1 for i in range(len(text) - len(p) + 1)
                if text[i : i + len(p)] == p
            )
            assert got[pi] == want, (pats, text, p)


def test_rejects_bad_patterns():
    with pytest.raises(ValueError, match="at least one"):
        AhoCorasick([])
    with pytest.raises(ValueError, match="empty pattern"):
        AhoCorasick(["ok", ""])


def test_spark_surface_zero_rows_included(spark):
    docs = read(spark, SF_DIR, "documents").limit(10)
    out = multiscan_counts(docs, ["table", "zzzz-never-present"]).collect()
    assert len(out) == 20  # every (doc, pattern) pair, zeros included
    never = [r for r in out if r.pattern == "zzzz-never-present"]
    assert all(r.n_matches == 0 for r in never)
    some = [r for r in out if r.pattern == "table"]
    assert any(r.n_matches > 0 for r in some)
