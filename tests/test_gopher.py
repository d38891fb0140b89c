"""Gopher §A1.1 quality rules (`llm/text.py::gopher_flags`): each rule
exercised on both sides of its threshold, including the line-based rules
the single-line fixture documents never trip."""

import pytest

from my_flink_1_10_2_spark.llm.text import gopher_flags


def _flags(spark, text, **kw):
    df = spark.createDataFrame([(1, text)], "doc_id int, text string")
    return gopher_flags(df, **kw).collect()[0]


GOOD = (
    "the quick brown fox jumps over that lazy dog and runs off with great "
    "speed to be seen near the old mill where many other animals have made "
    "their homes over many long years of quiet living and good fortune "
    "together in peace while the seasons turn slowly above the green valley "
    "and children come down from the village to watch them play"
)


def test_good_document_passes(spark):
    r = _flags(spark, GOOD)
    assert r["passes_gopher"] == 1
    assert r["n_words"] >= 50 and r["n_stop_hits"] >= 2


def test_word_count_bounds(spark):
    r = _flags(spark, "too short to pass")
    assert r["flag_word_count"] == 0 and r["passes_gopher"] == 0
    r = _flags(spark, GOOD, min_words=5, max_words=10)
    assert r["flag_word_count"] == 0  # now too long


def test_mean_word_length_window(spark):
    # 60 one-char words: mean 1 < 3
    r = _flags(spark, " ".join(["a"] * 60))
    assert r["flag_mean_word_len"] == 0
    # 60 very long words: mean > 10
    r = _flags(spark, " ".join(["antidisestablishmentarianism"] * 60))
    assert r["flag_mean_word_len"] == 0
    # boundary: exactly mean 3 passes (3*w == chars)
    r = _flags(spark, " ".join(["abc"] * 60))
    assert r["flag_mean_word_len"] == 1


def test_symbol_ratio(spark):
    base = ["word"] * 50
    r = _flags(spark, " ".join(base) + " " + "#" * 6)
    # 6 hashes vs 51 words -> 60 > 51 fails
    assert r["flag_symbol_ratio"] == 0
    r = _flags(spark, " ".join(base) + " x...")
    assert r["n_symbols"] == 1 and r["flag_symbol_ratio"] == 1
    r = _flags(spark, "five words here … now")
    assert r["n_symbols"] == 1


def test_bullet_and_ellipsis_lines(spark):
    bullets = "\n".join(["- item " + str(i) for i in range(10)])
    r = _flags(spark, bullets)
    assert r["n_bullet_lines"] == 10 and r["flag_bullet_lines"] == 0
    mixed = "\n".join(["- a", "- b", "plain line", "plain too"])
    assert _flags(spark, mixed)["flag_bullet_lines"] == 1
    dots = "\n".join(["to be continued...", "more...", "fin"])
    r = _flags(spark, dots)
    assert r["n_ellipsis_lines"] == 2 and r["flag_ellipsis_lines"] == 0


def test_alpha_word_fraction(spark):
    words = ["word"] * 40 + ["1234"] * 20  # 40/60 = 66% < 80%
    r = _flags(spark, " ".join(words))
    assert r["flag_alpha_words"] == 0
    words = ["word"] * 48 + ["1234"] * 12  # exactly 80%
    assert _flags(spark, " ".join(words))["flag_alpha_words"] == 1


def test_stopword_requirement(spark):
    r = _flags(spark, " ".join(["lorem", "ipsum", "dolor"] * 20))
    assert r["n_stop_hits"] == 0 and r["flag_stopwords"] == 0
    r = _flags(spark, "The staff went to town " + " ".join(["x"] * 50))
    assert r["n_stop_hits"] == 2 and r["flag_stopwords"] == 1  # the, to


def test_counts_are_exact_integers(spark):
    r = _flags(spark, "alpha # beta ... gamma … the end of it")
    assert r["n_symbols"] == 3
    assert r["n_words"] == 10  # the symbol tokens count as words too
