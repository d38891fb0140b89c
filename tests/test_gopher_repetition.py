"""Gopher intra-document repetition signals (llm.text.gopher_repetition)
on hand-built documents with enumerable line/n-gram repetition.
"""
from my_flink_1_10_2_spark.llm.text import gopher_repetition


def _one(spark, text, doc_id=1):
    df = spark.createDataFrame([(doc_id, text)], "doc_id long, text string")
    rows = gopher_repetition(df).collect()
    assert len(rows) == 1
    return rows[0]


def test_duplicate_line_fractions(spark):
    # 4 non-empty lines; "same line" appears twice -> 2 dup instances.
    text = "same line\nunique one\nsame line\nanother unique"
    r = _one(spark, text)
    assert (r.n_lines, r.n_dup_lines) == (4, 2)
    assert r.dup_line_frac_e6 == 500000
    # dup chars = 2*9; total line chars = 9+10+9+14 = 42
    assert r.dup_line_char_frac_e6 == 18 * 1000000 // 42


def test_empty_lines_excluded(spark):
    r = _one(spark, "a b c\n\n\na b c")
    assert r.n_lines == 2 and r.n_dup_lines == 2


def test_top_bigram_share(spark):
    # "x y" occurs 3 times (positions 0,2,4), every other bigram once.
    text = "x y x y x y z"
    r = _one(spark, text)
    assert r.top2_occurrences == 3
    # top gram "x y" (3 chars) * 3 occurrences / 13 text chars
    assert r.top2_char_frac_e6 == 9 * 1000000 // 13


def test_top_bigram_tie_breaks_lexicographically(spark):
    # "b c" and "a b" both occur twice; smallest gram wins deterministically.
    r = _one(spark, "a b c d a b c e")
    assert r.top2_occurrences == 2
    # top gram is "a b" (3 chars): 2*3 / 15 chars
    assert r.top2_char_frac_e6 == 6 * 1000000 // 15


def test_repeated_6gram_span_union(spark):
    # 6-gram "p q r s t u" appears at positions 0 and 8 (no overlap):
    # covered tokens = 12 of 14.
    text = "p q r s t u w1 w2 p q r s t u"
    r = _one(spark, text)
    assert r.dup6_covered_tokens == 12
    assert r.dup6_tok_frac_e6 == 12 * 1000000 // 14


def test_overlapping_repeats_counted_once(spark):
    # "a a a a a a a a" (8 tokens): every 6-gram is "a a a a a a",
    # positions 0,1,2 all repeat -> union covers all 8 tokens, not 18.
    r = _one(spark, "a a a a a a a a")
    assert r.dup6_covered_tokens == 8
    assert r.dup6_tok_frac_e6 == 1000000


def test_clean_document_zero_filled(spark):
    r = _one(spark, "all tokens here are fully distinct words")
    assert r.n_dup_lines == 0
    assert r.dup6_covered_tokens == 0 and r.dup6_tok_frac_e6 == 0
    assert r.top2_occurrences == 1
