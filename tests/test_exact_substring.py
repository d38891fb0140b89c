"""Exact-substring dedup spans/coverage (llm.dedup.duplicated_spans /
duplicated_coverage) — the suffix-array-style maximal-span semantics of
Lee et al. (ACL 2022) at word-n-gram granularity, on hand-built corpora
where the expected spans are enumerable by eye.
"""
import pytest

from my_flink_1_10_2_spark.llm.dedup import (
    duplicated_coverage,
    duplicated_spans,
    shingle_rows_pos,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_shingle_rows_pos_positions_and_short_docs(spark):
    df = _docs(spark, [(1, "a b c d"), (2, "x y")])
    got = {
        (r.doc_id, r.pos, r.shingle)
        for r in shingle_rows_pos(df, n=3).collect()
    }
    # doc 2 has 2 words < n=3 -> no rows (matches the oracle's empty range)
    assert got == {(1, 0, "a b c"), (1, 1, "b c d")}


def test_spans_merge_overlapping_and_adjacent_positions(spark):
    # Shared 6-token phrase inside longer distinct docs; n=4 grams at
    # positions 2,3,4 of doc 1 overlap -> ONE maximal span [2, 7].
    shared = "the quick brown fox jumps high"
    df = _docs(
        spark,
        [
            (1, "u1 u2 " + shared + " t1 t2"),
            (2, shared + " other words entirely here"),
        ],
    )
    spans = {
        (r.doc_id, r.span_start, r.span_end, r.span_tokens)
        for r in duplicated_spans(df, n=4).collect()
    }
    assert spans == {(1, 2, 7, 6), (2, 0, 5, 6)}


def test_spans_split_when_gap_exceeds_n(spark):
    # Two shared 4-gram phrases separated by >n unique tokens -> two spans.
    p1, p2 = "alpha beta gamma delta", "eps zeta eta theta"
    df = _docs(
        spark,
        [
            (1, p1 + " g1 g2 g3 g4 g5 " + p2),
            (2, p1 + " completely different middle " + p2),
        ],
    )
    spans = sorted(
        (r.doc_id, r.span_start, r.span_end)
        for r in duplicated_spans(df, n=4).collect()
    )
    assert spans == [(1, 0, 3), (1, 9, 12), (2, 0, 3), (2, 7, 10)]


def test_coverage_counts_union_not_positions(spark):
    # Overlapping gram positions must count covered TOKENS once (union of
    # intervals), not n per duplicated position.
    shared = "one two three four five"  # 5 tokens, n=4 -> 2 positions
    df = _docs(spark, [(1, shared), (2, shared + " tail1 tail2 tail3")])
    cov = {r.doc_id: (r.n_tokens, r.covered_tokens, r.cov_frac_e6)
           for r in duplicated_coverage(df, n=4).collect()}
    assert cov[1] == (5, 5, 1000000)
    assert cov[2] == (8, 5, 625000)


def test_coverage_keeps_clean_documents_with_zero(spark):
    df = _docs(
        spark,
        [
            (1, "dup dup phrase here okay"),
            (2, "dup dup phrase here okay"),
            (3, "totally unique words in this document"),
        ],
    )
    cov = {r.doc_id: r.covered_tokens for r in duplicated_coverage(df, n=4).collect()}
    assert cov[3] == 0 and cov[1] == 5 and cov[2] == 5


def test_min_docs_threshold(spark):
    df = _docs(
        spark,
        [
            (1, "p q r s t"),
            (2, "p q r s t"),
            (3, "p q r s t"),
            (4, "lone phrase shared with nobody"),
        ],
    )
    spans3 = duplicated_spans(df, n=5, min_docs=3).collect()
    assert {r.doc_id for r in spans3} == {1, 2, 3}
    spans4 = duplicated_spans(df, n=5, min_docs=4).collect()
    assert spans4 == []


def test_spans_window_is_keyed_not_single_partition(spark):
    from my_flink_1_10_2_spark import plans

    df = _docs(spark, [(1, "a b c d e"), (2, "a b c d e")])
    out = duplicated_spans(df, n=4)
    assert plans.single_partition_windows(out) == []
