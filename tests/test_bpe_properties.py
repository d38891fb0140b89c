"""Property tests: the distributed BPE trainer must agree with a
direct single-machine reference implementation of the algorithm
(Sennrich et al. 1508.07909) on arbitrary small corpora — including
overlapping-pair corner cases ('aaaa') that fixtures rarely cover."""

from __future__ import annotations

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from my_flink_1_10_2_spark.llm.bpe import EOW, train_bpe


def _reference_bpe(words: list[str], num_merges: int):
    """Plain-Python BPE: overlapping adjacent-pair counts weighted by
    word frequency; argmax with (count desc, left, right) tie-break;
    greedy left-to-right non-overlapping merge application."""
    freqs = Counter(words)
    seqs = {w: [*w, EOW] for w in freqs}
    merges = []
    for step in range(1, num_merges + 1):
        counts: Counter = Counter()
        for w, syms in seqs.items():
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] += freqs[w]
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        (left, right), cnt = best
        merges.append((step, left, right, left + right, cnt))
        for w, syms in seqs.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            seqs[w] = out
    return merges


words_strategy = st.lists(
    st.text(alphabet="ab", min_size=1, max_size=5), min_size=1, max_size=8
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(words=words_strategy)
def test_train_bpe_matches_reference_model(spark, words):
    docs = spark.createDataFrame([(1, " ".join(words))], "doc_id int, text string")
    got = [
        (r.step, r.l_sym, r.r_sym, r.merged, r.pair_count)
        for r in train_bpe(docs, num_merges=3).collect()
    ]
    assert got == _reference_bpe(words, 3)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(words=words_strategy)
def test_segment_paths_agree_on_trained_rules(spark, words):
    """The expression-chain encoder and the production Arrow-kernel
    encoder must produce identical segmentations for TRAINED rule
    tables (single-pass-in-rule-order == iterative-priority encode)."""
    from my_flink_1_10_2_spark.llm.bpe import (
        bpe_segment,
        bpe_segment_pandas,
        train_bpe,
    )

    docs = spark.createDataFrame([(1, " ".join(words))], "doc_id int, text string")
    rules = [
        (r.l_sym, r.r_sym) for r in train_bpe(docs, num_merges=3).collect()
    ]
    wdf = spark.createDataFrame([(w,) for w in set(words)], "word string")
    a = {r.word: list(r.pieces) for r in bpe_segment(wdf, "word", rules).collect()}
    b = {r.word: list(r.pieces)
         for r in bpe_segment_pandas(wdf, "word", rules).collect()}
    assert a == b


def test_segment_expression_chain_capped(spark):
    import pytest

    from my_flink_1_10_2_spark.llm.bpe import bpe_segment

    wdf = spark.createDataFrame([("x",)], "word string")
    with pytest.raises(ValueError, match="bpe_segment_pandas"):
        bpe_segment(wdf, "word", [("a", "b")] * 300)
