"""Randomized differential for distributed BPE (llm/bpe.py) vs the
classic single-node dictionary algorithm (Sennrich et al. 2016,
`learn_bpe` reimplemented in plain Python below).  The Spark trainer
drives merges through SEP-framed string expressions — exactly the kind
of machinery where an off-by-one in framing silently learns wrong
merges — so it gets random corpora with adversarial shapes: repeated
single-char words, long runs (aaaa...), shared prefixes/suffixes, and
tie-heavy frequency tables (ties break lexicographically on both
sides).
"""

from __future__ import annotations

import random
from collections import Counter

import pytest

from my_flink_1_10_2_spark.llm.bpe import (
    EOW,
    bpe_segment,
    bpe_segment_pandas,
    train_bpe,
)


def _ref_train(word_freq: dict[str, int], num_merges: int):
    """Classic BPE: count symbol pairs over the vocabulary, merge the
    most frequent (ties lexicographic), repeat."""
    vocab = {tuple([*w, EOW]): f for w, f in word_freq.items()}
    merges = []
    for _ in range(num_merges):
        pairs: Counter = Counter()
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += f
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pairs[best] == 0:
            break
        merges.append((best[0], best[1], best[0] + best[1], pairs[best]))
        new_vocab = {}
        for syms, f in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and (syms[i], syms[i + 1]) == best
                ):
                    out.append(best[0] + best[1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + f
        vocab = new_vocab
    return merges


def _ref_encode(word: str, rules: list[tuple[str, str]]):
    ranks = {pair: i for i, pair in enumerate(rules)}
    syms = [*word, EOW]
    while len(syms) > 1:
        cands = [
            (ranks[(syms[i], syms[i + 1])], i)
            for i in range(len(syms) - 1)
            if (syms[i], syms[i + 1]) in ranks
        ]
        if not cands:
            break
        _, i = min(cands)
        syms[i : i + 2] = [syms[i] + syms[i + 1]]
    return syms


def _corpus(rng: random.Random):
    alphabet = "ab" if rng.random() < 0.5 else "abc"
    words = []
    for _ in range(rng.randint(3, 12)):
        style = rng.randrange(3)
        if style == 0:
            w = "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 6)))
        elif style == 1:
            w = rng.choice(alphabet) * rng.randint(1, 7)  # runs
        else:
            w = "ab" + "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 4)))
        words.extend([w] * rng.randint(1, 4))
    rng.shuffle(words)
    return words


@pytest.mark.parametrize("trial", range(3))
def test_train_bpe_matches_classic_reference(spark, trial):
    rng = random.Random(950 + trial)
    words = _corpus(rng)
    docs = spark.createDataFrame([(" ".join(words),)], "text string")
    n_merges = rng.randint(2, 6)
    got = [
        (r["l_sym"], r["r_sym"], r["merged"], r["pair_count"])
        for r in train_bpe(docs, num_merges=n_merges)
        .orderBy("step")
        .collect()
    ]
    want = _ref_train(dict(Counter(words)), n_merges)
    assert got == want, f"trial {trial}: corpus={Counter(words)}"


@pytest.mark.parametrize("trial", range(2))
def test_segment_expression_and_pandas_agree_with_reference(spark, trial):
    """Both encode paths (replace-expression chain and the Arrow kernel)
    must match the priority-order reference encode on random words under
    randomly TRAINED rules."""
    rng = random.Random(960 + trial)
    words = _corpus(rng)
    docs = spark.createDataFrame([(" ".join(words),)], "text string")
    rules = [
        (r["l_sym"], r["r_sym"])
        for r in train_bpe(docs, num_merges=5).orderBy("step").collect()
    ]
    probe_words = sorted(set(words))[:12]
    wdf = spark.createDataFrame([(w,) for w in probe_words], "word string")
    for seg in (bpe_segment, bpe_segment_pandas):
        got = {
            r["word"]: list(r["pieces"])
            for r in seg(wdf, "word", rules).collect()
        }
        for w in probe_words:
            assert got[w] == _ref_encode(w, rules), (
                f"trial {trial} {seg.__name__} word={w!r} rules={rules}"
            )
