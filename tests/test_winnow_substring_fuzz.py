"""Randomized differentials for the round-8 dedup operators:

- winnowing_fingerprints vs a plain-Python Schleimer/Wilkerson/Aiken
  window-min reference (min hash per window, RIGHTMOST position on
  ties, distinct selections) — the packed-BIGINT tie-break arithmetic
  is exactly the kind of trick a hand reference should confirm; plus
  the paper's guarantee itself (a shared run of >= k+window-1 tokens
  shares a fingerprint).
- duplicated_spans / duplicated_coverage vs a brute-force cross-doc
  n-gram scan with maximal-span merging.
"""

from __future__ import annotations

import hashlib
import random

import pytest

from my_flink_1_10_2_spark.llm.dedup import (
    duplicated_coverage,
    duplicated_spans,
    winnowing_fingerprints,
)

VOCAB = ["sun", "moon", "tide", "cliff", "pine", "owl", "ash", "fern"]


def _ref_winnow(text: str, k: int, window: int):
    toks = [t for t in text.lower().split() if t]
    if len(toks) < k:
        return None
    grams = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    hashes = [
        int(hashlib.md5(g.encode()).hexdigest()[:10], 16) for g in grams
    ]
    selected = set()
    for end in range(window - 1, len(hashes)):
        lo = end - window + 1
        # min hash; rightmost position on ties
        best_pos = max(
            range(lo, end + 1),
            key=lambda p: (-hashes[p], p),
        )
        selected.add((hashes[best_pos], best_pos))
    # distinct on (hash, pos) — mirror the packed-key distinct
    return {
        "n_grams": len(grams),
        "n_fps": len(selected),
        "fp_hash_sum": sum(h for h, _ in selected),
    }


@pytest.mark.parametrize("trial", range(3))
def test_winnowing_matches_reference(spark, trial):
    rng = random.Random(980 + trial)
    docs = []
    for i in range(rng.randint(2, 8)):
        n = rng.randint(4, 30)
        # small vocab -> frequent hash ties within windows
        docs.append((i, " ".join(rng.choice(VOCAB[:3]) for _ in range(n))))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_grams"], r["n_fps"], r["fp_hash_sum"])
        for r in winnowing_fingerprints(df, k=4, window=5).collect()
    }
    for i, text in docs:
        want = _ref_winnow(text, 4, 5)
        if want is None or want["n_grams"] < 5:
            assert i not in got, f"trial {trial} doc {i} should lack a full window"
        else:
            assert got[i] == (
                want["n_grams"], want["n_fps"], want["fp_hash_sum"],
            ), f"trial {trial} doc {i}: {text!r}"


def test_winnowing_guarantee_shared_run_shares_fingerprint(spark):
    """Schleimer et al.'s core guarantee: two documents sharing a token
    run of length >= k + window - 1 share at least one fingerprint."""
    rng = random.Random(985)
    k, window = 4, 5
    shared = " ".join(rng.choice(VOCAB) for _ in range(k + window - 1))
    docs = [
        (1, " ".join(rng.choice(VOCAB) for _ in range(10)) + " " + shared),
        (2, shared + " " + " ".join(rng.choice(VOCAB) for _ in range(10))),
    ]

    def fps(text):
        toks = text.lower().split()
        grams = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
        hashes = [int(hashlib.md5(g.encode()).hexdigest()[:10], 16) for g in grams]
        out = set()
        for end in range(window - 1, len(hashes)):
            lo = end - window + 1
            p = max(range(lo, end + 1), key=lambda q: (-hashes[q], q))
            out.add(hashes[p])
        return out

    assert fps(docs[0][1]) & fps(docs[1][1]), "guarantee violated in reference"
    # and the Spark operator selects from the same hash universe:
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = winnowing_fingerprints(df, k=k, window=window).collect()
    assert len(rows) == 2  # both docs fingerprinted


def _ref_spans(docs: list[tuple[int, str]], n: int, min_docs: int):
    """Brute force: every word n-gram string -> set of docs; positions of
    grams spread across >= min_docs docs merge into maximal spans when
    q <= p + n."""
    gram_docs: dict[str, set[int]] = {}
    gram_pos: dict[int, list[int]] = {}
    toks = {i: t.split() for i, t in docs}
    for i, words in toks.items():
        for p in range(max(len(words) - n + 1, 0)):
            g = " ".join(words[p : p + n])
            gram_docs.setdefault(g, set()).add(i)
    spans: dict[int, list[tuple[int, int]]] = {}
    for i, words in toks.items():
        hits = sorted(
            {
                p
                for p in range(max(len(words) - n + 1, 0))
                if len(gram_docs[" ".join(words[p : p + n])]) >= min_docs
            }
        )
        # merge: q <= p_prev + n
        merged = []
        for p in hits:
            if merged and p <= merged[-1][-1] + n:
                merged[-1].append(p)
            else:
                merged.append([p])
        spans[i] = [
            (grp[0], grp[-1] + n - 1, grp[-1] + n - grp[0]) for grp in merged
        ]
    return spans


@pytest.mark.parametrize("trial", range(3))
def test_duplicated_spans_match_brute_force(spark, trial):
    rng = random.Random(990 + trial)
    n = 3
    docs = []
    shared = " ".join(rng.choice(VOCAB) for _ in range(rng.randint(3, 7)))
    for i in range(rng.randint(2, 6)):
        words = [rng.choice(VOCAB) for _ in range(rng.randint(3, 18))]
        if rng.random() < 0.7:  # plant the shared run somewhere
            at = rng.randint(0, len(words))
            words[at:at] = shared.split()
        docs.append((i, " ".join(words)))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got: dict[int, set] = {}
    for r in duplicated_spans(df, n=n, min_docs=2).collect():
        got.setdefault(r["doc_id"], set()).add(
            (r["span_start"], r["span_end"], r["span_tokens"])
        )
    want = {
        i: set(s) for i, s in _ref_spans(docs, n, 2).items() if s
    }
    assert got == want, f"trial {trial}: docs={docs}"

    # coverage must equal the union of span tokens per doc
    cov = {
        r["doc_id"]: r["covered_tokens"]
        for r in duplicated_coverage(df, n=n, min_docs=2).collect()
    }
    for i, text in docs:
        expect = sum(t for _, _, t in want.get(i, set()))
        assert cov[i] == expect, f"trial {trial} doc {i}"
