"""Randomized differential for MinHash signatures + LSH banding
(llm/dedup.py).  MinHash here is DETERMINISTIC (md5 family hashes), so
a plain-Python recompute with hashlib is an exact reference — no
probabilistic tolerance needed:

- signatures equal the reference min-over-shingles for every hash slot
  (catches the fixed-width hex-vs-numeric ordering assumption and the
  digest chunking arithmetic),
- identical documents always share all bands and surface with
  est_jaccard == 1.0,
- shingle multiplicity and word order within repeats cannot change a
  min (duplicates-kept explode is min-safe).
"""

from __future__ import annotations

import hashlib
import random
import re

import pytest

from my_flink_1_10_2_spark.llm.dedup import minhash_lsh_pairs, minhash_signatures


def _ref_shingles(text: str, n: int):
    words = re.split(r"\s+", text)
    if len(words) < n:
        return {" ".join(words[:n])}  # short docs keep their one gram
    return {" ".join(words[i : i + n]) for i in range(len(words) - n + 1)}


def _ref_signature(text: str, n: int, num_hashes: int):
    sig = []
    shingles = _ref_shingles(text, n)
    for i in range(num_hashes):
        g, lo = i // 4, (i % 4) * 8
        best = None
        for s in shingles:
            hx = hashlib.md5(f"{g}|{s}".encode()).hexdigest()[lo : lo + 8]
            v = int(hx, 16)
            best = v if best is None or v < best else best
        sig.append(best)
    return sig


def _docs(rng: random.Random, n_docs: int):
    vocab = ["red", "blue", "fox", "jumps", "river", "stone", "wind", "a"]
    out = []
    for i in range(n_docs):
        words = [rng.choice(vocab) for _ in range(rng.randint(1, 14))]
        out.append((i, " ".join(words)))
    return out


@pytest.mark.parametrize("trial", range(3))
def test_minhash_signatures_match_hashlib_reference(spark, trial):
    rng = random.Random(970 + trial)
    docs = _docs(rng, rng.randint(2, 10))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: list(r["sig"])
        for r in minhash_signatures(df, num_hashes=16).collect()
    }
    for doc_id, text in docs:
        assert got[doc_id] == _ref_signature(text, 3, 16), (
            f"trial {trial} doc={text!r}"
        )


def test_exact_duplicates_always_pair_with_jaccard_one(spark):
    rng = random.Random(975)
    base = _docs(rng, 6)
    # clone half the docs under new ids — exact dups MUST surface
    dups = [(i + 100, t) for i, t in base[:3]]
    df = spark.createDataFrame(base + dups, "doc_id long, text string")
    pairs = {
        (r["doc1"], r["doc2"]): r["est_jaccard"]
        for r in minhash_lsh_pairs(df, threshold=0.5).collect()
    }
    for i, _ in base[:3]:
        assert pairs.get((i, i + 100)) == pytest.approx(1.0), (
            f"exact duplicate ({i},{i + 100}) missing or below 1.0: {pairs}"
        )


def test_shingle_multiplicity_cannot_change_signature(spark):
    """Repeating a document's content (same shingle set, wildly different
    multiplicities) must not move any min."""
    text = "wind river stone wind river stone wind river stone wind river"
    body = " ".join([text] * 5)
    # same shingle SET: the repetition wraps around identically
    df = spark.createDataFrame(
        [(1, body), (2, body + " " + text)], "doc_id long, text string"
    )
    sigs = {
        r["doc_id"]: list(r["sig"]) for r in minhash_signatures(df).collect()
    }
    # reference equality: both documents' shingle SETS are equal
    assert _ref_shingles(body, 3) == _ref_shingles(body + " " + text, 3)
    assert sigs[1] == sigs[2]
