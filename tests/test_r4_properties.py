"""Independent-oracle property tests for the round-4 operators: each op
re-implemented in plain Python (hashlib/collections/math — no Spark, no
DuckDB) and compared on randomized inputs.  This is the third leg of the
evidence stool next to the DuckDB oracle and the plan gates."""

import hashlib
import math
from collections import Counter

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

WORDS = ["the", "table", "hash", "merge", "sort", "row", "key", "值", "a1", "#"]


def _doc_strategy():
    return st.lists(st.sampled_from(WORDS), min_size=0, max_size=30).map(" ".join)


@st.composite
def _corpus(draw, min_docs=1, max_docs=8):
    n = draw(st.integers(min_docs, max_docs))
    return [(i, draw(_doc_strategy())) for i in range(n)]


# --- feature hashing: exact equality vs hashlib re-implementation ----------


def _fh_ref(text, num_features=16, seed=0):
    out = [0] * num_features
    for w in text.lower().split():
        if not w:
            continue
        h = int(hashlib.md5(f"fh|{seed}|{w}".encode()).hexdigest()[:15], 16)
        out[h % num_features] += 1 if h % 2 == 0 else -1
    return out


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(_corpus())
def test_feature_hash_matches_reference(spark, corpus):
    from my_flink_1_10_2_spark.llm.text import feature_hash

    df = spark.createDataFrame(corpus, "doc_id int, text string")
    got = {r["doc_id"]: list(r["fh"]) for r in feature_hash(df, num_features=16).collect()}
    for i, text in corpus:
        assert got[i] == _fh_ref(text), (i, text)


# --- BM25: float equality vs a straight-line Python implementation ---------


def _bm25_ref(corpus, terms, k1=1.2, b=0.75):
    toks = {i: [w for w in t.lower().split() if w] for i, t in corpus}
    dl = {i: len(ws) for i, ws in toks.items() if ws}
    n = len(corpus)
    dl_sum = sum(dl.values())
    out = {}
    tf = {(i, w): c for i, ws in toks.items() for w, c in Counter(ws).items() if w in terms}
    df = Counter(w for (_, w) in tf)
    for (i, w), f in tf.items():
        idf = math.log((float(n) - float(df[w]) + 0.5) / (float(df[w]) + 0.5) + 1.0)
        avgdl = float(dl_sum) / float(n)
        score = (idf * (float(f) * (k1 + 1.0))) / (
            float(f) + k1 * ((1.0 - b) + (b * float(dl[i])) / avgdl)
        )
        out[(i, w)] = score
    return out


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(_corpus(min_docs=2))
def test_bm25_matches_reference_bitwise(spark, corpus):
    from my_flink_1_10_2_spark.llm.ranking import bm25_term_scores

    terms = ["hash", "table", "merge"]
    df = spark.createDataFrame(corpus, "doc_id int, text string")
    got = {
        (r["doc_id"], r["term"]): r["score"]
        for r in bm25_term_scores(df, terms).collect()
    }
    ref = _bm25_ref(corpus, set(terms))
    assert set(got) == set(ref)
    for key in ref:
        # identical IEEE operation sequence => identical bits
        assert got[key] == ref[key], key


# --- Gopher flags: exact equality vs a Python re-implementation ------------


def _gopher_ref(text, min_words=50, max_words=100_000):
    words = [w for w in __import__("re").split(r"\s+", text) if w != ""]
    lines = text.split("\n")
    n_words = len(words)
    n_chars = sum(len(w) for w in words)
    n_alpha = sum(1 for w in words if any(c.isalpha() and c.isascii() for c in w))
    n_sym = text.count("#") + text.count("…")
    # non-overlapping '...' like replace-based counting
    n_sym += (len(text) - len(text.replace("...", ""))) // 3
    n_bullet = sum(1 for l in lines if l.startswith(("•", "- ", "* ")))
    n_ellip = sum(1 for l in lines if l.endswith(("...", "…")))
    lower = {w.lower() for w in words}
    stops = sum(1 for s in ("the", "be", "to", "of", "and", "that", "have", "with") if s in lower)
    flags = dict(
        flag_word_count=int(min_words <= n_words <= max_words),
        flag_mean_word_len=int(3 * n_words <= n_chars <= 10 * n_words),
        flag_symbol_ratio=int(10 * n_sym <= n_words),
        flag_bullet_lines=int(10 * n_bullet <= 9 * len(lines)),
        flag_ellipsis_lines=int(10 * n_ellip <= 3 * len(lines)),
        flag_alpha_words=int(5 * n_alpha >= 4 * n_words),
        flag_stopwords=int(stops >= 2),
    )
    flags["passes_gopher"] = int(all(flags.values()))
    return flags


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.sampled_from(WORDS + ["...", "…", "- x", "word"]),
        min_size=0,
        max_size=80,
    )
)
def test_gopher_flags_match_reference(spark, tokens):
    from my_flink_1_10_2_spark.llm.text import gopher_flags

    text = " ".join(tokens)
    df = spark.createDataFrame([(1, text)], "doc_id int, text string")
    row = gopher_flags(df).collect()[0]
    ref = _gopher_ref(text)
    for k, v in ref.items():
        assert row[k] == v, (k, text)


# --- PQ encode: exact equality vs a plain-Python argmin --------------------


def test_pq_encode_matches_python_reference(spark):
    import numpy as np

    from my_flink_1_10_2_spark.llm import pq as P

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cb = P.pq_codebooks(emb, m=4, ksub=8)
    got = {r["vec_id"]: list(r["codes"]) for r in P.pq_encode(emb, cb).collect()}
    rows = emb.select("vec_id", "embedding").collect()
    dsub = len(cb[0][0])
    for r in rows:
        vi = [round(float(x) * 1000) for x in r["embedding"]]
        codes = []
        for i in range(4):
            sub = vi[i * dsub : (i + 1) * dsub]
            dists = [
                sum((a - b) * (a - b) for a, b in zip(sub, cent)) for cent in cb[i]
            ]
            codes.append(dists.index(min(dists)))  # first min = lowest idx
        assert got[r["vec_id"]] == codes, r["vec_id"]


# --- KMV set ops: exact equality vs hashlib set arithmetic -----------------


def _kmv_hash(v):
    return (int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16) + 1.0) / float(16 ** 15)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.sets(st.integers(0, 500), min_size=0, max_size=60),
    st.sets(st.integers(0, 500), min_size=0, max_size=60),
    st.sampled_from([8, 16, 256]),
)
def test_kmv_set_ops_match_reference(spark, sa, sb, k):
    from my_flink_1_10_2_spark.operators.sketch import kmv_set_ops

    dfa = spark.createDataFrame([(v,) for v in sa] or [(None,)], "v int").where(
        "v IS NOT NULL"
    )
    dfb = spark.createDataFrame([(v,) for v in sb] or [(None,)], "v int").where(
        "v IS NOT NULL"
    )
    row = kmv_set_ops(dfa, "v", dfb, "v", k=k).collect()[0]
    ha = sorted(_kmv_hash(v) for v in sa)[:k]
    hb = sorted(_kmv_hash(v) for v in sb)[:k]
    merged = sorted(set(ha) | set(hb))[:k]
    n_m = len(merged)
    c = sum(1 for h in merged if h in set(ha) and h in set(hb))
    est_a = float(len(ha)) if len(ha) < k else (k - 1.0) / ha[-1]
    est_u = float(n_m) if n_m < k else (k - 1.0) / merged[-1]
    if n_m == 0:
        jac = 0.0
    elif n_m < k:
        jac = float(c) / float(n_m)
    else:
        jac = float(c) / float(k)
    est_i = float(c) if n_m < k else jac * est_u
    assert row["est_a"] == est_a
    assert row["est_union"] == est_u
    assert row["jaccard"] == jac
    assert row["est_intersection"] == est_i


# --- Zipf: closed form on the quantized integers ---------------------------


def test_zipf_matches_closed_form(spark):
    from my_flink_1_10_2_spark.llm.text import zipf_fit

    words = []
    freqs = [50, 30, 20, 10, 5]
    for r, n in enumerate(freqs, start=1):
        words += [f"t{r}"] * n
    df = spark.createDataFrame([(1, " ".join(words))], "doc_id int, text string")
    row = zipf_fit(df, top_k=5).collect()[0]
    xq = [round(math.log(float(r)) * 1e9) for r in range(1, 6)]
    yq = [round(math.log(float(f)) * 1e9) for f in freqs]
    kk = 5
    sx, sy = sum(xq), sum(yq)
    sxy = sum(a * b for a, b in zip(xq, yq))
    sxx = sum(a * a for a in xq)
    slope = float(kk * sxy - sx * sy) / float(kk * sxx - sx * sx)
    assert row["slope"] == slope
    assert row["intercept"] == (float(sy) - slope * float(sx)) / float(kk) / 1e9
