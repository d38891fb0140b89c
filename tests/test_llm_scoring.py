"""Model-property tests for the round-8 LLM scoring/sampling operators:
Kneser-Ney bigram smoothing, temperature-scaled mixture sampling, and
SemDeDup pruning.  Bitwise oracle parity is separately swept by
tools/exact_sweep.py; these tests assert the *mathematical* properties
the oracles cannot express (probabilities sum to 1, monotone rates,
keep-one-per-group)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from my_flink_1_10_2_spark.queries import read
from my_flink_1_10_2_spark.queries.llm import (
    q_kneser_ney_score,
    q_semdedup_prune,
    q_temperature_mixture,
)
from tests.conftest import SF_DIR


def test_kneser_ney_is_a_probability_model(spark):
    """For every observed context w1, sum over OBSERVED w2 of
    P_KN(w2|w1) must be <= 1 (the continuation mass covers the unseen
    tail), and every log-prob must be strictly negative for contexts
    with >= 2 distinct successors."""
    docs = read(spark, SF_DIR, "documents").limit(40)
    tok = docs.select(
        "doc_id",
        F.filter(F.split(F.lower("text"), r"\s+"), lambda t: t != "").alias("t"),
    ).where(F.size("t") >= 2)
    bg = tok.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("t") - 2),
                lambda i: F.struct(
                    F.col("t")[i].alias("w1"), F.col("t")[i + 1].alias("w2")
                ),
            )
        ).alias("p")
    ).select("p.w1", "p.w2")
    pdf = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c")).toPandas()
    c_bg = {(r.w1, r.w2): r.c for r in pdf.itertuples()}
    c_ctx: dict[str, int] = {}
    n1p_fwd: dict[str, int] = {}
    n1p_bwd: dict[str, int] = {}
    for (w1, w2), c in c_bg.items():
        c_ctx[w1] = c_ctx.get(w1, 0) + c
        n1p_fwd[w1] = n1p_fwd.get(w1, 0) + 1
        n1p_bwd[w2] = n1p_bwd.get(w2, 0) + 1
    n_types = len(c_bg)
    D = 0.75

    def p_kn(w1, w2):
        return max(c_bg[(w1, w2)] - D, 0.0) / c_ctx[w1] + (
            D * n1p_fwd[w1] / c_ctx[w1]
        ) * (n1p_bwd[w2] / n_types)

    for w1 in list(c_ctx)[:200]:
        mass = sum(p_kn(w1, w2) for (a, w2) in c_bg if a == w1)
        assert mass <= 1.0 + 1e-9, f"context {w1!r} over-allocates mass {mass}"
        if n1p_fwd[w1] >= 2:
            assert all(
                math.log(p_kn(w1, w2)) < 0 for (a, w2) in c_bg if a == w1
            )


def test_kneser_ney_query_shape(spark):
    out = q_kneser_ney_score(spark, SF_DIR)
    rows = out.collect()
    assert rows, "no docs scored"
    assert all(r.doc_id % 7 == 0 for r in rows)
    assert all(r.n_bigrams >= 1 and r.kn_score < 0 for r in rows)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, "KN scoring must not use windows"


def test_temperature_mixture_rates_monotone_and_bounded(spark):
    """Bigger sources must never get a HIGHER keep rate; the largest
    source keeps everything (rate == 1e6 ppm); observed sample sizes
    stay inside a generous binomial envelope of the quantized rate."""
    out = q_temperature_mixture(spark, SF_DIR).collect()
    assert len(out) >= 2, "fixture should have several sources"
    by_n = sorted(out, key=lambda r: r.n_docs)
    for lo, hi in zip(by_n, by_n[1:]):
        assert lo.keep_ppm <= hi.keep_ppm
    top = by_n[-1]
    assert top.keep_ppm == 1_000_000 and top.n_sampled == top.n_docs
    for r in out:
        expect = r.n_docs * r.keep_ppm / 1e6
        slack = 4 * math.sqrt(max(expect, 1.0)) + 2
        assert abs(r.n_sampled - expect) <= slack, (
            f"{r.source}: sampled {r.n_sampled}, expected ~{expect:.1f}"
        )
        assert 0 <= r.n_sampled <= r.n_docs


def test_temperature_mixture_flattens_the_head(spark):
    """alpha < 1 must shrink the head/tail ratio: the sampled corpus is
    more balanced than the raw corpus."""
    out = q_temperature_mixture(spark, SF_DIR).collect()
    raw = {r.source: r.n_docs for r in out}
    smp = {r.source: max(r.n_sampled, 1) for r in out}
    raw_ratio = max(raw.values()) / max(min(raw.values()), 1)
    smp_ratio = max(smp.values()) / min(smp.values())
    assert smp_ratio <= raw_ratio + 1e-9


def test_semdedup_keeps_one_representative_per_pair(spark):
    """Every cluster keeps >= 1 vector; dropped counts match an
    independent replay of the drop rule (dst side of any over-threshold
    within-cluster pair)."""
    from my_flink_1_10_2_spark.llm.dedup import semantic_neardup_pairs_ivf

    report = {r.centroid: r for r in q_semdedup_prune(spark, SF_DIR).collect()}
    assert report, "no clusters"
    emb = read(spark, SF_DIR, "embeddings")
    pairs = semantic_neardup_pairs_ivf(emb, threshold=0.30, n_centroids=8).collect()
    dropped: dict[int, set[int]] = {}
    for p in pairs:
        dropped.setdefault(p.centroid, set()).add(p.dst)
    # a dst can never drop the globally smallest id of its cluster: the
    # min id only ever appears as src
    for c, r in report.items():
        want = len(dropped.get(c, set()))
        assert r.n_dropped == want
        assert r.n_kept == r.n_vectors - want
        assert r.n_kept >= 1
    total = sum(r.n_vectors for r in report.values())
    assert total == emb.count(), "every vector must be assigned exactly once"


def test_hard_negatives_label_constraint_and_ordering(spark):
    """Every mined negative must carry a different label than its
    anchor, and the ranking must be the best-among-negatives order —
    i.e. filtering an unlabeled top-k afterwards produces a DIFFERENT
    (wrong) set whenever a same-label vector sits in the unlabeled
    top-k."""
    from my_flink_1_10_2_spark.llm import similarity as S

    emb = read(spark, SF_DIR, "embeddings")
    anchors = emb.where(F.col("vec_id") % 25 == 0)
    mined = S.hard_negatives(emb, anchors, k=3).collect()
    labels = {r.vec_id: r.label for r in emb.select("vec_id", "label").collect()}
    assert mined, "no negatives mined"
    by_anchor: dict[int, list] = {}
    for r in mined:
        assert labels[r.vec_id] != labels[r.anchor_id], (
            f"negative {r.vec_id} shares label with anchor {r.anchor_id}"
        )
        assert r.vec_id != r.anchor_id
        by_anchor.setdefault(r.anchor_id, []).append(r)
    for aid, rows in by_anchor.items():
        rows.sort(key=lambda r: r.rank)
        sims = [r.sim for r in rows]
        assert sims == sorted(sims, reverse=True)
        assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
        # exhaustive replay for this anchor: best-among-negatives
        import numpy as np

        all_rows = emb.select("vec_id", "embedding", "label").collect()
        a_vec = np.array(
            next(r.embedding for r in all_rows if r.vec_id == aid), dtype="float64"
        )
        a_vec /= np.linalg.norm(a_vec)
        scored = []
        for r in all_rows:
            if r.vec_id == aid or r.label == labels[aid]:
                continue
            v = np.array(r.embedding, dtype="float64")
            scored.append((float(a_vec @ (v / np.linalg.norm(v))), r.vec_id))
        scored.sort(key=lambda t: (-t[0], t[1]))
        assert [r.vec_id for r in rows] == [vid for _, vid in scored[:3]]
        break  # one anchor's exhaustive replay is enough


def test_winnowing_guarantee_and_density(spark):
    """The winnowing guarantee: two documents sharing a run of
    >= k + w - 1 = 8 tokens share at least one fingerprint.  Density
    stays near the theoretical 2/(w+1)."""
    from my_flink_1_10_2_spark.llm.dedup import winnowing_fingerprints

    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    rows = [
        (1, f"unique one {shared} trailing words here"),
        (2, f"other prefix text {shared} different suffix"),
        (3, "completely disjoint vocabulary nothing matches at all ok"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # reconstruct the selected fingerprint HASHES per doc (not just the
    # aggregate) by re-running the packing logic via the public op on
    # single-doc frames and comparing sums is too weak: instead assert
    # the guarantee on the aggregate level by checking doc1/doc2 share
    # fingerprints through an exact intersection replay in python
    import hashlib

    def fps(text, k=4, w=5):
        t = [x for x in text.lower().split() if x]
        grams = [" ".join(t[i : i + k]) for i in range(len(t) - k + 1)]
        keys = [
            (int(hashlib.md5(g.encode()).hexdigest()[:10], 16) * 1048576
             + (1048575 - p))
            for p, g in enumerate(grams)
        ]
        sel = {min(keys[e - w + 1 : e + 1]) for e in range(w - 1, len(keys))}
        return {s // 1048576 for s in sel}

    f1, f2, f3 = (fps(r[1]) for r in rows)
    assert f1 & f2, "shared 8-token run must share a fingerprint"
    assert not (f1 & f3) and not (f2 & f3)
    out = {r.doc_id: r for r in winnowing_fingerprints(df).collect()}
    for doc_id, text in rows:
        want = fps(text)
        assert out[doc_id].n_fps == len(want)
        assert out[doc_id].fp_hash_sum == sum(want)
    # density on the real fixture: ~2/(w+1)=0.33, generously bounded
    docs = read(spark, SF_DIR, "documents")
    agg = winnowing_fingerprints(docs).agg(
        F.sum("n_fps").alias("f"), F.sum("n_grams").alias("g")
    ).collect()[0]
    assert 0.15 <= agg.f / agg.g <= 0.6


def test_set_similarity_join_no_false_negatives(spark):
    """Prefix filtering must be LOSSLESS: every pair the brute-force
    3-gram Jaccard finds at the threshold must come out of the
    prefix-filtered join, with identical similarity values — and the
    join must emit at least one pair on a fixture containing planted
    near-duplicates."""
    from my_flink_1_10_2_spark.llm.dedup import set_similarity_join, shingles

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (1, base),
        (2, base + " extra"),                      # near-dup of 1
        (3, "totally different words here folks"),
        (4, base.replace("delta", "DELTA-X")),     # moderate overlap
        (5, "another unrelated string of text ok"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.src, r.dst): r.jaccard
        for r in set_similarity_join(df, threshold=0.5).collect()
    }
    # brute force over the same shingle sets
    sets = {}
    for r in shingles(df, n=3).collect():
        sets.setdefault(r.doc_id, set()).add(r.shingle)
    want = {}
    ids = sorted(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            inter = len(sets[a] & sets[b])
            jac = inter / len(sets[a] | sets[b])
            if jac >= 0.5:
                want[(a, b)] = round(jac, 9)
    assert want, "fixture must contain a qualifying pair"
    assert got == want


def test_set_similarity_join_prunes_candidates(spark):
    """On the real fixture the prefix join must generate far fewer
    candidate pairs than the n^2 cross product (the filter's point)."""
    from my_flink_1_10_2_spark.llm.dedup import set_similarity_join

    docs = read(spark, SF_DIR, "documents")
    n = docs.count()
    out = set_similarity_join(docs, threshold=0.5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan
    pairs = out.count()
    assert pairs < n * (n - 1) / 20, "prefix filter did not prune"
