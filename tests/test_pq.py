"""Product-quantization ANN (`llm/pq.py`): encode determinism, ADC
exactness, compression contract, recall sanity, and the query-side cap
guard."""

import pytest
from pyspark.sql import functions as F

from my_flink_1_10_2_spark.llm import pq as P
from my_flink_1_10_2_spark.llm.similarity import cosine_topk_bruteforce

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_codebooks_shape_and_determinism(emb):
    cb1 = P.pq_codebooks(emb, m=4, ksub=8)
    cb2 = P.pq_codebooks(emb, m=4, ksub=8)
    assert cb1 == cb2
    assert len(cb1) == 4 and all(len(sub) == 8 for sub in cb1)
    dim = len(emb.select(F.size("embedding")).first()[0:1]) and emb.select(
        F.size("embedding").alias("d")
    ).first()["d"]
    assert all(len(c) == dim // 4 for sub in cb1 for c in sub)


def test_codebooks_validation(emb):
    with pytest.raises(ValueError, match="not divisible"):
        P.pq_codebooks(emb, m=7, ksub=4)
    with pytest.raises(ValueError, match="< ksub"):
        P.pq_codebooks(emb.limit(3), m=4, ksub=8)


def test_encode_codes_in_range_and_centroid_selfmatch(emb):
    cb = P.pq_codebooks(emb, m=4, ksub=8)
    coded = P.pq_encode(emb, cb)
    rows = coded.select("vec_id", "codes").collect()
    assert all(0 <= c < 8 for r in rows for c in r["codes"])
    # The ksub lowest-id vectors ARE the codebook: each must encode to
    # its own index in every subspace (distance 0 is the unique minimum
    # unless two codebook vectors tie, in which case the lower index
    # wins — either way the code is deterministic and <= its own index).
    own = {r["vec_id"]: r["codes"] for r in rows if r["vec_id"] < 8}
    ids = sorted(own)
    for rank, vid in enumerate(ids):
        assert all(c <= rank for c in own[vid])


def test_adc_distance_is_exact_sum_of_subdistances(emb):
    cb = P.pq_codebooks(emb, m=4, ksub=8)
    coded = {r["vec_id"]: r["codes"] for r in P.pq_encode(emb, cb).collect()}
    out = P.pq_topk_adc(emb, emb.filter("vec_id = 0"), k=3, m=4, ksub=8)
    rows = out.collect()
    q = emb.filter("vec_id = 0").select(
        F.transform("embedding", lambda x: F.round(x.cast("double") * 1000).cast("long")).alias("vi")
    ).first()["vi"]
    dsub = len(q) // 4
    for r in rows:
        expect = 0
        for i in range(4):
            cent = cb[i][coded[r["vec_id"]][i]]
            sub = q[i * dsub : (i + 1) * dsub]
            expect += sum((a - b) * (a - b) for a, b in zip(sub, cent))
        assert r["adist"] == expect


def test_recall_vs_bruteforce(emb):
    """PQ is lossy, but with data-derived codebooks the top-5 candidate
    sets must overlap the exact top-5 far above chance."""
    queries = emb.filter("vec_id < 5")
    exact = cosine_topk_bruteforce(emb, queries, k=5)
    approx = P.pq_topk_adc(emb, queries, k=5, m=4, ksub=16)
    e = {(r["query_id"], r["vec_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["vec_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    n = emb.count()
    assert recall >= 0.2, f"recall@5 {recall} (corpus {n})"


def test_query_cap_guard(emb, monkeypatch):
    monkeypatch.setattr(P, "_MAX_QUERY_ROWS", 3)
    with pytest.raises(ValueError, match="query set exceeds"):
        P.pq_topk_adc(emb, emb.filter("vec_id < 10"), k=2, m=4, ksub=8)


def test_rank_is_dense_per_query(emb):
    out = P.pq_topk_adc(emb, emb.filter("vec_id < 3"), k=4, m=4, ksub=8)
    for _, grp in __import__("itertools").groupby(
        sorted(out.collect(), key=lambda r: (r["query_id"], r["rank"])),
        key=lambda r: r["query_id"],
    ):
        ranks = [r["rank"] for r in grp]
        assert ranks == list(range(1, len(ranks) + 1))
