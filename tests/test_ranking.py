"""BM25 ranking (`llm/ranking.py`): scoring properties, statistics
contracts, and plan discipline."""

import math

import pytest
from pyspark.sql import functions as F

from my_flink_1_10_2_spark.llm.ranking import bm25_rank, bm25_term_scores


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "hash join hash table hash"),            # tf(hash)=3, dl=5
        (2, "hash"),                                  # tf(hash)=1, dl=1
        (3, "merge sort merge"),                      # no 'hash'
        (4, "a long document about nothing at all with many words inside"),
    ]
    return spark.createDataFrame(rows, "doc_id int, text string")


def test_term_scores_shape_and_exclusions(docs):
    out = bm25_term_scores(docs, ["hash", "merge"]).collect()
    hits = {(r["doc_id"], r["term"]) for r in out}
    assert hits == {(1, "hash"), (2, "hash"), (3, "merge")}
    by = {(r["doc_id"], r["term"]): r for r in out}
    assert by[(1, "hash")]["tf"] == 3 and by[(1, "hash")]["dl"] == 5
    assert by[(2, "hash")]["dl"] == 1


def test_idf_uses_full_corpus_n(docs):
    """Doc 4 has no query term but must still count in N and avgdl."""
    full = {
        (r["doc_id"], r["term"]): r["score"]
        for r in bm25_term_scores(docs, ["hash"]).collect()
    }
    smaller = {
        (r["doc_id"], r["term"]): r["score"]
        for r in bm25_term_scores(docs.filter("doc_id != 4"), ["hash"]).collect()
    }
    # N drops 4->3 and avgdl changes => scores must differ
    assert full[(1, "hash")] != smaller[(1, "hash")]


def test_tf_saturation_bound(docs):
    """Each term score is < idf * (k1 + 1) — the BM25 saturation
    ceiling — and grows sublinearly in tf."""
    k1 = 1.2
    rows = bm25_term_scores(docs, ["hash"], k1=k1).collect()
    n = 4
    df_ = 2
    idf = math.log((n - df_ + 0.5) / (df_ + 0.5) + 1.0)
    for r in rows:
        assert 0 < r["score"] < idf * (k1 + 1.0)


def test_length_normalization_direction(spark):
    """Same tf, longer doc => lower score when b > 0."""
    docs = spark.createDataFrame(
        [(1, "hash " + "filler " * 3), (2, "hash " + "filler " * 30)],
        "doc_id int, text string",
    )
    by = {
        r["doc_id"]: r["score"]
        for r in bm25_term_scores(docs, ["hash"]).collect()
    }
    assert by[1] > by[2]


def test_rank_orders_by_total_and_breaks_ties_by_id(docs):
    out = bm25_rank(docs, ["hash", "merge"], k=10).collect()
    ranks = [r["rank"] for r in out]
    assert ranks == list(range(1, len(out) + 1))
    totals = [r["score_e6"] for r in out]
    assert totals == sorted(totals, reverse=True)


def test_empty_terms_raise(docs):
    with pytest.raises(ValueError, match="at least one query term"):
        bm25_term_scores(docs, [])


def test_no_single_task_window_on_corpus(docs):
    """The global top-k must plan as TakeOrderedAndProject, not a
    corpus-wide Window over Exchange SinglePartition."""
    plan = bm25_rank(docs, ["hash"], k=5)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_score_e6_is_rounded_score(docs):
    for r in bm25_term_scores(docs, ["hash", "merge"]).collect():
        assert r["score_e6"] == int(
            __import__("decimal").Decimal(r["score"] * 1e6).quantize(
                0, rounding="ROUND_HALF_UP"
            )
        )
