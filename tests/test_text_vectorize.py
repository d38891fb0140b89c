"""Round-4 text/embedding vectorization ops: feature hashing, Markov
transitions, per-dimension standardization."""

import math

import pytest
from pyspark.sql import functions as F

from my_flink_1_10_2_spark.llm.text import feature_hash
from my_flink_1_10_2_spark.llm.similarity import standardize_embeddings


def test_feature_hash_deterministic_and_dense(spark):
    docs = spark.createDataFrame(
        [(1, "alpha beta alpha"), (2, ""), (3, "ALPHA beta")],
        "doc_id int, text string",
    )
    out = {r["doc_id"]: list(r["fh"]) for r in feature_hash(docs, num_features=16).collect()}
    assert set(out) == {1, 2, 3}
    assert all(len(v) == 16 for v in out.values())
    assert out[2] == [0] * 16  # empty doc -> zero vector
    # case-folding: "ALPHA beta" and "alpha beta" hash identically
    docs2 = spark.createDataFrame([(9, "alpha beta")], "doc_id int, text string")
    ref = list(feature_hash(docs2, num_features=16).collect()[0]["fh"])
    assert out[3] == ref
    # repeated token doubles its signed contribution
    single = {i: v for i, v in enumerate(ref)}
    twice = {i: v for i, v in enumerate(out[1])}
    diff = [twice[i] - single[i] for i in range(16)]
    assert sum(1 for d in diff if d != 0) == 1  # exactly the alpha bucket moved
    assert sorted(map(abs, diff))[-1] == 1


def test_feature_hash_l1_bounded_by_token_count(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d e f g h i j")], "doc_id int, text string"
    )
    fh = list(feature_hash(docs, num_features=8).collect()[0]["fh"])
    assert sum(map(abs, fh)) <= 10


def test_standardize_moments(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    out = standardize_embeddings(emb)
    # standardized columns have ~0 mean and ~1 variance per dimension
    stats = (
        out.groupBy("i")
        .agg(F.avg("z").alias("mu"), F.avg(F.col("z") * F.col("z")).alias("s2"))
        .collect()
    )
    for r in stats:
        assert abs(r["mu"]) < 1e-9
        assert abs(r["s2"] - 1.0) < 1e-9


def test_standardize_zero_variance_dimension_is_null(spark):
    emb = spark.createDataFrame(
        [(0, [1.0, 5.0]), (1, [1.0, 7.0])], "vec_id long, embedding array<float>"
    )
    rows = standardize_embeddings(emb).collect()
    z0 = [r["z"] for r in rows if r["i"] == 0]
    z1 = [r["z"] for r in rows if r["i"] == 1]
    assert all(z is None for z in z0)  # constant dim
    assert sorted(round(z, 9) for z in z1) == [-1.0, 1.0]


def test_markov_rows_are_probability_matrix(spark):
    import __spark_entry__ as e

    out = e.queries()["q_markov_transitions"](spark, "/root/testdata/sf0.001")
    rows = out.collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r["src"], []).append(r)
    for src, grp in by_src.items():
        total_p = sum(r["p"] for r in grp)
        assert math.isclose(total_p, 1.0, rel_tol=1e-12), src
        n_src = sum(r["n"] for r in grp)
        for r in grp:
            assert math.isclose(r["p"], r["n"] / n_src, rel_tol=1e-15)


def test_zipf_fit_recovers_planted_exponent(spark):
    """A corpus drawn with freq(rank) = C * rank^-1.2 must fit slope
    ~= -1.2 (up to the quantization of integer counts)."""
    from my_flink_1_10_2_spark.llm.text import zipf_fit

    words = []
    for r in range(1, 51):
        n = max(1, round(10000 * r ** -1.2))
        words.extend([f"w{r:03d}"] * n)
    docs = spark.createDataFrame(
        [(1, " ".join(words))], "doc_id int, text string"
    )
    row = zipf_fit(docs, top_k=50).collect()[0]
    assert row["n_terms_fit"] == 50
    assert -1.25 < row["slope"] < -1.15, row["slope"]


def test_zipf_fit_uniform_corpus_slope_zero(spark):
    from my_flink_1_10_2_spark.llm.text import zipf_fit

    words = [f"w{r}" for r in range(40)] * 25
    docs = spark.createDataFrame([(1, " ".join(words))], "doc_id int, text string")
    row = zipf_fit(docs, top_k=40).collect()[0]
    assert abs(row["slope"]) < 1e-9


def test_flesch_reading_ease_known_values(spark):
    from my_flink_1_10_2_spark.llm.text import flesch_reading_ease

    docs = spark.createDataFrame(
        [
            (1, "The cat sat. The dog ran."),   # 6 words, 2 sentences, 6 syl
            (2, ""),                              # empty -> NULL
            (3, "Incomprehensibility notwithstanding."),  # polysyllabic
        ],
        "doc_id int, text string",
    )
    rows = {r["doc_id"]: r["f"] for r in docs.select(
        "doc_id", flesch_reading_ease("text").alias("f")).collect()}
    # doc 1: 206.835 - 1.015*(6/2) - 84.6*(6/6)
    assert abs(rows[1] - (206.835 - 1.015 * 3.0 - 84.6 * 1.0)) < 1e-12
    assert rows[2] is None
    assert rows[3] < rows[1]  # harder text scores lower
