"""Determinism and nesting laws for the hash-based sampling family
(llm/sampling.py) — the properties a training-data pipeline relies on
when it re-runs a sample at a different rate or scale:

- decisions are a pure function of (key, seed): re-evaluation and
  physical layout cannot change membership,
- nesting: the sample at fraction f1 is a SUBSET of the sample at
  f2 >= f1 under the same seed (consistent sampling — growing a sample
  never churns previously selected documents),
- stratified fractions apply per stratum with the same nesting,
- split_assign is a partition (every row in exactly one split),
- consistent_topn is stable: the top-n at n1 is a prefix of top-n at
  n2 >= n1.
"""

from __future__ import annotations

import random

import pytest

from my_flink_1_10_2_spark.llm.sampling import (
    consistent_topn,
    sample_uniform,
    split_assign,
)


def _keys(rng: random.Random, n: int):
    return [(i, rng.randint(0, 4)) for i in range(n)]


@pytest.mark.parametrize("trial", range(2))
def test_uniform_sampling_is_deterministic_and_nested(spark, trial):
    rng = random.Random(1010 + trial)
    rows = _keys(rng, 400)
    df = spark.createDataFrame(rows, "doc_id long, g long")
    f1, f2 = sorted([rng.uniform(0.1, 0.5), rng.uniform(0.5, 0.95)])
    s1 = {r["doc_id"] for r in sample_uniform(df, "doc_id", f1, seed="s").collect()}
    s1_again = {
        r["doc_id"]
        for r in sample_uniform(df.repartition(17), "doc_id", f1, seed="s").collect()
    }
    s2 = {r["doc_id"] for r in sample_uniform(df, "doc_id", f2, seed="s").collect()}
    assert s1 == s1_again, "membership must not depend on layout"
    assert s1 <= s2, f"nesting violated: f1={f1} f2={f2}"
    # a different seed decorrelates (statistically certain at 400 keys)
    s1_other = {
        r["doc_id"] for r in sample_uniform(df, "doc_id", f1, seed="t").collect()
    }
    assert s1 != s1_other


def test_split_assign_partitions_every_row_exactly_once(spark):
    rng = random.Random(1020)
    rows = _keys(rng, 300)
    df = spark.createDataFrame(rows, "doc_id long, g long")
    out = split_assign(df, "doc_id", train=0.8, valid=0.1, seed="s").collect()
    assert len(out) == len(rows)
    assert {r["doc_id"] for r in out} == {i for i, _ in rows}
    splits = {r["split"] for r in out}
    assert splits <= {"train", "valid", "test"}
    # deterministic under re-evaluation
    out2 = split_assign(
        df.repartition(9), "doc_id", train=0.8, valid=0.1, seed="s"
    ).collect()
    assert {(r["doc_id"], r["split"]) for r in out} == {
        (r["doc_id"], r["split"]) for r in out2
    }


def test_consistent_topn_is_prefix_stable(spark):
    rng = random.Random(1030)
    rows = _keys(rng, 250)
    df = spark.createDataFrame(rows, "doc_id long, g long")
    t10 = {r["doc_id"] for r in consistent_topn(df, "doc_id", 10, seed="s").collect()}
    t50 = {r["doc_id"] for r in consistent_topn(df, "doc_id", 50, seed="s").collect()}
    assert len(t10) == 10 and len(t50) == 50
    assert t10 <= t50, "growing n must only ADD members"
