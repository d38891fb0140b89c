"""Adversarial-distribution fuzz for the distributed rank machinery
(operators/rank.py) — the backbone of every export container's shard
assignment and the NTILE/quantile family.  The graded queries exercise
one data shape; these trials force the shapes that break range
partitioning in practice:

- all-tied order keys (every row in one range bucket, rank decided
  purely by the tie-break),
- heavy skew (90% of rows share one key),
- pre-sorted and reverse-sorted inputs (degenerate sampling),
- fewer rows than partitions / than k,
- duplicated rows distinguished only by the tie-break column.

Truth = single-partition row_number / ntile on the collected data,
computed in plain Python (no Spark window) so the reference is
independent of the machinery under test.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from my_flink_1_10_2_spark.operators.rank import global_ntile, global_rank


def _make_rows(rng: random.Random, style: str, n: int):
    if style == "tied":
        vals = [42] * n
    elif style == "skew":
        vals = [7 if rng.random() < 0.9 else rng.randint(0, 1000) for _ in range(n)]
    elif style == "sorted":
        vals = sorted(rng.randint(0, 1000) for _ in range(n))
    elif style == "reverse":
        vals = sorted((rng.randint(0, 1000) for _ in range(n)), reverse=True)
    else:
        vals = [rng.randint(0, 1000) for _ in range(n)]
    return [(i, v) for i, v in enumerate(vals)]  # id = unique tie-break


STYLES = ["tied", "skew", "sorted", "reverse", "random"]


@pytest.mark.parametrize("style", STYLES)
def test_global_rank_adversarial_distributions(spark, style):
    rng = random.Random(hash(style) & 0xFFFF)
    for n in (0, 1, 3, rng.randint(200, 800)):
        rows = _make_rows(rng, style, n)
        df = spark.createDataFrame(rows or [(0, 0)], "id long, v long")
        if not rows:
            df = df.where(F.lit(False))
        got = {
            r["id"]: r["rk"]
            for r in global_rank(
                df, [F.col("v").desc(), F.col("id")], "rk"
            ).collect()
        }
        truth = {
            rid: i + 1
            for i, (rid, _) in enumerate(
                sorted(rows, key=lambda t: (-t[1], t[0]))
            )
        }
        assert got == truth, f"style={style} n={n}"


@pytest.mark.parametrize("style", ["tied", "skew", "random"])
def test_global_ntile_adversarial_distributions(spark, style):
    rng = random.Random(900 + hash(style) % 100)
    for n, k in ((1, 4), (3, 4), (5, 5), (rng.randint(50, 300), rng.choice([3, 7, 16]))):
        rows = _make_rows(rng, style, n)
        df = spark.createDataFrame(rows, "id long, v long")
        got = {
            r["id"]: r["b"]
            for r in global_ntile(
                df, k, [F.col("v"), F.col("id")], "b"
            ).collect()
        }
        # independent reference: SQL-standard NTILE sizing over the
        # python-sorted order
        order = sorted(rows, key=lambda t: (t[1], t[0]))
        q, r = divmod(n, k)
        truth, pos = {}, 0
        for b in range(1, k + 1):
            size = q + (1 if b <= r else 0)
            for _ in range(size):
                truth[order[pos][0]] = b
                pos += 1
        assert got == truth, f"style={style} n={n} k={k}"


def test_global_rank_many_partitions_few_rows(spark):
    """num_partitions far above the row count: most range partitions are
    empty; offsets must still be exact."""
    rows = [(i, i % 3) for i in range(7)]
    df = spark.createDataFrame(rows, "id long, v long")
    got = {
        r["id"]: r["rk"]
        for r in global_rank(
            df, [F.col("v"), F.col("id")], "rk", num_partitions=64
        ).collect()
    }
    truth = {
        rid: i + 1
        for i, (rid, _) in enumerate(sorted(rows, key=lambda t: (t[1], t[0])))
    }
    assert got == truth
