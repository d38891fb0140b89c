"""Randomized algebraic laws for the upsert/changelog operators
(operators/upsert.py) — the retraction-story batch half:

1. `upsert_materialize` equals a plain-Python latest-wins fold.
2. Incremental == batch: applying the changelog micro-batch by
   micro-batch with `apply_upsert_batch` lands on the same snapshot as
   one global `upsert_materialize`.
3. Diff/apply inverse: `table_diff(old, new)` replayed onto `old` as an
   upsert batch reproduces `new` exactly — including NULL payloads,
   NULL-to-value and value-to-NULL updates.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from my_flink_1_10_2_spark.operators.upsert import (
    apply_upsert_batch,
    table_diff,
    upsert_materialize,
)

SCHEMA = "k string, ver long, v long, op string"


def _changelog(rng: random.Random, n: int):
    """Random keyed changelog with strictly monotone version per key."""
    keys = ["a", "b", "c", "d"]
    ver = {k: 0 for k in keys}
    out = []
    for _ in range(n):
        k = rng.choice(keys)
        ver[k] += rng.randint(1, 3)
        op = "D" if rng.random() < 0.25 else "U"
        v = None if rng.random() < 0.2 else rng.randint(1, 99)
        out.append((k, ver[k], v, op))
    return out


def _fold(rows):
    """Latest-wins reference snapshot: dict key -> (ver, v) or absent."""
    latest: dict[str, tuple] = {}
    for k, ver, v, op in rows:
        if k not in latest or ver > latest[k][0]:
            latest[k] = (ver, v, op)
    return {
        k: (ver, v) for k, (ver, v, op) in latest.items() if op != "D"
    }


@pytest.mark.parametrize("trial", range(4))
def test_materialize_and_incremental_agree_with_fold(spark, trial):
    rng = random.Random(930 + trial)
    rows = _changelog(rng, rng.randint(1, 40))
    df = spark.createDataFrame(rows, SCHEMA)
    truth = _fold(rows)

    snap = {
        r["k"]: (r["ver"], r["v"])
        for r in upsert_materialize(df, ["k"], "ver").collect()
    }
    assert snap == truth, f"trial {trial}"

    # incremental replay in random micro-batch cuts
    cuts = sorted(rng.sample(range(1, len(rows) + 1), min(3, len(rows))))
    bounds = [0, *cuts]
    if bounds[-1] != len(rows):
        bounds.append(len(rows))
    state = spark.createDataFrame([], "k string, ver long, v long")
    for lo, hi in zip(bounds, bounds[1:]):
        batch = spark.createDataFrame(rows[lo:hi], SCHEMA)
        # collapse the batch to one message per key first (contract)
        collapsed = upsert_materialize(batch, ["k"], "ver").withColumn(
            "op", F.lit("U")
        )
        # keys whose LATEST in-batch message was a delete
        latest_all = {
            r["k"]: r
            for r in batch.collect()
            if all(
                r["ver"] >= r2["ver"]
                for r2 in batch.collect()
                if r2["k"] == r["k"]
            )
        }
        dels = [
            (k, row["ver"], None, "D")
            for k, row in latest_all.items()
            if row["op"] == "D"
        ]
        if dels:
            collapsed = collapsed.unionByName(
                spark.createDataFrame(dels, SCHEMA)
            )
        state = apply_upsert_batch(state, collapsed, ["k"]).localCheckpoint()
    inc = {r["k"]: (r["ver"], r["v"]) for r in state.collect()}
    assert inc == truth, f"trial {trial} (incremental)"


@pytest.mark.parametrize("trial", range(4))
def test_table_diff_apply_roundtrip(spark, trial):
    """old + table_diff(old, new) == new, with NULL payload traffic."""
    rng = random.Random(940 + trial)
    keys = [f"k{i}" for i in range(10)]

    def snap():
        return [
            (k, None if rng.random() < 0.25 else rng.randint(1, 9), rng.randint(1, 5))
            for k in rng.sample(keys, rng.randint(0, len(keys)))
        ]

    old_rows, new_rows = snap(), snap()
    old = spark.createDataFrame(old_rows, "k string, v long, w long")
    new = spark.createDataFrame(new_rows, "k string, v long, w long")
    diff = table_diff(old, new, ["k"])
    # replay: I/U carry the new payload, D deletes
    batch = diff.select(
        "k",
        F.col("new_v").alias("v"),
        F.col("new_w").alias("w"),
        F.when(F.col("op") == "D", F.lit("D")).otherwise(F.lit("U")).alias("op"),
    )
    replayed = {
        (r["k"], r["v"], r["w"])
        for r in apply_upsert_batch(old, batch, ["k"]).collect()
    }
    assert replayed == set(new_rows), f"trial {trial}"
    # unchanged keys must be absent from the diff
    unchanged = {r for r in old_rows if r in set(new_rows)}
    diff_keys = {r["k"] for r in diff.collect()}
    assert all(k not in diff_keys for k, _, _ in unchanged), f"trial {trial}"
