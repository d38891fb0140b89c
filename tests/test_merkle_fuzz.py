"""Exact hashlib differential + partitioning-invariance law for the
Merkle shard manifest (operators/integrity.py) — the governance
artifact a 100 TB export is verified against, so its digests must be
reproducible outside the engine (that's the point of a manifest) and
independent of physical layout.
"""

from __future__ import annotations

import hashlib
import math
import random

import pytest


def _ref_manifest(rows, cols, rows_per_shard):
    """Plain-Python recompute: md5 row digests in key order, md5 of the
    concatenated hex digests per shard, md5 of shard digests as root."""
    ordered = sorted(rows, key=lambda r: r[0])
    shards = []
    for s in range(math.ceil(len(ordered) / rows_per_shard)):
        chunk = ordered[s * rows_per_shard : (s + 1) * rows_per_shard]
        digests = [
            hashlib.md5(
                "|".join(str(v) for v in r).encode()
            ).hexdigest()
            for r in chunk
        ]
        shards.append(
            {
                "shard_id": s,
                "n_rows": len(chunk),
                "first_key": chunk[0][0],
                "last_key": chunk[-1][0],
                "shard_digest": hashlib.md5("".join(digests).encode()).hexdigest(),
            }
        )
    root = hashlib.md5(
        "".join(sh["shard_digest"] for sh in shards).encode()
    ).hexdigest()
    return shards, root


@pytest.mark.parametrize("trial", range(3))
def test_merkle_manifest_matches_hashlib_and_ignores_layout(spark, trial):
    from my_flink_1_10_2_spark.operators.integrity import merkle_manifest

    rng = random.Random(1000 + trial)
    n = rng.randint(5, 60)
    rows = [(i, rng.randint(0, 9), f"s{rng.randint(0, 99)}") for i in range(n)]
    rng.shuffle(rows)
    rps = rng.choice([7, 20, 64])
    cols = ["k", "a", "b"]
    df = spark.createDataFrame(rows, "k long, a long, b string")
    want_shards, want_root = _ref_manifest(rows, cols, rps)

    for layout in (df, df.repartition(13), df.coalesce(1), df.orderBy(F_desc())):
        got = sorted(
            (
                r["shard_id"], r["n_rows"], r["first_key"], r["last_key"],
                r["shard_digest"], r["root_digest"],
            )
            for r in merkle_manifest(layout, "k", cols, rows_per_shard=rps).collect()
        )
        want = sorted(
            (
                sh["shard_id"], sh["n_rows"], sh["first_key"], sh["last_key"],
                sh["shard_digest"], want_root,
            )
            for sh in want_shards
        )
        assert got == want, f"trial {trial} rps={rps}"


def F_desc():
    from pyspark.sql import functions as F

    return F.col("k").desc()
