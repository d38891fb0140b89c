"""Corpus integrity manifests — Merkle-style shard digests so a 100 TB
corpus hand-off can be verified without re-reading the data twice: each
shard gets an order-sensitive digest of its rows' content hashes, and
the manifest root commits to every shard.  Any flipped byte, dropped
row, reordered shard, or silently-truncated transfer changes the root.

Everything is built from JVM expressions only (md5, sorted collect,
concat): one shuffle keyed on the contiguous shard id — the same
global-rank sharding the export sinks use — then a single root fold
over the shard-count-sized manifest.  No Python in the data path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def row_digest(cols: list[str]) -> "F.Column":
    """Canonical per-row content hash: md5 over '|'-joined string casts
    (the cross-engine-stable serialization used by the dedup family)."""
    return F.md5(F.concat_ws("|", *[F.col(c).cast("string") for c in cols]))


def merkle_manifest(
    df: DataFrame,
    key_col: str,
    cols: list[str],
    rows_per_shard: int = 200,
) -> DataFrame:
    """Shard-level Merkle manifest.

    Rows are assigned contiguous global-rank shard ranges on ``key_col``
    (range-partitioned — never one task), each shard's digest is
    ``md5(concat of its row digests in key order)``, and every output
    row carries the manifest ROOT ``md5(concat of shard digests in
    shard order)`` so a consumer can verify both a single shard and the
    whole corpus.

    Output: (shard_id, n_rows, first_key, last_key, shard_digest,
    root_digest).
    """
    from my_flink_1_10_2_spark.operators.hints import dim
    from my_flink_1_10_2_spark.operators.rank import global_rank

    ranked = global_rank(
        df.select(key_col, *[c for c in cols if c != key_col]),
        [F.asc(key_col)],
        rank_col="__rk",
    )
    sharded = ranked.select(
        ((F.col("__rk") - 1) / rows_per_shard).cast("bigint").alias("shard_id"),
        F.col(key_col).alias("__key"),
        row_digest(cols).alias("__rd"),
    )
    shards = sharded.groupBy("shard_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.min("__key").cast("bigint").alias("first_key"),
        F.max("__key").cast("bigint").alias("last_key"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("__key"), F.col("__rd")))
                    ),
                    lambda s: s["__rd"],
                ),
                "",
            )
        ).alias("shard_digest"),
    )
    root = shards.agg(
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("shard_id", "shard_digest"))
                    ),
                    lambda s: s["shard_digest"],
                ),
                "",
            )
        ).alias("root_digest")
    )
    return shards.join(dim(root))
