"""Deterministic sampling / dataset-split operators for training-data
pipelines.

A 100 TB corpus is sampled with *content-derived* hash buckets, never
``rand()``: the same row always lands in the same bucket, so samples are
(a) reproducible across runs and stage retries, (b) consistent across
tables (joining a 10% sample of docs to a 10% sample of scores keyed the
same way yields the intersection, not 1%), and (c) oracle-checkable —
the md5 bucket computes identically in Spark and DuckDB.

Spark-first notes:
  * ``bucket_of`` is a pure codegen expression (md5 + conv + pmod); a
    sample is a plain ``filter`` that parquet scans can evaluate right
    after the scan — no shuffle, no driver involvement.
  * ``split_assign`` adds one derived column; downstream ``groupBy`` on
    the split label is an ordinary two-phase aggregate.
  * ``consistent_topn`` is the "stable N-row sample" idiom: global
    order by hash + LIMIT, which Spark executes as per-partition TopN
    followed by a single-reduce TopN — no full sort of the corpus.

Reference parity: the reference's DataSet sampling utilities
(flink-java/src/main/java/org/apache/flink/api/java/utils/DataSetUtils.java
``sample``/``sampleWithSize``) are RNG-based; we deliberately strengthen
them to content-hash sampling because RNG samples can't be replayed by an
SQL oracle and don't survive task retries deterministically.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: number of buckets the md5 space is folded into (percent granularity).
NUM_BUCKETS = 100


def bucket_of(col: Column | str, *, seed: str = "") -> Column:
    """Deterministic bucket in [0, NUM_BUCKETS) from a column's content.

    Folds the first 8 hex digits of ``md5(seed|value)`` into an int.
    DuckDB replay: ``('0x' || substr(md5(seed || '|' || v), 1, 8))::BIGINT
    % 100``.
    """
    key = F.concat(F.lit(f"{seed}|"), F.col(col).cast("string") if isinstance(col, str) else col.cast("string"))
    return F.pmod(F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("bigint"), F.lit(NUM_BUCKETS))


def sample_uniform(df: DataFrame, key: str, fraction: float, *, seed: str = "") -> DataFrame:
    """Keep ~``fraction`` of rows, chosen by content hash of ``key``."""
    return df.where(bucket_of(key, seed=seed) < int(round(fraction * NUM_BUCKETS)))


def sample_stratified(
    df: DataFrame, key: str, stratum: str, fractions: dict[str, float], *, default: float = 0.0, seed: str = ""
) -> DataFrame:
    """Per-stratum hash sampling (e.g. keep 10% of 'en' docs, 50% of
    low-resource languages). One codegen CASE over the stratum column —
    no per-stratum passes, no shuffle."""
    thresh = F.lit(int(round(default * NUM_BUCKETS)))
    for value, frac in sorted(fractions.items()):
        thresh = F.when(F.col(stratum) == value, int(round(frac * NUM_BUCKETS))).otherwise(thresh)
    return df.where(bucket_of(key, seed=seed) < thresh)


def split_assign(
    df: DataFrame, key: str, *, train: float = 0.8, valid: float = 0.1, seed: str = "", col_name: str = "split"
) -> DataFrame:
    """Add a train/valid/test split column from the key's hash bucket.

    Boundaries at ``train`` and ``train+valid`` percentiles of the bucket
    space; remainder is test. Membership is a pure function of the key,
    so re-runs (and late-arriving rows of the same key) land in the same
    split — the property RNG splits lack.
    """
    b = bucket_of(key, seed=seed)
    t_hi = int(round(train * NUM_BUCKETS))
    v_hi = int(round((train + valid) * NUM_BUCKETS))
    split = (
        F.when(b < t_hi, F.lit("train")).when(b < v_hi, F.lit("valid")).otherwise(F.lit("test"))
    )
    return df.withColumn(col_name, split)


def consistent_topn(df: DataFrame, key: str, n: int, *, seed: str = "") -> DataFrame:
    """A stable pseudo-random sample of exactly ``n`` rows: order the
    corpus by md5(key) and take the first ``n``. Spark plans this as
    TakeOrderedAndProject (per-partition heap + single merge), so the
    full sort never materializes — the 100 TB cost is one scan."""
    return df.withColumn("__h", F.md5(F.concat(F.lit(f"{seed}|"), F.col(key).cast("string")))).orderBy(
        "__h"
    ).limit(n).drop("__h")
