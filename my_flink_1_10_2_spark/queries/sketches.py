"""Sketch queries — deterministic approximate distinct counts.

KMV is the oracle-checkable stand-in for the reference's
APPROX_COUNT_DISTINCT surface (FlinkSqlOperatorTable.java): both engines
replay the identical md5-based sketch, so the driver's hash-match gate
applies to an *approximate* operator (production code would use Spark's
native `approx_count_distinct` HLL — demonstrated in tests).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from my_flink_1_10_2_spark.operators.sketch import (
    cms_build,
    cms_estimate,
    kmv_distinct,
    kmv_distinct_by,
)
from my_flink_1_10_2_spark.queries import read, register

# Cast the 60-bit integer to DOUBLE *before* adding 1.0 — the order
# Spark's _norm_hash uses (conv → string → double, then +1.0).  Adding
# in integer space first (x + 1.0 on the BIGINT) rounds nearest(x+1)
# instead of nearest(x)+1, which differs by 1 ulp on ~1/3 of values;
# with cast-first the hash doubles are bitwise identical across engines.
_HASH = (
    "(CAST(('0x' || substr(md5(CAST({col} AS VARCHAR)), 1, 15))::BIGINT"
    " AS DOUBLE) + 1.0) / power(16.0, 15)"
)


@register(
    "q_kmv_distinct_parts",
    oracle=f"""
    WITH h AS (
      SELECT DISTINCT {_HASH.format(col="l_partkey")} AS h FROM lineitem
    ),
    topk AS (SELECT h FROM h ORDER BY h LIMIT 128)
    SELECT round(CASE WHEN count(*) < 128 THEN CAST(count(*) AS DOUBLE)
                ELSE 127.0 / max(h) END, 6) AS estimate
    FROM topk
    """,
    category="sketch",
)
def q_kmv_distinct_parts(spark, sf_dir):
    """KMV distinct-count of lineitem part keys (k=128): per-partition
    top-k then a k-row merge — no full-domain shuffle
    (operators/sketch.py)."""
    out = kmv_distinct(read(spark, sf_dir, "lineitem"), "l_partkey", k=128)
    return out.withColumn("estimate", F.round("estimate", 6))


@register(
    "q_kmv_distinct_users_by_type",
    oracle=f"""
    WITH h AS (
      SELECT DISTINCT event_type, {_HASH.format(col="user_id")} AS h FROM events
    ),
    ranked AS (
      SELECT event_type, h,
             row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
      FROM h
    )
    SELECT event_type,
           round(CASE WHEN count(*) < 64 THEN CAST(count(*) AS DOUBLE)
                ELSE 63.0 / max(h) END, 6) AS estimate
    FROM ranked WHERE rn <= 64
    GROUP BY event_type
    """,
    category="sketch",
)
def q_kmv_distinct_users_by_type(spark, sf_dir):
    """Grouped KMV sketches: distinct users per event type (k=64)."""
    out = kmv_distinct_by(read(spark, sf_dir, "events"), ["event_type"], "user_id", k=64)
    return out.withColumn("estimate", F.round("estimate", 6))


_CMS_BUCKET = (
    "('0x' || substr(md5(CAST(j AS VARCHAR) || ':' || CAST({col} AS VARCHAR)), 1, 15))"
    "::BIGINT % 1024"
)


@register(
    "q_cms_supplier_counts",
    oracle=f"""
    WITH digits AS (SELECT unnest([0, 1, 2, 3]) AS j),
    cms AS (
      SELECT j, {_CMS_BUCKET.format(col="l_suppkey")} AS bucket, count(*) AS cnt
      FROM lineitem, digits
      GROUP BY 1, 2
    ),
    probes AS (
      SELECT s_suppkey, j, {_CMS_BUCKET.format(col="s_suppkey")} AS bucket
      FROM supplier, digits
    ),
    est AS (
      SELECT s_suppkey, min(coalesce(cnt, 0)) AS est_count
      FROM probes LEFT JOIN cms USING (j, bucket)
      GROUP BY s_suppkey
    )
    SELECT s_suppkey, CAST(est_count AS BIGINT) AS est_count
    FROM est ORDER BY est_count DESC, s_suppkey LIMIT 10
    """,
    category="sketch",
)
def q_cms_supplier_counts(spark, sf_dir):
    """Count-Min heavy hitters: top-10 suppliers by estimated lineitem
    frequency (depth 4 x width 1024, seeded-md5 buckets — both engines
    replay the identical sketch).  Build shuffles O(depth*width) merged
    cells; probe broadcasts the fixed-size sketch
    (operators/sketch.py::cms_build/cms_estimate)."""
    li = read(spark, sf_dir, "lineitem")
    sup = read(spark, sf_dir, "supplier")
    cms = cms_build(li, "l_suppkey", depth=4, width=1024)
    est = cms_estimate(
        cms, sup.select("s_suppkey"), "s_suppkey", depth=4, width=1024
    )
    return (
        est.select(
            "s_suppkey", F.col("estimate").cast("bigint").alias("est_count")
        )
        .orderBy(F.col("est_count").desc(), "s_suppkey")
        .limit(10)
    )


@register(
    "q_hll_registers",
    oracle="""
    WITH h AS (
      SELECT event_type,
             ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 12))::BIGINT AS v
      FROM events
    )
    SELECT event_type,
           v >> 44 AS bucket,
           CAST(max(CASE WHEN v % 17592186044416 = 0 THEN 45
                         ELSE 44 - length(bin(v % 17592186044416)) + 1 END)
                AS INT) AS register
    FROM h GROUP BY 1, 2
    """,
    category="sketch",
)
def q_hll_registers(spark, sf_dir):
    """HyperLogLog register table per event_type (Flajolet et al. 2007;
    the reference's APPROX_COUNT_DISTINCT buffer is the same structure —
    flink-table-runtime-blink HllBuffer): bucket = top 4 md5 bits,
    register = max first-one-bit position of the remaining 44.  Pure
    integer arithmetic, one (group, bucket)-keyed partial-agg shuffle,
    mergeable by register max — the SKETCH itself is graded, the float
    estimator is validated against true counts in tests/test_sketch.py."""
    from my_flink_1_10_2_spark.operators.sketch import hll_registers

    return hll_registers(read(spark, sf_dir, "events"), ["event_type"], "user_id", b=4)


_BLOOM_K, _BLOOM_M = 4, 8192


def _bloom_oracle() -> str:
    def pos(j: int, expr: str) -> str:
        return (
            f"('0x' || substr(md5('b{j}:' || CAST({expr} AS VARCHAR)), 1, 15))"
            f"::BIGINT % {_BLOOM_M}"
        )

    bits = "\n      UNION\n".join(
        f"      SELECT DISTINCT {pos(j, 'v')} AS bit FROM src"
        for j in range(_BLOOM_K)
    )
    probes = "\n      UNION ALL\n".join(
        f"      SELECT c_custkey, {pos(j, 'c_custkey')} AS bit FROM customer"
        for j in range(_BLOOM_K)
    )
    return f"""
    WITH src AS MATERIALIZED (SELECT DISTINCT o_custkey AS v FROM orders),
    bits AS MATERIALIZED (
{bits}
    ),
    probes AS (
{probes}
    )
    SELECT p.c_custkey,
           count(*) = sum(CASE WHEN b.bit IS NOT NULL THEN 1 ELSE 0 END)
             AS maybe_present
    FROM probes p LEFT JOIN bits b ON b.bit = p.bit
    GROUP BY p.c_custkey
    """


@register("q_bloom_membership", oracle=_bloom_oracle(), category="sketch")
def q_bloom_membership(spark, sf_dir):
    """Bloom-filter membership sketch (Bloom 1970; the reference applies
    the same structure to spilled hash-join partitions —
    flink-runtime/.../hashtable/): the set-bit table of customers WITH
    orders probed by EVERY customer.  No false negatives by
    construction; the handful of false positives among orderless
    customers is part of the graded result — the exact bit arithmetic
    is engine-replayable.  Filter ≤ m_bits rows (broadcast-safe at any
    scale); build is one O(config) distinct."""
    from my_flink_1_10_2_spark.operators.sketch import bloom_build, bloom_probe

    orders = read(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("v")
    )
    bloom = bloom_build(orders, "v", k_hashes=_BLOOM_K, m_bits=_BLOOM_M)
    custs = read(spark, sf_dir, "customer").select("c_custkey")
    return bloom_probe(
        bloom, custs, "c_custkey", k_hashes=_BLOOM_K, m_bits=_BLOOM_M
    )


def _hll_estimate_oracle() -> str:
    # b=4: m=16, alpha=0.673, rem_bits=44, scale=45.  The numerator
    # constant is computed ONCE in Python and embedded verbatim so both
    # engines divide the identical double by the identical exact-integer
    # harmonic sum (the fixture's group cardinalities all take the raw
    # branch; the LC branch is replicated for completeness).
    num = repr(0.673 * 16 * 16 * float(1 << 45))
    return f"""
    WITH h AS (
      SELECT event_type,
             ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 12))::BIGINT AS v
      FROM events
    ),
    regs AS (
      SELECT event_type, v >> 44 AS bucket,
             max(CASE WHEN v % 17592186044416 = 0 THEN 45
                      ELSE 44 - length(bin(v % 17592186044416)) + 1 END) AS register
      FROM h GROUP BY 1, 2
    ),
    agg AS (
      SELECT event_type,
             sum(1::BIGINT << (45 - register)) AS s_int,
             count(*) AS m_seen
      FROM regs GROUP BY event_type
    )
    SELECT event_type,
           CASE WHEN {num} / CAST(s_int + (16 - m_seen) * (1::BIGINT << 45)
                               AS DOUBLE) <= 40.0 AND m_seen < 16
                THEN 16.0 * ln(16.0 / CAST(16 - m_seen AS DOUBLE))
                ELSE {num} / CAST(s_int + (16 - m_seen) * (1::BIGINT << 45)
                                  AS DOUBLE)
           END AS estimate
    FROM agg
    """


@register("q_hll_estimate", oracle=_hll_estimate_oracle(), category="sketch")
def q_hll_estimate(spark, sf_dir):
    """HLL distinct-count ESTIMATE graded (companion to
    q_hll_registers): the harmonic sum is an exact integer, the
    numerator a shared literal, so the raw-branch estimate is one
    identical IEEE division on both engines — the float estimator
    itself, not just the registers, is oracle-checked."""
    from my_flink_1_10_2_spark.operators.sketch import (
        hll_estimate,
        hll_registers,
    )

    regs = hll_registers(read(spark, sf_dir, "events"), ["event_type"], "user_id", b=4)
    return hll_estimate(regs, ["event_type"], b=4)


@register(
    "q_kmv_set_ops",
    oracle=f"""
    WITH sa AS (
      SELECT h FROM (
        SELECT DISTINCT {_HASH.format(col="user_id")} AS h
        FROM events WHERE event_type = 'click')
      ORDER BY h LIMIT 64
    ),
    sb AS (
      SELECT h FROM (
        SELECT DISTINCT {_HASH.format(col="user_id")} AS h
        FROM events WHERE event_type = 'purchase')
      ORDER BY h LIMIT 64
    ),
    tagged AS (
      SELECT h, 1 AS in_a, 0 AS in_b FROM sa
      UNION ALL SELECT h, 0 AS in_a, 1 AS in_b FROM sb
    ),
    g AS (SELECT h, max(in_a) AS in_a, max(in_b) AS in_b FROM tagged GROUP BY h),
    mtop AS (SELECT * FROM g ORDER BY h LIMIT 64),
    m AS (SELECT CAST(count(*) AS BIGINT) AS n_m, max(h) AS theta,
                 CAST(coalesce(sum(in_a * in_b), 0) AS BIGINT) AS c FROM mtop),
    astats AS (SELECT CAST(count(*) AS BIGINT) AS n_a, max(h) AS ha FROM sa),
    bstats AS (SELECT CAST(count(*) AS BIGINT) AS n_b, max(h) AS hb FROM sb)
    SELECT
      CASE WHEN n_a < 64 THEN CAST(n_a AS DOUBLE) ELSE 63.0 / ha END AS est_a,
      CASE WHEN n_b < 64 THEN CAST(n_b AS DOUBLE) ELSE 63.0 / hb END AS est_b,
      CASE WHEN n_m < 64 THEN CAST(n_m AS DOUBLE) ELSE 63.0 / theta END
        AS est_union,
      CASE WHEN n_m < 64 THEN CAST(c AS DOUBLE)
           ELSE (CAST(c AS DOUBLE) / 64.0) * (63.0 / theta) END
        AS est_intersection,
      CASE WHEN n_m = 0 THEN 0.0
           WHEN n_m < 64 THEN CAST(c AS DOUBLE) / CAST(n_m AS DOUBLE)
           ELSE CAST(c AS DOUBLE) / 64.0 END AS jaccard
    FROM m, astats, bstats
    """,
    category="sketch",
)
def q_kmv_set_ops(spark, sf_dir):
    """KMV set algebra (theta-sketch style, `operators/sketch.py::
    kmv_set_ops`): distinct clicking users vs purchasing users — A, B,
    A∪B, A∩B estimates and Jaccard, all from two k=64 synopses.  The
    raw relations are never joined: each side reduces to k hashes
    independently (the 100 TB property), and every estimate is a single
    IEEE division/product of exact operands, graded bitwise with no
    rounding."""
    from my_flink_1_10_2_spark.operators.sketch import kmv_set_ops

    events = read(spark, sf_dir, "events")
    return kmv_set_ops(
        events.where(F.col("event_type") == "click"),
        "user_id",
        events.where(F.col("event_type") == "purchase"),
        "user_id",
        k=64,
    )


@register(
    "q_hll_merge",
    oracle="""
    WITH h AS (
      SELECT event_type,
             ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 12))::BIGINT AS v
      FROM events
    ),
    regs AS (
      SELECT event_type, v >> 44 AS bucket,
             CASE WHEN v % 17592186044416 = 0 THEN 45
                  ELSE 44 - length(bin(v % 17592186044416)) + 1 END AS r,
             CASE WHEN v % 2 = 0 THEN 0 ELSE 1 END AS half
      FROM h
    ),
    halves AS (
      SELECT event_type, bucket, half, max(r) AS register
      FROM regs GROUP BY 1, 2, 3
    ),
    merged AS (
      SELECT event_type, bucket, CAST(max(register) AS INT) AS register
      FROM halves GROUP BY 1, 2
    ),
    full_t AS (
      SELECT event_type, bucket, CAST(max(r) AS INT) AS register
      FROM regs GROUP BY 1, 2
    )
    SELECT m.event_type, m.bucket, m.register,
           CAST(CASE WHEN m.register = f.register THEN 1 ELSE 0 END AS INT)
             AS merge_equals_full
    FROM merged m JOIN full_t f
      ON f.event_type = m.event_type AND f.bucket = m.bucket
    """,
    category="sketch",
)
def q_hll_merge(spark, sf_dir):
    """HLL MERGEABILITY graded (the property that makes HLL the
    production distinct sketch — register-wise max of partial sketches
    equals the sketch of the union; ref: the reference's
    APPROX_COUNT_DISTINCT HllBuffer merge path in
    flink-table-runtime-blink): the events table splits into two
    disjoint halves by hash parity, each half builds its own register
    table, the halves merge by max, and every merged register must
    equal the full-table register — the `merge_equals_full` column is
    graded as all-1s alongside the registers themselves."""
    from my_flink_1_10_2_spark.operators.sketch import hll_registers

    events = read(spark, sf_dir, "events")
    parity = (
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 12), 16, 10)
        .cast("bigint")
        % 2
    )
    tagged = events.withColumn("__half", parity)
    h0 = hll_registers(tagged.where("__half = 0"), ["event_type"], "user_id", b=4)
    h1 = hll_registers(tagged.where("__half = 1"), ["event_type"], "user_id", b=4)
    merged = (
        h0.unionAll(h1)
        .groupBy("event_type", "bucket")
        .agg(F.max("register").cast("int").alias("register"))
    )
    full = hll_registers(events, ["event_type"], "user_id", b=4).withColumnRenamed(
        "register", "__full_r"
    )
    return merged.join(full, ["event_type", "bucket"]).select(
        "event_type",
        "bucket",
        "register",
        F.when(F.col("register") == F.col("__full_r"), 1)
        .otherwise(0)
        .cast("int")
        .alias("merge_equals_full"),
    )


def _ddsketch_oracle() -> str:
    """Integer-exact SQL replay of the gamma=sqrt(2) DDSketch: bucket =
    2*floor(log2 v) + [v*v >= 1<<(2*floor(log2 v)+1)] over price cents,
    then the first bucket whose running count reaches ceil(q*n)."""
    return """
    WITH vals AS (
      SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS v
      FROM lineitem WHERE l_extendedprice > 0
    ),
    bk AS (
      SELECT 2 * (length(bin(v)) - 1)
             + CASE WHEN v * v >= (CAST(1 AS BIGINT)
                                   << (2 * (length(bin(v)) - 1) + 1))
                    THEN 1 ELSE 0 END AS bucket
      FROM vals
    ),
    counts AS (SELECT bucket, count(*) AS n FROM bk GROUP BY bucket),
    cum AS (
      SELECT bucket, n,
             sum(n) OVER (ORDER BY bucket) AS cum_n,
             sum(n) OVER () AS total_n
      FROM counts
    ),
    qs AS (SELECT * FROM (VALUES (1, 2), (9, 10), (99, 100)) q(q_num, q_den)),
    hit AS (
      SELECT q.q_num, q.q_den, c.bucket, c.cum_n, c.total_n
      FROM cum c CROSS JOIN qs q
      WHERE c.cum_n >= (q.q_num * c.total_n + q.q_den - 1) // q.q_den
    )
    SELECT q_num, q_den,
           CAST(min(bucket) AS BIGINT) AS bucket,
           CAST(min(cum_n) AS BIGINT) AS cum_n,
           CAST(min(total_n) AS BIGINT) AS total_n
    FROM hit GROUP BY q_num, q_den ORDER BY q_num, q_den
    """


@register("q_ddsketch_quantiles", oracle=_ddsketch_oracle(), category="sketch")
def q_ddsketch_quantiles(spark, sf_dir):
    """DDSketch quantiles (Masson et al., VLDB 2019) — the mergeable
    relative-error quantile sketch alongside KMV/HLL/CMS/Bloom: price
    cents collapse into gamma=sqrt(2) geometric buckets (ONE bounded
    shuffle onto ~128 bucket keys; counts merge by addition under any
    partitioning — the 100 TB property), and p50/p90/p99 are answered
    as the first bucket whose cumulative count reaches the integer
    ceil-rank.  Bucket index arithmetic is all 64-bit-integer (binary-
    string floor-log2 + a shifted half-octave test), so the oracle
    replays it bitwise."""
    from my_flink_1_10_2_spark.operators.sketch import (
        ddsketch_buckets,
        ddsketch_quantiles,
    )

    vals = (
        read(spark, sf_dir, "lineitem")
        .where(F.col("l_extendedprice") > 0)
        .select(
            F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("v")
        )
    )
    out = ddsketch_quantiles(
        ddsketch_buckets(vals, "v"), [(1, 2), (9, 10), (99, 100)]
    )
    return out.select(
        "q_num",
        "q_den",
        F.col("bucket").cast("bigint").alias("bucket"),
        F.col("cum_n").cast("bigint").alias("cum_n"),
        F.col("total_n").cast("bigint").alias("total_n"),
    ).orderBy("q_num", "q_den")


@register(
    "q_hll_distinct_parts",
    oracle="""
    WITH h AS (
      SELECT ('0x' || substr(md5('hll|' || CAST(l_partkey AS VARCHAR)), 1, 15))::BIGINT
               AS hv
      FROM lineitem),
    rr AS (
      SELECT hv % 256 AS bucket,
             CASE WHEN hv // 256 = 0 THEN 53
                  ELSE 1 + bit_count(((hv // 256) & -(hv // 256)) - 1)
             END AS rank
      FROM h),
    regs AS (SELECT bucket, max(rank) AS register FROM rr GROUP BY bucket),
    agg AS (
      SELECT CAST(count(*) AS BIGINT) AS hit,
             CAST(sum(1::BIGINT << (53 - register)) AS BIGINT) AS s_int
      FROM regs),
    est AS (
      SELECT hit,
             CASE WHEN (4.2399330249068963e+20
                        / CAST(s_int + (256 - hit) * (1::BIGINT << 53) AS DOUBLE))
                       <= 640.0
                       AND CAST(256 - hit AS DOUBLE) > 0
                  THEN 256.0 * ln(256.0 / CAST(256 - hit AS DOUBLE))
                  ELSE 4.2399330249068963e+20
                       / CAST(s_int + (256 - hit) * (1::BIGINT << 53) AS DOUBLE)
             END AS estimate
      FROM agg)
    SELECT hit AS n_registers_hit,
           round(estimate, 4) AS estimate,
           (SELECT CAST(count(DISTINCT l_partkey) AS BIGINT) FROM lineitem)
             AS exact_distinct
    FROM est
    """,
    category="sketch",
)
def q_hll_distinct_parts(spark, sf_dir):
    """HyperLogLog distinct count (Flajolet/Fusy/Gandouet/Meunier 2007,
    m = 256 registers, trailing-zero rank — identical geometric law to
    the paper's leading-zero rank) with the small-range linear-counting
    correction, next to the exact answer for error inspection.  The
    harmonic sum is computed in exact integer units (2^(53-register)
    per register), so the ONLY float op is one division — the sketch
    estimate itself grades bitwise.  max() registers are map-side
    combined: one <= 256-row exchange regardless of input size, and
    registers from disjoint corpus partitions merge with another max —
    the mergeability KMV (q_kmv_distinct_parts) shares and exact
    count-distinct lacks at 100 TB."""
    from my_flink_1_10_2_spark.operators.hints import dim
    from my_flink_1_10_2_spark.operators.sketch import hll256_estimate

    li = read(spark, sf_dir, "lineitem")
    est = hll256_estimate(li, "l_partkey", m=256)
    exact = li.agg(
        F.countDistinct("l_partkey").cast("bigint").alias("exact_distinct")
    )
    return est.join(dim(exact)).select(
        "n_registers_hit",
        F.round("estimate", 4).alias("estimate"),
        "exact_distinct",
    )
