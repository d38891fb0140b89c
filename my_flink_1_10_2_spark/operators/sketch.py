"""Distributed sketches for 100 TB-scale approximate analytics.

The reference exposes approximate aggregates through its agg-function
surface (APPROX_COUNT_DISTINCT in FlinkSqlOperatorTable.java; runtime
HllBuffer in flink-table-runtime-blink). Spark's built-ins
(`approx_count_distinct`, `percentile_approx`) cover the HLL/KLL cases
natively — use those in production.

This module adds a **KMV (k-minimum-values) distinct-count sketch**
built from md5, for two reasons:

  - it is *deterministic and engine-portable*, so the DuckDB oracle can
    replay the exact estimate (the driver's hash-match gate, which a
    HLL implementation difference would fail);
  - it is mergeable the same way production sketches are: the k smallest
    hashes of a union = merge of per-partition k smallest — Spark plans
    the TakeOrdered/limit push-down automatically, so the shuffle
    carries k rows per partition, not the data.

Estimator (Bar-Yossef et al., "Counting distinct elements in a data
stream"): with h(v) uniform on (0,1] and h_(k) the k-th smallest hash of
the distinct values, E[distinct] ≈ (k-1)/h_(k).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# 15 hex chars = 60 bits — exact in a double (< 2^53 after the /16 scale
# below would lose bits, so normalize with the full 60-bit denominator).
_DENOM = float(16**15)


def _norm_hash(col):
    """Deterministic uniform hash of `col` into (0, 1] — md5-based, so
    DuckDB computes the identical value."""
    hx = F.substring(F.md5(F.col(col).cast("string")), 1, 15)
    return (F.conv(hx, 16, 10).cast("double") + F.lit(1.0)) / F.lit(_DENOM)


# Below this many input rows the threshold-prefilter variant of the KMV
# sketch costs more than it saves (the filter re-evaluates the hash
# expression; the dedup shuffle it avoids is still small).  Above it, the
# prefilter caps shuffle volume at O(k) regardless of data size — the
# property that matters at 100 TB.
_PREFILTER_MIN_ROWS = 5_000_000


def kmv_distinct(df: DataFrame, col: str, k: int = 128) -> DataFrame:
    """KMV distinct-count estimate for `col` → 1-row (estimate double).

    Plan shape at scale: hash-project → **threshold prefilter** →
    dedup + top-k of the tiny survivor set → closed-form estimate.

    The prefilter is the 100 TB move: the k smallest of N distinct
    uniform hashes all sit below ~k/N, so one cheap
    ``approx_count_distinct`` pass bounds N and a map-side
    ``h <= margin·k/N̂`` filter drops all but ~margin·k rows *before*
    anything shuffles — dedup volume goes from O(locally-distinct ≈ N)
    to O(k), two scans instead of one full-domain shuffle.  If the
    approximation under-estimated (filter starved the sketch), the
    threshold widens ×8 and retries — deterministic, since HLL merges
    are order-insensitive.  The estimate itself is bitwise identical to
    the unfiltered sketch: the k smallest distinct hashes are unchanged
    by a filter that keeps everything ≤ the k-th of them.
    """
    hashes_all = df.select(_norm_hash(col).alias("h"))
    # Row count upper-bounds the distinct count and is near-free (parquet
    # footer metadata); the ×8 margin absorbs up to 8× duplication before
    # the first retry widens it further.
    n_est = df.count()
    if n_est < _PREFILTER_MIN_ROWS:
        # Small input: the one-pass dedup (map-side partial) wins — the
        # filter's second evaluation of the hash expression costs more
        # than the shuffle it saves.  Lazy; same bits.
        hashes = hashes_all.dropDuplicates(["h"])
        kth = hashes.orderBy("h").limit(k).agg(
            F.max("h").alias("hk"), F.count("*").alias("n")
        )
        return kth.select(
            F.when(F.col("n") < k, F.col("n").cast("double"))
            .otherwise(F.lit(float(k - 1)) / F.col("hk"))
            .alias("estimate")
        )
    margin = 8.0
    while True:
        threshold = min(1.0, margin * k / max(n_est, 1))
        hashes = hashes_all
        if threshold < 1.0:
            hashes = hashes_all.where(F.col("h") <= F.lit(threshold))
        hashes = hashes.dropDuplicates(["h"])
        kth = hashes.orderBy("h").limit(k).agg(
            F.max("h").alias("hk"), F.count("*").alias("n")
        )
        row = kth.first()
        # the filtered sketch is valid if it filled up (k values survive)
        # or nothing was cut at all (threshold covered the whole range —
        # then fewer than k survivors means the sketch is exact: n itself)
        if threshold >= 1.0 or row["n"] >= k:
            break
        margin *= 8.0
    spark = df.sparkSession
    if row["n"] < k:
        return spark.createDataFrame([(float(row["n"]),)], "estimate double")
    return spark.createDataFrame(
        [(float(k - 1) / row["hk"],)], "estimate double"
    )


def _cms_bucket(col: str, j: int, width: int):
    """Row j's bucket for value `col`: md5("j:value") → 60-bit int → mod
    width.  Same seeded-md5 idiom as :func:`_norm_hash`, so DuckDB can
    replay the identical bucket assignment."""
    hx = F.substring(
        F.md5(F.concat(F.lit(f"{j}:"), F.col(col).cast("string"))), 1, 15
    )
    return F.conv(hx, 16, 10).cast("bigint") % F.lit(width)


def cms_build(df: DataFrame, col: str, depth: int = 4, width: int = 1024) -> DataFrame:
    """Count-Min sketch of `col` frequencies → (j, bucket, cnt) rows.

    The reference's approximate-aggregate surface is HLL-only
    (FlinkSqlOperatorTable APPROX_COUNT_DISTINCT); CMS is the matching
    *frequency* sketch a 100 TB pipeline needs for heavy-hitter mining
    (Cormode & Muthukrishnan, "An improved data stream summary: the
    count-min sketch and its applications", J. Algorithms 2005).

    100 TB shape: one projection emits `depth` (j, bucket) pairs per row;
    the groupBy is map-side partially aggregated, so the shuffle carries
    at most `partitions x depth x width` pre-merged cells — O(config),
    not O(rows).  The sketch itself is <= depth*width rows by
    construction, mergeable by cell-wise addition.
    """
    pairs = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        _cms_bucket(col, j, width).alias("bucket"),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("p")
    ).select("p.j", "p.bucket")
    return pairs.groupBy("j", "bucket").agg(F.count("*").alias("cnt"))


def cms_estimate(
    cms: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Point-query a CMS for every row of `keys` → (key_col, estimate).

    estimate(v) = min over the `depth` rows of the bucket count v hashes
    into (never under-counts; over-counts only on bucket collisions).

    The sketch side is broadcast unconditionally: it is <= depth*width
    rows *by construction* (a config constant, not a function of data
    size), so this is the rare broadcast that is always safe at 100 TB.
    """
    probes = keys.select(
        F.col(key_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        _cms_bucket(key_col, j, width).alias("bucket"),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("p"),
    ).select(key_col, "p.j", "p.bucket")
    joined = probes.join(F.broadcast(cms), on=["j", "bucket"], how="left")
    return joined.groupBy(key_col).agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("estimate")
    )


def kmv_distinct_by(df: DataFrame, group_cols: list[str], col: str, k: int = 64) -> DataFrame:
    """Grouped KMV estimates: one sketch per group.

    Same threshold prefilter as :func:`kmv_distinct`, sized for the
    *sparsest* group (largest k/N̂_g), so every group's k smallest
    distinct hashes survive while dense groups still shed almost all
    rows map-side.  Per-group k-th smallest via row_number window over
    the (tiny) survivor set; widens ×8 and retries if any group that
    was cut by the filter failed to fill its sketch.
    """
    from pyspark.sql import Window as W

    hashed_all = df.select(*group_cols, _norm_hash(col).alias("h"))
    # Only two scalars are needed to size the prefilter — the sparsest
    # group's row count and the total — so reduce the per-group counts
    # to ONE driver row regardless of group cardinality (the grouped
    # partial-agg shuffle stays distributed).
    stats = (
        df.groupBy(*group_cols)
        .count()
        .agg(F.min("count").alias("__n_min"), F.sum("count").alias("__n_total"))
        .first()
    )
    n_min = stats["__n_min"] if stats["__n_min"] is not None else 1
    n_total = stats["__n_total"] if stats["__n_total"] is not None else 0
    if n_total < _PREFILTER_MIN_ROWS:
        # small input → one-pass (see kmv_distinct); lazy, same bits
        hashed = hashed_all.dropDuplicates([*group_cols, "h"])
        w = W.partitionBy(*group_cols).orderBy("h")
        topk = hashed.withColumn("rn", F.row_number().over(w)).where(
            F.col("rn") <= k
        )
        return topk.groupBy(*group_cols).agg(
            F.when(F.count("*") < k, F.count("*").cast("double"))
            .otherwise(F.lit(float(k - 1)) / F.max("h"))
            .alias("estimate")
        )
    margin = 8.0
    while True:
        threshold = min(1.0, margin * k / max(n_min, 1))
        hashed = hashed_all
        if threshold < 1.0:
            hashed = hashed_all.where(F.col("h") <= F.lit(threshold))
        hashed = hashed.dropDuplicates([*group_cols, "h"])
        w = W.partitionBy(*group_cols).orderBy("h")
        topk = hashed.withColumn("rn", F.row_number().over(w)).where(
            F.col("rn") <= k
        )
        out = topk.groupBy(*group_cols).agg(
            F.when(F.count("*") < k, F.count("*").cast("double"))
            .otherwise(F.lit(float(k - 1)) / F.max("h"))
            .alias("estimate"),
            F.count("*").alias("__survivors"),
        )
        if threshold >= 1.0:
            return out.drop("__survivors")
        starved = out.where(F.col("__survivors") < k).limit(1).count() > 0
        # a group may legitimately hold < k distinct values; it is only
        # starved if the filter (not the data) cut it short
        if not starved:
            return out.drop("__survivors")
        margin *= 8.0


# ---------------------------------------------------------------------------
# HyperLogLog registers — the third sketch family (Flajolet et al. 2007;
# the reference's APPROX_COUNT_DISTINCT buffer is an HLL too:
# flink-table-runtime-blink HllBuffer).  Spark's approx_count_distinct
# is the production path; THIS construction is deterministic and
# engine-portable (md5 bits), so the full register table — the sketch
# itself, not just the estimate — is oracle-gradeable, and the float
# estimator can be validated separately against the true count.
# ---------------------------------------------------------------------------

_HLL_BITS_TOTAL = 48  # md5-derived 48-bit value (12 hex chars)


def hll_registers(
    df: DataFrame, group_cols: list[str], col: str, b: int = 4
) -> DataFrame:
    """Per-group HLL register table: bucket = top ``b`` hash bits,
    register = max over values of (position of the first 1-bit in the
    remaining ``48-b`` bits, 1-based; ``49-b`` when all zero).

    Pure integer arithmetic end to end (the bit-length comes from the
    binary-string length, identical in any engine), one partial-agg
    shuffle keyed (group, bucket) — mergeable exactly like production
    HLL: max of registers = register of the union.
    """
    if not 1 <= b <= 16:
        raise ValueError("b must be in [1, 16]")
    rem_bits = _HLL_BITS_TOTAL - b
    v = F.conv(F.substring(F.md5(F.col(col).cast("string")), 1, 12), 16, 10).cast(
        "long"
    )
    bucket = F.shiftright(v, rem_bits)
    rem = v % F.shiftleft(F.lit(1).cast("long"), rem_bits)
    rho = F.when(rem == 0, F.lit(rem_bits + 1)).otherwise(
        F.lit(rem_bits) - F.length(F.bin(rem)) + 1
    )
    return (
        df.select(*group_cols, bucket.alias("bucket"), rho.alias("__rho"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("__rho").cast("int").alias("register"))
    )


def hll_estimate(registers: DataFrame, group_cols: list[str], b: int = 4) -> DataFrame:
    """Distinct-count estimate from a register table (standard HLL
    estimator with linear-counting small-range correction).  The
    harmonic sum is computed as an EXACT integer (sum of
    2^(rem_bits+1-register)) before the one float division."""
    import math

    m = 1 << b
    alpha = {16: 0.673, 32: 0.697, 64: 0.709}.get(
        m, 0.7213 / (1 + 1.079 / m)
    )
    rem_bits = _HLL_BITS_TOTAL - b
    scale = rem_bits + 1
    # SQL spelling: the Python shiftleft() helper only takes a literal
    # shift amount, the SQL function takes an expression
    term = F.expr(f"shiftleft(CAST(1 AS BIGINT), {scale} - register)")
    agg = registers.groupBy(*group_cols).agg(
        F.sum(term).alias("__s_int"),
        F.count(F.lit(1)).alias("__m_seen"),
    )
    # buckets never hit contribute 2^scale each (register 0)
    s_full = F.col("__s_int") + (F.lit(m) - F.col("__m_seen")) * F.shiftleft(
        F.lit(1).cast("long"), scale
    )
    zeros = F.lit(m) - F.col("__m_seen")
    raw = F.lit(alpha * m * m * float(1 << scale)) / s_full.cast("double")
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double")),
    ).otherwise(raw)
    return agg.select(*group_cols, est.alias("estimate"))


# ---------------------------------------------------------------------------
# Bloom filter — the membership sketch (Bloom 1970), the fourth family
# beside KMV/CMS/HLL.  The reference uses bloom filters inside its
# hash-join spill path (flink-runtime/.../hashtable/ BloomFilter on
# spilled partitions); as a DATA sketch it is the standard "does this
# key exist in the corpus" pre-filter a 100 TB pipeline ships to small
# consumers.  md5-seeded bit positions → any engine replays the exact
# filter bits.
# ---------------------------------------------------------------------------


def _bloom_pos(col: str, j: int, m_bits: int):
    """Bit position for hash row j — seeded md5, same idiom as
    :func:`_cms_bucket`."""
    hx = F.substring(
        F.md5(F.concat(F.lit(f"b{j}:"), F.col(col).cast("string"))), 1, 15
    )
    return F.conv(hx, 16, 10).cast("bigint") % F.lit(m_bits)


def bloom_build(
    df: DataFrame, col: str, k_hashes: int = 4, m_bits: int = 8192
) -> DataFrame:
    """Build the filter as its SET-BIT table: (bit,) distinct rows.

    One projection emits k positions per row; the distinct is one
    shuffle of at most ``m_bits`` surviving rows — O(config).  The
    bit-table representation is mergeable (union = OR) and directly
    joinable for probes; pack to a bitmap at the edge if a byte-array
    artifact is needed.
    """
    pos = df.select(
        F.explode(
            F.array(*[_bloom_pos(col, j, m_bits) for j in range(k_hashes)])
        ).alias("bit")
    )
    return pos.distinct()


def bloom_probe(
    bloom: DataFrame,
    keys: DataFrame,
    key_col: str,
    k_hashes: int = 4,
    m_bits: int = 8192,
) -> DataFrame:
    """Membership probe: present iff ALL k bit positions are set — no
    false negatives, bounded false positives (~(1-e^{-kn/m})^k).  The
    filter side is broadcast unconditionally: <= m_bits rows by
    construction."""
    probes = keys.select(
        F.col(key_col),
        F.explode(
            F.array(*[_bloom_pos(key_col, j, m_bits) for j in range(k_hashes)])
        ).alias("bit"),
    )
    hit = probes.join(F.broadcast(bloom.withColumn("__set", F.lit(1))), "bit", "left")
    return hit.groupBy(key_col).agg(
        (F.count(F.lit(1)) == F.sum(F.coalesce(F.col("__set"), F.lit(0))))
        .alias("maybe_present")
    )


# ---------------------------------------------------------------------------
# KMV set algebra — union / intersection / Jaccard from two sketches
# (Beyer, Haas, Reinwald, Sismanis & Gemulla, "On synopses for
# distinct-value estimation under multiset operations", SIGMOD 2007 —
# the theta-sketch idea production systems ship).  The point at 100 TB:
# the two inputs are reduced to k-row synopses INDEPENDENTLY (one scan
# each, O(k) shuffle), and every set-operation estimate is computed from
# the 2k sketch rows alone — no join of the raw relations ever happens.
# ---------------------------------------------------------------------------


def kmv_sketch(df: DataFrame, col: str, k: int = 256) -> DataFrame:
    """The KMV synopsis itself: the k smallest distinct md5 hashes of
    ``col``, as rows (h double).  Mergeable (k smallest of a union of
    sketches = sketch of the union) and engine-portable — DuckDB
    reproduces every hash bit.

    Past ``_PREFILTER_MIN_ROWS`` this reuses :func:`kmv_distinct`'s
    threshold prefilter (``h <= margin·k/N̂`` map-side, ×8 widen-and-
    retry if the sketch starves), so the dedup/sort shuffle carries
    ~margin·k rows instead of every distinct hash — the bits are
    unchanged because a filter keeping everything ≤ the k-th smallest
    hash cannot change the k smallest."""
    hashes_all = df.select(_norm_hash(col).alias("h"))
    n_est = df.count()
    if n_est >= _PREFILTER_MIN_ROWS:
        margin = 8.0
        while True:
            threshold = min(1.0, margin * k / max(n_est, 1))
            if threshold >= 1.0:
                break
            sk = (
                hashes_all.where(F.col("h") <= F.lit(threshold))
                .dropDuplicates(["h"])
                .orderBy("h")
                .limit(k)
            )
            # valid if it filled (k survivors) — else the filter starved
            # the sketch: widen and retry (deterministic, same bits)
            if sk.count() >= k:
                return sk
            margin *= 8.0
    return hashes_all.dropDuplicates(["h"]).orderBy("h").limit(k)


def kmv_set_ops(
    df_a: DataFrame,
    col_a: str,
    df_b: DataFrame,
    col_b: str,
    k: int = 256,
) -> DataFrame:
    """Distinct-count estimates for A, B, A∪B, A∩B and the Jaccard
    index from two k-size KMV sketches — one output row.

    Estimator: merge the sketches, keep the k smallest hashes; with
    θ = the k-th smallest, est(A∪B) = (k-1)/θ; c = |{h ≤ θ seen in both
    sketches}| gives Jaccard ≈ c/k and est(A∩B) = (c/k)·est(A∪B).
    When the merged sketch does not fill (fewer than k distinct hashes
    total), every sketch is the EXACT hash set and the outputs collapse
    to exact counts — the same closed-form branch both engines take.

    All arithmetic after the integer counts is single IEEE divisions /
    products of identical operands, so the estimates (not just the
    sketch rows) replay bitwise in the SQL oracle.  The whole plan is
    lazy: two O(k) sketch reductions, a 2k-row merge, 1-row aggregates —
    nothing driver-side.
    """
    sa, sb = kmv_sketch(df_a, col_a, k), kmv_sketch(df_b, col_b, k)
    tagged = sa.select(
        "h", F.lit(1).alias("in_a"), F.lit(0).alias("in_b")
    ).unionAll(sb.select("h", F.lit(0).alias("in_a"), F.lit(1).alias("in_b")))
    g = tagged.groupBy("h").agg(
        F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b")
    )
    mtop = g.orderBy("h").limit(k)
    m = mtop.agg(
        F.count("*").cast("bigint").alias("n_m"),
        F.max("h").alias("theta"),
        # coalesce: SUM over an empty sketch is NULL, but zero common
        # hashes is the honest value (two empty inputs intersect empty)
        F.coalesce(
            F.sum(F.col("in_a") * F.col("in_b")).cast("bigint"), F.lit(0)
        ).alias("c"),
    )
    astats = sa.agg(F.count("*").cast("bigint").alias("n_a"), F.max("h").alias("ha"))
    bstats = sb.agg(F.count("*").cast("bigint").alias("n_b"), F.max("h").alias("hb"))
    row = m.crossJoin(astats).crossJoin(bstats)
    kk = F.lit(float(k - 1))
    n_m, theta, c = F.col("n_m"), F.col("theta"), F.col("c")
    filled = n_m >= k
    est_a = F.when(F.col("n_a") < k, F.col("n_a").cast("double")).otherwise(
        kk / F.col("ha")
    )
    est_b = F.when(F.col("n_b") < k, F.col("n_b").cast("double")).otherwise(
        kk / F.col("hb")
    )
    est_union = F.when(~filled, n_m.cast("double")).otherwise(kk / theta)
    jaccard = F.when(n_m == 0, F.lit(0.0)).otherwise(
        F.when(~filled, c.cast("double") / n_m.cast("double")).otherwise(
            c.cast("double") / F.lit(float(k))
        )
    )
    est_inter = F.when(~filled, c.cast("double")).otherwise(jaccard * est_union)
    return row.select(
        est_a.alias("est_a"),
        est_b.alias("est_b"),
        est_union.alias("est_union"),
        est_inter.alias("est_intersection"),
        jaccard.alias("jaccard"),
    )


# ---------------------------------------------------------------------------
# DDSketch — relative-error quantile sketch with mergeable log buckets
# (Masson, Rim & Lee, "DDSketch: A Fast and Fully-Mergeable Quantile
# Sketch with Relative-Error Guarantees", VLDB 2019).  The quantile-
# sketch sibling of the KMV/HLL/CMS family above: values collapse into
# geometric buckets, bucket counts merge by plain addition (any
# partitioning, any re-aggregation), and a quantile is answered by the
# first bucket whose cumulative count reaches ceil(q*n).
#
# Exactness discipline: gamma = sqrt(2), so a positive integer v lands
# in bucket 2*floor(log2 v) + [v^2 >= 2^(2*floor(log2 v)+1)] — floor-log2
# via the binary-string length and the half-octave test via v*v against
# a bit shift, ALL in 64-bit integers (v below 2^31 keeps v*v exact), so
# Spark and any ANSI-SQL oracle replay the identical sketch bit for bit.
# ---------------------------------------------------------------------------


def ddsketch_buckets(df: DataFrame, col: str) -> DataFrame:
    """Fold positive integer ``col`` into gamma=sqrt(2) DDSketch buckets
    → (bucket, n) — one shuffle keyed on the bucket index (bounded:
    ~2*64 distinct buckets no matter the data size).  Non-positive
    values are the caller's contract to exclude (the paper's sketch is
    for positive reals; a production variant keeps a separate zero/neg
    store)."""
    e = F.length(F.expr(f"bin({col})")) - F.lit(1)  # floor(log2 v), exact
    half = (
        (F.col(col) * F.col(col))
        >= F.expr(f"shiftleft(CAST(1 AS BIGINT), 2 * (length(bin({col})) - 1) + 1)")
    ).cast("int")
    return (
        df.select((F.lit(2) * e + half).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def ddsketch_quantiles(
    buckets: DataFrame, quantiles: list[tuple[int, int]]
) -> DataFrame:
    """Answer quantiles from a (bucket, n) sketch → (q_num, q_den,
    bucket, cum_n, total_n): for each q = q_num/q_den the FIRST bucket
    (ascending) whose cumulative count reaches ceil(q*n) — integer rank
    arithmetic ((q_num*n + q_den - 1) div q_den), no float ranks.  A
    window cumulative sum over the ~128-bucket sketch, then one tiny
    cross join with the quantile list — driver-free and O(buckets)."""
    from pyspark.sql import Window

    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    cum = buckets.select(
        "bucket",
        "n",
        F.sum("n").over(w).alias("cum_n"),
        F.sum("n").over(
            Window.orderBy("bucket").rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("total_n"),
    )
    qdf = buckets.sparkSession.createDataFrame(
        quantiles, "q_num int, q_den int"
    )
    rank = F.expr("(q_num * total_n + q_den - 1) DIV q_den")  # ceil, integer
    hit = cum.crossJoin(F.broadcast(qdf)).where(F.col("cum_n") >= rank)
    return (
        hit.groupBy("q_num", "q_den")
        .agg(
            F.min("bucket").alias("bucket"),
            F.min_by("cum_n", "bucket").alias("cum_n"),
            F.first("total_n").alias("total_n"),
        )
    )


def hll256_registers(df: DataFrame, col: str, m: int = 256) -> DataFrame:
    """HyperLogLog register relation (Flajolet et al. 2007): bucket =
    low log2(m) bits of a 60-bit md5 hash, rank = 1 + trailing-zero
    count of the remaining bits (geometrically distributed exactly like
    the paper's leading-zero rank), register = MAX rank per bucket.

    max() is partial-aggregable, so the map side combines each task
    down to <= m rows before the shuffle — the register relation costs
    one O(m)-row exchange regardless of input size, and registers from
    disjoint corpora merge with another max (the mergeability that
    makes the sketch work across 100 TB partitions).

    Output: (bucket, register) — at most m rows.
    """
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit("hll|"), F.col(col).cast("string"))), 1, 15),
        16,
        10,
    ).cast("bigint")
    return (
        df.select(h.alias("__h"))
        .select(
            F.pmod(F.col("__h"), F.lit(m)).alias("bucket"),
            F.expr(f"__h DIV {m}").alias("__w"),
        )
        .select(
            "bucket",
            # rank = 1 + trailing zeros of __w within its 52-bit window;
            # __w = 0 (hash a multiple of m*2^52 — never at these sizes,
            # but defined) caps at 53
            F.when(F.col("__w") == 0, F.lit(53))
            .otherwise(
                # trailing zeros via the twos-complement trick:
                # tz = log2(w & -w); bit_count((w & -w) - 1) == tz
                F.lit(1)
                + F.bit_count(
                    (F.col("__w").bitwiseAND(-F.col("__w"))) - F.lit(1)
                )
            )
            .alias("rank"),
        )
        .groupBy("bucket")
        .agg(F.max("rank").alias("register"))
    )


def hll256_estimate(df: DataFrame, col: str, m: int = 256) -> DataFrame:
    """HyperLogLog cardinality estimate with the paper's small-range
    (linear counting) correction.  Returns one row:
    (n_registers_hit, estimate)."""
    regs = hll256_registers(df, col, m)
    alpha = 0.7213 / (1.0 + 1.079 / m)  # the paper's alpha_m for m >= 128
    # integer-exact harmonic sum: each 2^-register term scales to the
    # exact bigint 2^(53-register), and every EMPTY register contributes
    # 2^0 = 1, i.e. 2^53 scaled — so the only float op left is ONE
    # division by the exact integer sum (cross-engine float sums of
    # mixed-exponent terms are ulp-hazardous; an integer sum is not)
    agg = regs.agg(
        F.count(F.lit(1)).cast("bigint").alias("hit"),
        F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), CAST(53 - register AS INT))"))
        .cast("bigint")
        .alias("s_int"),
    )
    numer = alpha * m * m * float(1 << 53)  # one python-folded constant
    s_total = F.col("s_int") + (F.lit(m) - F.col("hit")) * F.lit(1 << 53)
    raw = F.lit(numer) / s_total.cast("double")
    v = (F.lit(m) - F.col("hit")).cast("double")
    corrected = F.when(
        (raw <= F.lit(2.5 * m)) & (v > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v),
    ).otherwise(raw)
    return agg.select(
        F.col("hit").alias("n_registers_hit"),
        corrected.alias("estimate"),
    )
