"""Round-5 operator wave: physical-layout, curation-budget, affinity,
re-aggregation and frontier operators.

Each query grades an operator family that previously had only local
(pytest) evidence or no coverage at all:

- custom partitioning as a GRADED artifact (ref: DataStream.java
  partitionCustom:1137) — the partition-assignment expression is the
  output, engine-portable via the md5 recipe;
- largest-remainder sampling budgets (the integer-exact allocation a
  corpus curation pipeline runs before weighted sampling);
- market-basket co-purchase affinity (pair counts + integer lift);
- hierarchical re-aggregation (daily FROM hourly partials — the
  continuous-aggregate maintenance contract: algebraic aggs compose);
- incremental view maintenance (base + delta partial merge == full
  recompute — the foundation of every streaming materialized view,
  ref: flink-table .../operators/aggregate/GroupAggFunction.java:48
  accumulate/merge contract);
- skyline / Pareto frontier via a distinct-price pre-aggregate and a
  running-max frontier scan (dominance graded against an independent
  NOT EXISTS oracle).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from my_flink_1_10_2_spark.queries import read, register

_WEEK_US = 7 * 86_400 * 1_000_000


@register(
    "q_partition_custom_layout",
    oracle="""
    SELECT CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT
                % 8 AS INT) AS pid,
           CAST(count(*) AS BIGINT) AS n,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(sum(CAST(round(value * 10000) AS BIGINT)) AS BIGINT) AS v_sum_e4
    FROM events
    GROUP BY 1
    ORDER BY 1
    """,
    category="pipeline",
)
def q_partition_custom_layout(spark, sf_dir):
    """Custom partitioner graded end-to-end (ref: DataStream.java
    partitionCustom:1137, Partitioner.java:30): the partition-assignment
    function is an md5-derived ``pid = h(user_id) % 8`` (engine-portable
    — DuckDB computes identical bits), rows are physically routed with
    ``Stream.partition_custom`` (a Spark hash exchange on the pid), and
    the graded output is the per-partition layout: row count, distinct
    users, exact value mass.  The layout stats double as the skew report
    a 100 TB job would check before trusting a custom route."""
    from my_flink_1_10_2_spark.streaming.stream import Stream

    e = read(spark, sf_dir, "events").select(
        "user_id",
        F.round(F.col("value") * 10000).cast("bigint").alias("v_e4"),
    )
    pid = (
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10)
        .cast("bigint")
        % 8
    ).cast("int")
    routed = Stream(e.withColumn("pid", pid)).partition_custom("pid", 8).df
    return (
        routed.groupBy("pid")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
            F.sum("v_e4").cast("bigint").alias("v_sum_e4"),
        )
        .orderBy("pid")
    )


@register(
    "q_sampling_budget",
    oracle=r"""
    WITH s AS (
      SELECT source,
             CAST(sum(len(str_split_regex(text, '\s+'))) AS BIGINT) AS n_tokens
      FROM documents GROUP BY 1
    ),
    t AS (SELECT *, sum(n_tokens) OVER () AS total FROM s),
    b AS (
      SELECT source, n_tokens,
             (100000 * n_tokens) // total AS base_alloc,
             (100000 * n_tokens) % total AS rem,
             100000 - sum((100000 * n_tokens) // total) OVER () AS leftover
      FROM t
    ),
    r AS (SELECT *, row_number() OVER (ORDER BY rem DESC, source) AS rk FROM b)
    SELECT source, n_tokens, CAST(base_alloc AS BIGINT) AS base_alloc,
           CAST(base_alloc + CASE WHEN rk <= leftover THEN 1 ELSE 0 END
                AS BIGINT) AS final_alloc
    FROM r ORDER BY source
    """,
    category="pipeline",
)
def q_sampling_budget(spark, sf_dir):
    """Largest-remainder (Hamilton) token-budget allocation: a 100k-token
    sampling budget split across sources proportionally to their token
    mass, floors first, then the leftover units to the largest
    remainders (ties by source) — the integer-exact quota step a
    curation pipeline runs before weighted sampling, guaranteeing the
    allocations sum EXACTLY to the budget.

    The corpus collapses to one row per source before any window runs
    (same shape as q_mixture_weights); every step is BIGINT arithmetic,
    so both engines agree bitwise."""
    docs = read(spark, sf_dir, "documents")
    s = docs.groupBy("source").agg(
        F.sum(F.size(F.split("text", r"\s+"))).cast("bigint").alias("n_tokens")
    )
    w = Window.partitionBy()
    b = s.select(
        "source",
        "n_tokens",
        F.expr("100000 * n_tokens").alias("__scaled"),
        F.sum("n_tokens").over(w).alias("__total"),
    ).select(
        "source",
        "n_tokens",
        F.expr("__scaled DIV __total").alias("base_alloc"),
        F.expr("__scaled % __total").alias("__rem"),
    )
    b = b.withColumn(
        "__leftover", F.lit(100000) - F.sum("base_alloc").over(w)
    ).withColumn(
        "__rk",
        F.row_number().over(
            Window.orderBy(F.col("__rem").desc(), F.col("source"))
        ),
    )
    return b.select(
        "source",
        "n_tokens",
        F.col("base_alloc").cast("bigint").alias("base_alloc"),
        (
            F.col("base_alloc")
            + F.when(F.col("__rk") <= F.col("__leftover"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("final_alloc"),
    ).orderBy("source")


@register(
    "q_copurchase_affinity",
    oracle="""
    WITH li AS (
      SELECT DISTINCT l_orderkey AS okey, l_partkey AS pkey FROM lineitem
    ),
    n AS (SELECT CAST(count(DISTINCT okey) AS BIGINT) AS n_orders FROM li),
    pc AS (SELECT pkey, CAST(count(*) AS BIGINT) AS n_p FROM li GROUP BY 1),
    pairs AS (
      SELECT a.pkey AS part_a, b.pkey AS part_b,
             CAST(count(*) AS BIGINT) AS n_ab
      FROM li a JOIN li b ON a.okey = b.okey AND a.pkey < b.pkey
      GROUP BY 1, 2
    )
    SELECT part_a, part_b, n_ab,
           CAST((n_ab * n.n_orders * 1000000) // (pa.n_p * pb.n_p)
                AS BIGINT) AS lift_e6
    FROM pairs
    JOIN pc pa ON pa.pkey = part_a
    JOIN pc pb ON pb.pkey = part_b
    CROSS JOIN n
    WHERE n_ab >= 2
    ORDER BY n_ab DESC, part_a, part_b
    LIMIT 50
    """,
    category="pipeline",
)
def q_copurchase_affinity(spark, sf_dir):
    """Market-basket co-purchase affinity: part pairs appearing in the
    same order, with the integer-exact lift
    ``(n_ab · n_orders · 1e6) // (n_a · n_b)`` — the association metric
    behind recommendation candidate generation.

    Scale shape: pairs are generated ORDER-LOCALLY from the basket
    array (one groupBy(okey) shuffle, then a map-side double-slice
    enumeration — an order with m items yields m·(m-1)/2 pairs, bounded
    by the basket size; never a cartesian, and one exchange cheaper
    than the okey self-join it replaces), pair counts shuffle on the
    (a, b) key, the per-part counts join is a broadcast (part-sized
    relation), and the top-50 is TakeOrdered — no global sort."""
    from my_flink_1_10_2_spark.operators.hints import dim

    li = (
        read(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("okey"), F.col("l_partkey").alias("pkey"))
        .distinct()
        # four consumers (order count, part counts, both join sides):
        # materialize the dedup once instead of re-running its shuffle —
        # lazily, so the order count below is the materializing job
        .localCheckpoint(eager=False)
    )
    n_orders = li.select("okey").distinct().count()
    pc = li.groupBy("pkey").agg(F.count(F.lit(1)).cast("bigint").alias("n_p"))
    baskets = li.groupBy("okey").agg(
        F.sort_array(F.collect_list("pkey")).alias("ps")
    )
    pair_gen = F.explode(
        F.expr(
            "flatten(transform(ps, (x, i) -> "
            "transform(slice(ps, i + 2, size(ps) - i - 1), "
            "y -> struct(x AS part_a, y AS part_b))))"
        )
    )
    pairs = (
        baskets.select(pair_gen.alias("p"))
        .select("p.part_a", "p.part_b")
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_ab"))
        .where(F.col("n_ab") >= 2)
    )
    out = (
        pairs.join(dim(pc.select(F.col("pkey").alias("part_a"), F.col("n_p").alias("__na"))), "part_a")
        .join(dim(pc.select(F.col("pkey").alias("part_b"), F.col("n_p").alias("__nb"))), "part_b")
        .select(
            "part_a",
            "part_b",
            "n_ab",
            F.expr(f"(n_ab * {n_orders}L * 1000000L) DIV (__na * __nb)")
            .cast("bigint")
            .alias("lift_e6"),
        )
    )
    return out.orderBy(F.col("n_ab").desc(), "part_a", "part_b").limit(50)


@register(
    "q_cascade_rollup_daily",
    oracle="""
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(round(value * 10000) AS BIGINT)) AS BIGINT) AS v_sum_e4,
           CAST(min(CAST(round(value * 10000) AS BIGINT)) AS BIGINT) AS v_min_e4,
           CAST(max(CAST(round(value * 10000) AS BIGINT)) AS BIGINT) AS v_max_e4
    FROM events
    GROUP BY 1
    ORDER BY 1
    """,
    category="window",
)
def q_cascade_rollup_daily(spark, sf_dir):
    """Cascaded continuous aggregate: the DAILY rollup is computed FROM
    the hourly partial aggregates (sum of sums, count of counts, min of
    mins, max of maxs), never from the raw events — the hierarchical
    materialization pattern of timeseries stores, and the reason only
    ALGEBRAIC aggregates belong in a base rollup.

    Graded against a direct one-level daily oracle: the cascade must be
    lossless.  At 100 TB the hourly relation the second aggregate scans
    is ~4 orders of magnitude smaller than the events it summarizes."""
    hourly = (
        read(spark, sf_dir, "events")
        .select(
            F.date_trunc("hour", "ts").alias("hour"),
            F.round(F.col("value") * 10000).cast("bigint").alias("v_e4"),
        )
        .groupBy("hour")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("v_e4").cast("bigint").alias("v_sum_e4"),
            F.min("v_e4").cast("bigint").alias("v_min_e4"),
            F.max("v_e4").cast("bigint").alias("v_max_e4"),
        )
    )
    return (
        hourly.groupBy(F.date_trunc("day", "hour").alias("day"))
        .agg(
            F.sum("n").cast("bigint").alias("n"),
            F.sum("v_sum_e4").cast("bigint").alias("v_sum_e4"),
            F.min("v_min_e4").cast("bigint").alias("v_min_e4"),
            F.max("v_max_e4").cast("bigint").alias("v_max_e4"),
        )
        .orderBy("day")
    )


@register(
    "q_ivm_delta_merge",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(sum(CAST(round(value * 10000) AS BIGINT)) AS BIGINT) AS v_sum_e4
    FROM events
    GROUP BY 1
    ORDER BY 1
    """,
    category="streaming",
)
def q_ivm_delta_merge(spark, sf_dir):
    """Incremental view maintenance: the materialized per-type aggregate
    over the BASE epochs merges with the last epoch's DELTA partials —
    accumulate(base) ⊕ accumulate(delta) must equal the full recompute
    (ref: flink-table .../aggregate/GroupAggFunction.java:48 — the
    accumulator merge contract every streaming materialized view relies
    on).  COUNT/SUM merge by addition; COUNT DISTINCT merges by unioning
    the distinct (type, user) keysets BEFORE counting — the split-
    distinct rewrite, not an (incorrect) sum of partial distincts.

    Graded against the one-shot oracle over all events: the maintenance
    path is lossless.  At 100 TB only the delta is scanned per refresh;
    the base relation is rollup-sized."""
    e = read(spark, sf_dir, "events").select(
        "event_type",
        "user_id",
        F.round(F.col("value") * 10000).cast("bigint").alias("v_e4"),
        F.expr(f"unix_micros(CAST(ts AS TIMESTAMP)) DIV {_WEEK_US}").alias("__wk"),
    )
    last_wk = e.agg(F.max("__wk")).first()[0]
    base, delta = e.where(F.col("__wk") < last_wk), e.where(F.col("__wk") == last_wk)

    def partials(df):
        return df.groupBy("event_type").agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("v_e4").cast("bigint").alias("v_sum_e4"),
        )

    merged = (
        partials(base)
        .unionByName(partials(delta))
        .groupBy("event_type")
        .agg(
            F.sum("n").cast("bigint").alias("n"),
            F.sum("v_sum_e4").cast("bigint").alias("v_sum_e4"),
        )
    )
    # distinct-agg maintenance: the keyset union precedes the count
    users = (
        base.select("event_type", "user_id")
        .distinct()
        .unionByName(delta.select("event_type", "user_id").distinct())
        .distinct()
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
    )
    return (
        merged.join(users, "event_type")
        .select("event_type", "n", "n_users", "v_sum_e4")
        .orderBy("event_type")
    )


@register(
    "q_skyline_pareto",
    oracle="""
    SELECT p_partkey, p_retailprice, p_size
    FROM part p
    WHERE NOT EXISTS (
      SELECT 1 FROM part q
      WHERE q.p_retailprice <= p.p_retailprice AND q.p_size >= p.p_size
        AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size)
    )
    ORDER BY p_partkey
    """,
    category="relational",
)
def q_skyline_pareto(spark, sf_dir):
    """Skyline (Pareto frontier) operator: parts not dominated on
    (minimize retail price, maximize size) — the multi-criteria shortlist
    query (Börzsönyi/Kossmann/Stocker, "The Skyline Operator", ICDE
    2001).

    The O(n²) dominance join is avoided: prices pre-aggregate to one row
    per DISTINCT price with its max size, a running max over the sorted
    price axis gives the strictest cheaper competitor, and a part
    survives iff it beats every strictly-cheaper price's best size AND
    ties its own price's best.  The running max is
    operators/rank.py::global_running (range-partitioned — the distinct
    price domain is row-granularity at 100 TB, never one task); the
    oracle is the independent NOT EXISTS formulation, so the
    frontier recursion is cross-checked against brute-force dominance."""
    from my_flink_1_10_2_spark.operators.rank import global_running

    p = read(spark, sf_dir, "part").select("p_partkey", "p_retailprice", "p_size")
    per_price = p.groupBy("p_retailprice").agg(F.max("p_size").alias("__best"))
    frontier = global_running(
        per_price, ["p_retailprice"], [("__cheaper_best", "__best", "max", False)]
    )
    return (
        p.join(frontier, "p_retailprice")
        .where(
            (F.col("p_size") == F.col("__best"))
            & (
                F.col("__cheaper_best").isNull()
                | (F.col("p_size") > F.col("__cheaper_best"))
            )
        )
        .select("p_partkey", "p_retailprice", "p_size")
        .orderBy("p_partkey")
    )


@register(
    "q_window_ntile_dist",
    oracle="""
    WITH t AS (
      SELECT event_type,
             CAST(round(value * 10000) AS BIGINT) AS v_e4,
             ntile(4) OVER w AS tile,
             percent_rank() OVER w AS pr,
             cume_dist() OVER w AS cd
      FROM events
      WINDOW w AS (PARTITION BY event_type
                   ORDER BY CAST(round(value * 10000) AS BIGINT), event_id)
    )
    SELECT event_type, CAST(tile AS BIGINT) AS tile,
           CAST(count(*) AS BIGINT) AS n,
           CAST(min(v_e4) AS BIGINT) AS v_min_e4,
           CAST(max(v_e4) AS BIGINT) AS v_max_e4,
           max(pr) AS max_pct_rank,
           max(cd) AS max_cume_dist
    FROM t
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
    category="analytic",
)
def q_window_ntile_dist(spark, sf_dir):
    """NTILE / PERCENT_RANK / CUME_DIST — the distribution-rank trio of
    the OVER-window family (ref: flink-table .../sql/fun/
    SqlStdOperatorTable NTILE/PERCENT_RANK/CUME_DIST): quartile
    assignment over a TOTAL order ((value, event_id) — ntile is only
    deterministic under a total order), summarized per (type, quartile).

    percent_rank = (rank-1)/(n-1) and cume_dist = n_le/n are single
    divisions of identical integer operands in both engines — bitwise
    equal, no rounding protocol needed."""
    from pyspark.sql import Window as W

    e = read(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        F.round(F.col("value") * 10000).cast("bigint").alias("v_e4"),
    )
    w = W.partitionBy("event_type").orderBy("v_e4", "event_id")
    t = e.select(
        "event_type",
        "v_e4",
        F.ntile(4).over(w).alias("tile"),
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
    )
    return (
        t.groupBy("event_type", F.col("tile").cast("bigint").alias("tile"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.min("v_e4").cast("bigint").alias("v_min_e4"),
            F.max("v_e4").cast("bigint").alias("v_max_e4"),
            F.max("pr").alias("max_pct_rank"),
            F.max("cd").alias("max_cume_dist"),
        )
        .orderBy("event_type", "tile")
    )


@register(
    "q_event_time_inversions",
    oracle="""
    WITH t AS (
      SELECT event_type,
             epoch_us(ts) - lag(epoch_us(ts)) OVER (
               PARTITION BY user_id, event_type ORDER BY event_id) AS step_us
      FROM events
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_steps,
           CAST(sum(CASE WHEN step_us < 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_inversions,
           CAST(coalesce(min(CASE WHEN step_us < 0 THEN step_us END), 0)
                AS BIGINT) AS max_backstep_us
    FROM t WHERE step_us IS NOT NULL
    GROUP BY 1 ORDER BY 1
    """,
    category="analytic",
)
def q_event_time_inversions(spark, sf_dir):
    """Event-time disorder report: per stream (user, type), how often
    does event time step BACKWARDS along the arrival order (event_id),
    and by how much — the out-of-orderness measurement that sizes a
    watermark delay (ref: BoundedOutOfOrdernessTimestampExtractor.java:70
    — this query computes the `maxOutOfOrderness` its user must pick).

    One keyed lag window, integer microsecond arithmetic, rollup per
    type: the shuffle carries (user, type)-partitioned rows once."""
    from pyspark.sql import Window as W

    e = read(spark, sf_dir, "events").select(
        "event_type",
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("te"),
    )
    w = W.partitionBy("user_id", "event_type").orderBy("event_id")
    t = e.select(
        "event_type", (F.col("te") - F.lag("te").over(w)).alias("step_us")
    ).where(F.col("step_us").isNotNull())
    return (
        t.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_steps"),
            F.sum(F.when(F.col("step_us") < 0, 1).otherwise(0))
            .cast("bigint")
            .alias("n_inversions"),
            F.coalesce(
                F.min(F.when(F.col("step_us") < 0, F.col("step_us"))), F.lit(0)
            )
            .cast("bigint")
            .alias("max_backstep_us"),
        )
        .orderBy("event_type")
    )


@register(
    "q_cumulative_distinct_users",
    oracle="""
    WITH first_seen AS (
      SELECT user_id,
             min(CAST(date_trunc('day', ts) AS TIMESTAMP)) AS day
      FROM events GROUP BY 1
    ),
    daily_new AS (
      SELECT day, CAST(count(*) AS BIGINT) AS new_users
      FROM first_seen GROUP BY 1
    ),
    active AS (
      SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
             CAST(count(DISTINCT user_id) AS BIGINT) AS active_users
      FROM events GROUP BY 1
    )
    SELECT a.day, a.active_users,
           CAST(coalesce(n.new_users, 0) AS BIGINT) AS new_users,
           CAST(sum(coalesce(n.new_users, 0)) OVER (ORDER BY a.day)
                AS BIGINT) AS cumulative_users
    FROM active a LEFT JOIN daily_new n ON n.day = a.day
    ORDER BY a.day
    """,
    category="analytic",
)
def q_cumulative_distinct_users(spark, sf_dir):
    """Cumulative distinct users per day WITHOUT a cumulative re-scan:
    distinct-over-growing-prefix collapses to `first-seen day per user →
    daily new-user counts → running sum` — the incremental formulation
    every growth dashboard needs at scale (a naive per-day COUNT(DISTINCT
    ... WHERE ts <= d) rescans the corpus |days| times; this scans it
    once).

    The running sum walks the day domain through
    operators/rank.py::global_running (range-partitioned — never an
    unpartitioned window); the heavy lifting is two keyed aggregates."""
    from my_flink_1_10_2_spark.operators.rank import global_running

    e = read(spark, sf_dir, "events").select(
        F.date_trunc("day", "ts").alias("day"), "user_id"
    )
    # one corpus scan: the (day, user) dedup feeds BOTH daily actives
    # and the per-user first-seen day
    du = e.groupBy("day", "user_id").agg(F.lit(1)).select("day", "user_id")
    du = du.localCheckpoint(eager=True)
    first_seen = du.groupBy("user_id").agg(F.min("day").alias("day"))
    daily_new = first_seen.groupBy("day").agg(
        F.count(F.lit(1)).cast("bigint").alias("new_users")
    )
    active = du.groupBy("day").agg(
        F.count(F.lit(1)).cast("bigint").alias("active_users")
    )
    out = active.join(daily_new, "day", "left").select(
        "day",
        "active_users",
        F.coalesce("new_users", F.lit(0)).cast("bigint").alias("new_users"),
    )
    return (
        global_running(out, ["day"], [("__cum", "new_users", "sum", True)])
        .withColumn("cumulative_users", F.col("__cum").cast("bigint"))
        .drop("__cum")
        .orderBy("day")
    )


@register(
    "q_weighted_median_price",
    oracle="""
    WITH w AS (
      SELECT l_returnflag AS flag,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS price_e2,
             CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS wt
      FROM lineitem GROUP BY 1, 2
    ),
    c AS (
      SELECT flag, price_e2, wt,
             sum(wt) OVER (PARTITION BY flag ORDER BY price_e2) AS cumw,
             sum(wt) OVER (PARTITION BY flag) AS total
      FROM w
    )
    SELECT flag, CAST(min(total) AS BIGINT) AS total_weight,
           CAST(min(CASE WHEN 2 * cumw >= total THEN price_e2 END)
                AS BIGINT) AS wmedian_price_e2
    FROM c GROUP BY flag ORDER BY flag
    """,
    category="analytic",
)
def q_weighted_median_price(spark, sf_dir):
    """WEIGHTED lower median: the smallest price whose cumulative
    quantity weight reaches half the total — the weighted quantile a
    sampling pipeline uses when rows carry multiplicities (tokens,
    quantities, repetition counts), which the unweighted median family
    (q_udaf_median, q_group_quantiles) cannot express.

    Two-phase exact search, the 100 TB shape: a naive cumulative window
    PARTITION BY flag sorts the whole near-distinct price relation on
    |flags| tasks.  Instead, pass 1 rolls the scan straight up to
    (flag, price DIV 1e5) — ~1000 coarse buckets, so the shuffle after
    map-side combine is O(flags x buckets), never O(distinct prices) —
    a window over THAT finds the bucket holding the half-total point
    and the exact prefix weight before it, and pass 2 re-scans with a
    broadcast semi-filter to the one selected bucket per flag, grouping
    by exact price only inside it.  Both windows walk bucket-bounded
    relations; every step is exact BIGINT arithmetic (2·cum >= total —
    no division)."""
    from pyspark.sql import Window as W

    from my_flink_1_10_2_spark.operators.hints import dim

    bucket_sz = 100_000  # 1e3 currency units per bucket
    li = read(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("price_e2"),
        F.round(F.col("l_quantity")).cast("bigint").alias("qty"),
    )
    li = li.withColumn("bkt", F.expr(f"price_e2 DIV {bucket_sz}"))

    bw = li.groupBy("flag", "bkt").agg(F.sum("qty").cast("bigint").alias("bwt"))
    cum = bw.select(
        "flag",
        "bkt",
        "bwt",
        F.sum("bwt").over(W.partitionBy("flag").orderBy("bkt")).alias("bcum"),
        F.sum("bwt").over(W.partitionBy("flag")).alias("total"),
    )
    # the single bucket per flag where the half-total point lands, plus
    # the exact cumulative weight of every bucket before it
    target = (
        cum.where(2 * F.col("bcum") >= F.col("total"))
        .groupBy("flag")
        .agg(
            F.min_by(F.struct("bkt", "bcum", "bwt", "total"), "bkt").alias("t")
        )
        .select(
            "flag",
            F.col("t.bkt").alias("bkt"),
            (F.col("t.bcum") - F.col("t.bwt")).alias("prefix_w"),
            F.col("t.total").alias("total"),
        )
    )
    # pass 2: one bucket's raw rows per flag (broadcast join = scan-side
    # filter), exact per-price rollup only inside it
    fine = (
        li.join(dim(target), ["flag", "bkt"])
        .groupBy("flag", "price_e2", "prefix_w", "total")
        .agg(F.sum("qty").cast("bigint").alias("wt"))
    )
    c = fine.select(
        "flag",
        "price_e2",
        "total",
        (
            F.col("prefix_w")
            + F.sum("wt").over(W.partitionBy("flag").orderBy("price_e2"))
        ).alias("cumw"),
    )
    return (
        c.groupBy("flag")
        .agg(
            F.min("total").cast("bigint").alias("total_weight"),
            F.min(
                F.when(2 * F.col("cumw") >= F.col("total"), F.col("price_e2"))
            )
            .cast("bigint")
            .alias("wmedian_price_e2"),
        )
        .orderBy("flag")
    )


@register(
    "q_cep_timeout_funnel",
    oracle="""
    WITH e AS (
      SELECT user_id, event_id, ts, event_type FROM events
      WHERE event_type IN ('click', 'purchase')
    ),
    c AS (SELECT user_id, event_id AS start_id, ts FROM e
          WHERE event_type = 'click')
    SELECT CASE WHEN EXISTS (
             SELECT 1 FROM e p
             WHERE p.user_id = c.user_id AND p.event_type = 'purchase'
               AND (p.ts > c.ts OR (p.ts = c.ts AND p.event_id > c.start_id))
               AND epoch_us(p.ts) - epoch_us(c.ts) <= 86400000000
           ) THEN 'match' ELSE 'timeout' END AS side,
           user_id, start_id
    FROM c
    ORDER BY user_id, start_id
    """,
    category="cep",
)
def q_cep_timeout_funnel(spark, sf_dir):
    """CEP TIMEOUT side output graded e2e (ref: flink-cep
    PatternStream.java select(OutputTag, PatternTimeoutFunction,
    PatternSelectFunction)): click →followed_by purchase within 1 day
    per user; completed funnels emit on the match side, clicks whose
    window expired while still waiting emit their partial on the
    timeout side — the SLA-breach monitor pattern.

    The oracle is the independent EXISTS formulation: a relaxed
    (followedBy) run never dies, so match/timeout is exactly the
    purchase-within-window predicate.  The NFA runs key-parallel over
    the two relevant event types only (relaxed contiguity is invariant
    to dropping never-matching rows)."""
    from my_flink_1_10_2_spark.operators.cep import (
        Pattern,
        match_recognize_with_timeouts,
    )

    e = (
        read(spark, sf_dir, "events")
        .where(F.col("event_type").isin("click", "purchase"))
        .select("user_id", "event_id", F.col("ts").cast("timestamp_ntz").alias("ts"), "event_type")
    )
    pattern = (
        Pattern.begin("a", lambda r, c: r["event_type"] == "click")
        .followed_by("b", lambda r, c: r["event_type"] == "purchase")
        .within("1 day")
    )
    out = match_recognize_with_timeouts(
        e,
        partition_by=["user_id"],
        order_by=["ts", "event_id"],
        pattern=pattern,
        measures={
            "user_id": lambda m: int(m["a"][0]["user_id"]),
            "start_id": lambda m: int(m["a"][0]["event_id"]),
        },
        timeout_measures={
            "user_id": lambda m: int(m["a"][0]["user_id"]),
            "start_id": lambda m: int(m["a"][0]["event_id"]),
        },
        output_schema="side string, user_id long, start_id long",
        after_match="skip_to_next_row",
    )
    return out.orderBy("user_id", "start_id")


@register(
    "q_kl_divergence_sources",
    oracle=r"""
    WITH words AS (
      SELECT source,
             unnest(list_filter(str_split_regex(lower(text), '\s+'),
                                t -> t != '')) AS term
      FROM documents
    ),
    st AS (SELECT source, term, CAST(count(*) AS BIGINT) AS c_st
           FROM words GROUP BY 1, 2),
    ts AS (SELECT source, CAST(sum(c_st) AS BIGINT) AS t_s FROM st GROUP BY 1),
    ct AS (SELECT term, CAST(sum(c_st) AS BIGINT) AS c_t FROM st GROUP BY 1),
    tt AS (SELECT CAST(sum(c_t) AS BIGINT) AS t FROM ct),
    lq AS (
      SELECT v, CAST(round(ln(CAST(v AS DOUBLE)) * 1000000000.0) AS BIGINT)
               AS l
      FROM (SELECT DISTINCT c_st AS v FROM st
            UNION SELECT DISTINCT t_s FROM ts
            UNION SELECT DISTINCT c_t FROM ct
            UNION SELECT t FROM tt)
    )
    SELECT st.source, min(ts.t_s) AS n_tokens,
           CAST(sum(st.c_st * (lst.l - lts.l - lct.l + ltt.l)) AS BIGINT)
             AS kl_num_e9
    FROM st
    JOIN ts ON ts.source = st.source
    JOIN ct ON ct.term = st.term
    CROSS JOIN tt
    JOIN lq lst ON lst.v = st.c_st
    JOIN lq lts ON lts.v = ts.t_s
    JOIN lq lct ON lct.v = ct.c_t
    JOIN lq ltt ON ltt.v = tt.t
    GROUP BY st.source
    ORDER BY st.source
    """,
    category="pipeline",
)
def q_kl_divergence_sources(spark, sf_dir):
    """Per-source KL divergence from the corpus unigram distribution —
    the domain-shift metric a curation pipeline watches when mixing
    sources:  T_s·KL(P_s ‖ P) = Σ_t c_st·(ln c_st − ln T_s − ln c_t +
    ln T), reported in exact 1e-9 integer units (division-free: every
    log is quantized through the libm Arrow UDF over the DISTINCT count
    values, then the graded value is a pure BIGINT weighted sum — the
    q_term_pmi protocol).

    Scale shape: counts are two grouped aggregates; the log table is
    distinct-count-value-sized and broadcast back; no floats in any
    shuffled or graded value."""
    import math

    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import DoubleType

    from my_flink_1_10_2_spark.operators.hints import dim

    def _ln():
        def kernel(s):
            return pd.Series([math.log(float(v)) for v in s], dtype="float64")

        kernel.__annotations__ = {"s": pd.Series, "return": pd.Series}
        return pandas_udf(kernel, DoubleType())

    docs = read(spark, sf_dir, "documents")
    words = docs.select(
        "source",
        F.explode(
            F.filter(F.split(F.lower("text"), r"\s+"), lambda t: t != "")
        ).alias("term"),
    )
    st = words.groupBy("source", "term").agg(
        F.count("*").cast("bigint").alias("c_st")
    )
    ts = st.groupBy("source").agg(F.sum("c_st").cast("bigint").alias("t_s"))
    ct = st.groupBy("term").agg(F.sum("c_st").cast("bigint").alias("c_t"))
    tt = ct.agg(F.sum("c_t").cast("bigint").alias("t"))
    ln = _ln()
    vals = (
        st.select(F.col("c_st").alias("v"))
        .unionByName(ts.select(F.col("t_s").alias("v")))
        .unionByName(ct.select(F.col("c_t").alias("v")))
        .unionByName(tt.select(F.col("t").alias("v")))
        .distinct()
        .withColumn("l", F.round(ln(F.col("v").cast("double")) * 1e9).cast("bigint"))
    )
    j = (
        st.join(dim(ts), "source")
        .join(dim(ct), "term")
        .crossJoin(dim(tt))
        .join(dim(vals.select(F.col("v").alias("c_st"), F.col("l").alias("l_st"))), "c_st")
        .join(dim(vals.select(F.col("v").alias("t_s"), F.col("l").alias("l_ts"))), "t_s")
        .join(dim(vals.select(F.col("v").alias("c_t"), F.col("l").alias("l_ct"))), "c_t")
        .join(dim(vals.select(F.col("v").alias("t"), F.col("l").alias("l_tt"))), "t")
    )
    return (
        j.groupBy("source")
        .agg(
            F.min("t_s").cast("bigint").alias("n_tokens"),
            F.sum(
                F.col("c_st")
                * (F.col("l_st") - F.col("l_ts") - F.col("l_ct") + F.col("l_tt"))
            )
            .cast("bigint")
            .alias("kl_num_e9"),
        )
        .orderBy("source")
    )


@register(
    "q_unpivot_stack",
    oracle="""
    SELECT p_partkey, 'size' AS metric, CAST(p_size AS BIGINT) AS value
    FROM part
    UNION ALL
    SELECT p_partkey, 'price_e2' AS metric,
           CAST(round(p_retailprice * 100) AS BIGINT) AS value
    FROM part
    ORDER BY p_partkey, metric
    """,
    category="relational",
)
def q_unpivot_stack(spark, sf_dir):
    """UNPIVOT (wide → long): each part row explodes into one row per
    metric — the feature-table melt every training pipeline runs before
    per-feature statistics.  Spark's native ``unpivot`` (ids/values
    form); the oracle is the equivalent UNION ALL.

    Scale: a projection-only Generate — no shuffle until a downstream
    aggregate, and column pruning still reaches the scan."""
    p = read(spark, sf_dir, "part").select(
        "p_partkey",
        F.col("p_size").cast("bigint").alias("size"),
        F.round(F.col("p_retailprice") * 100).cast("bigint").alias("price_e2"),
    )
    return (
        p.unpivot("p_partkey", ["size", "price_e2"], "metric", "value")
        .orderBy("p_partkey", "metric")
    )


@register(
    "q_pivot_multi_agg",
    oracle="""
    SELECT l_returnflag AS flag,
           CAST(count(*) FILTER (WHERE l_linestatus = 'F') AS BIGINT) AS f_n,
           CAST(coalesce(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                         FILTER (WHERE l_linestatus = 'F'), 0) AS BIGINT)
             AS f_price_e2,
           CAST(count(*) FILTER (WHERE l_linestatus = 'O') AS BIGINT) AS o_n,
           CAST(coalesce(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                         FILTER (WHERE l_linestatus = 'O'), 0) AS BIGINT)
             AS o_price_e2
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY flag
    """,
    category="relational",
)
def q_pivot_multi_agg(spark, sf_dir):
    """PIVOT with MULTIPLE aggregates per pivot value (count + exact
    price mass per line status) — the wide-report shape; Spark's
    ``pivot`` with a multi-agg list produces the value-suffixed columns,
    here renamed to the oracle's FILTER-clause spellings.

    One scan, one hash aggregate with map-side partials — the pivot is
    a projection layout, not an extra pass."""
    li = read(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        "l_linestatus",
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("price_e2"),
    )
    wide = (
        li.groupBy("flag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.sum("price_e2"), F.lit(0)).alias("price_e2"),
        )
    )
    return wide.select(
        "flag",
        F.coalesce(F.col("F_n"), F.lit(0)).cast("bigint").alias("f_n"),
        F.coalesce(F.col("F_price_e2"), F.lit(0)).cast("bigint").alias("f_price_e2"),
        F.coalesce(F.col("O_n"), F.lit(0)).cast("bigint").alias("o_n"),
        F.coalesce(F.col("O_price_e2"), F.lit(0)).cast("bigint").alias("o_price_e2"),
    ).orderBy("flag")


@register(
    "q_gapfill_locf",
    oracle="""
    WITH hourly AS (
      SELECT event_type, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hr,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(round(value * 10000) AS BIGINT)) AS BIGINT)
               AS v_sum_e4
      FROM events WHERE event_id < 3000 GROUP BY 1, 2
    ),
    bounds AS (
      SELECT event_type, min(hr) AS lo, max(hr) AS hi FROM hourly GROUP BY 1
    ),
    grid AS (
      SELECT b.event_type, unnest(generate_series(b.lo, b.hi,
                                                  INTERVAL 1 HOUR)) AS hr
      FROM bounds b
    ),
    joined AS (
      SELECT g.event_type, g.hr,
             coalesce(h.n, 0) AS n, h.v_sum_e4
      FROM grid g LEFT JOIN hourly h
        ON h.event_type = g.event_type AND h.hr = g.hr
    )
    SELECT event_type, hr, CAST(n AS BIGINT) AS n,
           CAST(coalesce(last_value(v_sum_e4 IGNORE NULLS) OVER (
                  PARTITION BY event_type ORDER BY hr
                  ROWS UNBOUNDED PRECEDING), 0) AS BIGINT) AS v_sum_locf_e4,
           CAST(CASE WHEN n = 0 THEN 1 ELSE 0 END AS BIGINT) AS gap_filled
    FROM joined
    ORDER BY event_type, hr
    """,
    category="window",
)
def q_gapfill_locf(spark, sf_dir):
    """Timeseries gap-fill + last-observation-carried-forward: the dense
    hourly grid per series (missing buckets materialized with n = 0) and
    the LOCF value every monitoring rollup needs for continuous charts
    — the timeseries-db `time_bucket_gapfill`/`locf` pair as one
    declarative plan.

    The grid generates from per-series [min, max] bounds (a sequence
    explode — series-bounded, not data-sized), the left join is on the
    (series, hour) key, and the LOCF is one IGNORE NULLS window per
    series."""
    from pyspark.sql import Window as W

    hourly = (
        read(spark, sf_dir, "events")
        .where("event_id < 3000")
        .select(
            "event_type",
            F.date_trunc("hour", "ts").alias("hr"),
            F.round(F.col("value") * 10000).cast("bigint").alias("v_e4"),
        )
        .groupBy("event_type", "hr")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("v_e4").cast("bigint").alias("v_sum_e4"),
        )
    )
    bounds = hourly.groupBy("event_type").agg(
        F.min("hr").alias("lo"), F.max("hr").alias("hi")
    )
    grid = bounds.select(
        "event_type",
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
        ).alias("hr"),
    )
    joined = grid.join(hourly, ["event_type", "hr"], "left").select(
        "event_type",
        "hr",
        F.coalesce("n", F.lit(0)).cast("bigint").alias("n"),
        "v_sum_e4",
    )
    w = W.partitionBy("event_type").orderBy("hr").rowsBetween(
        W.unboundedPreceding, 0
    )
    return joined.select(
        "event_type",
        "hr",
        "n",
        F.coalesce(F.last("v_sum_e4", ignorenulls=True).over(w), F.lit(0))
        .cast("bigint")
        .alias("v_sum_locf_e4"),
        F.when(F.col("n") == 0, 1).otherwise(0).cast("bigint").alias("gap_filled"),
    ).orderBy("event_type", "hr")


@register(
    "q_multimodal_frame_sample",
    oracle="""
    WITH media AS (
      SELECT doc_id AS media_id,
             CASE WHEN doc_id % 2 = 0 THEN 'image/png'
                  ELSE 'audio/wav' END AS mime,
             text
      FROM documents
    ),
    frames AS (
      SELECT media_id, mime, i.i AS frame_idx,
             substr(text, i.i * 64 + 1, 64) AS frame
      FROM media CROSS JOIN (SELECT unnest(range(0, 4)) AS i) i
    )
    SELECT media_id, mime, CAST(frame_idx AS INT) AS frame_idx,
           CAST(length(frame) AS BIGINT) AS frame_len,
           md5(frame) AS frame_md5
    FROM frames WHERE length(frame) > 0
    ORDER BY media_id, frame_idx
    """,
    category="multimodal",
)
def q_multimodal_frame_sample(spark, sf_dir):
    """Multimodal FRAME SAMPLING graded e2e (the brief's frame-sample
    slot): deterministic byte-offset slices of the opaque payload stand
    in for video frame extraction — the Spark-side plumbing (binary
    column model, JVM-side substring, posexplode fan-out) is real; a
    production decoder swaps in at the same operator position.  Graded
    by per-frame length + md5 digest (payloads are ASCII, so byte and
    character offsets coincide — the oracle slices the string form).

    Plan: projection + Generate only — frame sampling shuffles nothing."""
    from my_flink_1_10_2_spark.llm.multimodal import (
        documents_as_media,
        frame_sample,
    )

    media = documents_as_media(read(spark, sf_dir, "documents"))
    frames = frame_sample(media, every_n_bytes=64, max_frames=4)
    return frames.select(
        "media_id",
        "mime",
        F.col("frame_idx").cast("int").alias("frame_idx"),
        F.length("frame_bytes").cast("bigint").alias("frame_len"),
        F.md5("frame_bytes").alias("frame_md5"),
    ).orderBy("media_id", "frame_idx")
