"""Event-time windows + time-oriented joins over the `events` rowtime table
(SURVEY §2.5 group windows, §2.4 interval/temporal joins).

These run here in batch mode (the driver's oracle protocol is batch); the
same expressions run unchanged over a streaming DataFrame with
``withWatermark`` — see my_flink_1_10_2_spark/streaming/ and the
streaming harness tests.

Reference: StreamExecGroupWindowAggregate.scala:33 (TUMBLE/HOP/SESSION),
TimeBoundedStreamJoin.java:52 (interval join),
TemporalRowTimeJoinOperator.java:71 (as-of join).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from my_flink_1_10_2_spark.operators.joins import asof_join, interval_join
from my_flink_1_10_2_spark.operators.windows import hop, session, tumble, with_window_bounds
from my_flink_1_10_2_spark.queries import read, register


@register(
    "q_tumble_window",
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start,
           date_trunc('hour', ts) + INTERVAL 1 HOUR AS window_end,
           event_type,
           count(*) AS cnt, sum(value) AS sum_value, avg(value) AS avg_value
    FROM events
    GROUP BY 1, 2, 3
    """,
    category="window",
)
def q_tumble_window(spark, sf_dir):
    """TUMBLE(ts, 1 hour) per event_type (ref: TumblingEventTimeWindows.java,
    FlinkSqlOperatorTable.java TUMBLE_START/TUMBLE_END)."""
    events = read(spark, sf_dir, "events")
    agg = tumble(events, "ts", "1 hour", ["event_type"]).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum("value").alias("sum_value"),
        F.avg("value").alias("avg_value"),
    )
    return agg.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        "event_type",
        "cnt",
        "sum_value",
        "avg_value",
    )


@register(
    "q_hop_window",
    oracle="""
    WITH offs AS (SELECT unnest([0, 1800]) AS off)
    SELECT make_timestamp(CAST((CAST(floor(epoch(ts) / 1800) AS BIGINT) * 1800 - off)
                               AS BIGINT) * 1000000) AS window_start,
           count(*) AS cnt, sum(value) AS sum_value
    FROM events CROSS JOIN offs
    GROUP BY 1
    """,
    category="window",
)
def q_hop_window(spark, sf_dir):
    """HOP(ts, slide 30 min, size 1 hour) (ref: SlidingEventTimeWindows.java).

    Every event lands in size/slide = 2 windows; the oracle replays that
    expansion with epoch arithmetic.
    """
    events = read(spark, sf_dir, "events")
    agg = hop(events, "ts", "1 hour", "30 minutes").agg(
        F.count(F.lit(1)).alias("cnt"), F.sum("value").alias("sum_value")
    )
    return agg.select(F.col("w.start").alias("window_start"), "cnt", "sum_value")


@register(
    "q_session_window",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts, value,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       > INTERVAL 30 MINUTE OR
                  lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
             THEN 1 ELSE 0 END AS is_new
      FROM events
    ), numbered AS (
      SELECT user_id, ts, value,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM marked
    )
    SELECT user_id,
           date_trunc('microseconds', min(ts)) AS session_start,
           date_trunc('microseconds', max(ts)) + INTERVAL 30 MINUTE AS session_end,
           count(*) AS cnt, sum(value) AS sum_value
    FROM numbered GROUP BY user_id, session_id
    """,
    category="window",
)
def q_session_window(spark, sf_dir):
    """SESSION(ts, gap 30 min) per user (ref: EventTimeSessionWindows.java,
    MergingWindowSet.java).  Spark's native session_window implements the
    same merge semantics; the oracle reconstructs sessions with the
    gaps-and-islands pattern.

    Note session_window end = last event + gap, exactly the reference's
    window end for session merges.
    """
    events = read(spark, sf_dir, "events")
    agg = session(events, "ts", "30 minutes", ["user_id"]).agg(
        F.count(F.lit(1)).alias("cnt"), F.sum("value").alias("sum_value")
    )
    return agg.select(
        "user_id",
        F.col("w.start").alias("session_start"),
        F.col("w.end").alias("session_end"),
        "cnt",
        "sum_value",
    )


@register(
    "q_interval_join",
    oracle="""
    SELECT a.event_id AS click_id, b.event_id AS purchase_id, a.user_id,
           date_trunc('microseconds', a.ts) AS click_ts,
           date_trunc('microseconds', b.ts) AS purchase_ts
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND a.event_type = 'click' AND b.event_type = 'purchase'
     AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 30 MINUTE
    """,
    category="join",
)
def q_interval_join(spark, sf_dir):
    """Interval join: purchases within 30 min after a click, same user
    (ref: KeyedStream.intervalJoin:415, TimeBoundedStreamJoin.java:52).

    The engine's interval_join keys the shuffle on user_id — the time
    range is a residual predicate, so no nested-loop blowup at scale.
    """
    events = read(spark, sf_dir, "events")
    clicks = events.filter("event_type = 'click'").select(
        F.col("event_id").alias("click_id"), "user_id", F.col("ts").alias("cts")
    )
    purchases = events.filter("event_type = 'purchase'").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("pts"),
    )
    joined = interval_join(
        clicks,
        purchases,
        key=("user_id", "p_user_id"),
        time=("cts", "pts"),
        lower="0 seconds",
        upper="30 minutes",
    )
    return joined.select(
        "click_id",
        "purchase_id",
        "user_id",
        F.col("cts").alias("click_ts"),
        F.col("pts").alias("purchase_ts"),
    )


@register(
    "q_asof_join",
    oracle="""
    SELECT p.event_id, p.user_id,
           date_trunc('microseconds', p.ts) AS ts,
           p.value AS purchase_value,
           c.value AS last_click_value,
           c.event_id AS last_click_id
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
    category="join",
)
def q_asof_join(spark, sf_dir):
    """As-of (temporal) join: each purchase picks up the latest prior click
    per user (ref: TemporalRowTimeJoinOperator.java:71, `FOR SYSTEM_TIME
    AS OF` probe semantics; DuckDB's native ASOF JOIN is the oracle).

    Engine implementation: union + last(ignorenulls) window — ONE shuffle
    by key, no point lookups (operators/joins.py:asof_join).
    """
    events = read(spark, sf_dir, "events")
    purchases = events.filter("event_type = 'purchase'").select(
        "event_id", "user_id", "ts", F.col("value").alias("purchase_value")
    )
    clicks = events.filter("event_type = 'click'").select(
        F.col("user_id").alias("c_user_id"),
        F.col("ts").alias("c_ts"),
        F.col("value").alias("last_click_value"),
        F.col("event_id").alias("last_click_id"),
    )
    return asof_join(
        purchases,
        clicks,
        key=("user_id", "c_user_id"),
        time=("ts", "c_ts"),
        right_value_cols=["last_click_value", "last_click_id"],
    )


@register(
    "q_sql_tumble_window",
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start,
           event_type, count(*) AS cnt, sum(value) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
    category="window",
)
def q_sql_tumble_window(spark, sf_dir):
    """Flink-dialect SQL through the rewriter (SURVEY §7.0 engine.sql):
    GROUP BY TUMBLE + TUMBLE_START run as Spark window() SQL."""
    from my_flink_1_10_2_spark.queries import register_views
    from my_flink_1_10_2_spark.session import TableEnvironment

    register_views(spark, sf_dir, "events")
    te = TableEnvironment(spark)
    return te.sql(
        "SELECT TUMBLE_START(ts, INTERVAL '1' HOUR) AS window_start, "
        "       event_type, count(*) AS cnt, sum(value) AS sum_value "
        "FROM events GROUP BY TUMBLE(ts, INTERVAL '1' HOUR), event_type"
    ).df


@register(
    "q_sql_hop_window",
    oracle="""
    WITH offs AS (SELECT unnest([0, 1800]) AS off)
    SELECT make_timestamp(CAST((CAST(floor(epoch(ts) / 1800) AS BIGINT) * 1800 - off)
                               AS BIGINT) * 1000000) AS window_start,
           count(*) AS cnt
    FROM events CROSS JOIN offs
    GROUP BY 1
    """,
    category="window",
)
def q_sql_hop_window(spark, sf_dir):
    """Flink-dialect HOP SQL (slide 30 min, size 1 hour) through the
    rewriter — note Flink's (slide, size) argument order."""
    from my_flink_1_10_2_spark.queries import register_views
    from my_flink_1_10_2_spark.session import TableEnvironment

    register_views(spark, sf_dir, "events")
    te = TableEnvironment(spark)
    return te.sql(
        "SELECT HOP_START(ts, INTERVAL '30' MINUTE, INTERVAL '1' HOUR) AS window_start, "
        "       count(*) AS cnt "
        "FROM events GROUP BY HOP(ts, INTERVAL '30' MINUTE, INTERVAL '1' HOUR)"
    ).df


@register(
    "q_session_window_dynamic_gap",
    oracle="""
    WITH gapped AS (
      SELECT user_id, ts, value,
             CASE WHEN event_type = 'purchase' THEN INTERVAL 60 MINUTE
                  ELSE INTERVAL 15 MINUTE END AS gap
      FROM events
    ), marked AS (
      SELECT user_id, ts, value, gap,
             CASE WHEN lag(ts + gap) OVER w IS NULL
                    OR ts > max(ts + gap) OVER (PARTITION BY user_id
                         ORDER BY ts ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  THEN 1 ELSE 0 END AS is_new
      FROM gapped
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), numbered AS (
      SELECT user_id, ts, value,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                               ROWS UNBOUNDED PRECEDING) AS session_id
      FROM marked
    )
    SELECT user_id, min(ts) AS session_start,
           count(*) AS n_events, sum(value) AS sum_value
    FROM numbered
    GROUP BY user_id, session_id
    """,
    category="window",
)
def q_session_window_dynamic_gap(spark, sf_dir):
    """Dynamic-gap session windows (ref:
    DynamicEventTimeSessionWindows.java — per-element gap extractor):
    purchases keep sessions alive 60 min, other events 15 min. Spark's
    session_window accepts a Column gap; the oracle replays the
    gaps-and-islands logic with a running max of ts+gap."""
    events = read(spark, sf_dir, "events")
    gap = F.when(F.col("event_type") == "purchase", F.lit("60 minutes")).otherwise(
        F.lit("15 minutes")
    )
    agg = (
        events.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
    )
    return agg.select(
        "user_id",
        F.col("w.start").alias("session_start"),
        "n_events",
        "sum_value",
    )


@register(
    "q_sql_ddl_tumble",
    oracle="""
    SELECT date_trunc('day', l_shipdate) AS window_start, l_returnflag,
           CAST(count(*) AS BIGINT) AS cnt, sum(l_quantity) AS sum_qty
    FROM lineitem
    GROUP BY 1, 2
    """,
    category="window",
)
def q_sql_ddl_tumble(spark, sf_dir):
    """The full SQL-text path in one query: CREATE TABLE ... WITH
    (path/format) registers the parquet source from DDL (ref
    SqlCreateTable.java:56), then Flink-dialect TUMBLE SQL runs through
    the rewriter against it. The DDL projection (3 of 11 columns) still
    reaches the scan as column pruning — nothing materializes at DDL
    time."""
    from my_flink_1_10_2_spark.session import TableEnvironment

    te = TableEnvironment(spark)
    te.execute_sql(
        f"""
        CREATE TABLE li_ddl (
          l_returnflag STRING,
          l_quantity DOUBLE,
          l_shipdate TIMESTAMP(3)
        ) WITH (
          'connector' = 'filesystem',
          'path' = '{sf_dir}/lineitem.parquet',
          'format' = 'parquet'
        )
        """
    )
    return te.sql(
        "SELECT TUMBLE_START(l_shipdate, INTERVAL '1' DAY) AS window_start, "
        "       l_returnflag, count(*) AS cnt, sum(l_quantity) AS sum_qty "
        "FROM li_ddl GROUP BY TUMBLE(l_shipdate, INTERVAL '1' DAY), l_returnflag"
    ).df


@register(
    "q_tumble_window_all",
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start,
           date_trunc('hour', ts) + INTERVAL 1 HOUR AS window_end,
           count(*) AS cnt, sum(value) AS sum_value, avg(value) AS avg_value
    FROM events
    GROUP BY 1, 2
    """,
    category="window",
)
def q_tumble_window_all(spark, sf_dir):
    """Non-keyed TUMBLE — the windowAll surface (ref:
    DataStream.timeWindowAll:579, AllWindowedStream.java:1). Unlike the
    reference, which funnels every row through one subtask, the Spark
    plan keeps the partial aggregation parallel and only |windows| rows
    cross the final exchange. Runs through the Stream API so the
    streaming and batch paths share the expression."""
    from my_flink_1_10_2_spark.streaming.stream import Stream

    events = read(spark, sf_dir, "events")
    out = (
        Stream(events)
        .tumble_all("ts", "1 hour")
        .aggregate(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("value").alias("sum_value"),
            F.avg("value").alias("avg_value"),
        )
    )
    return out.df


@register(
    "q_table_api_fluent_window",
    oracle="""
    SELECT CAST(to_timestamp(CAST(floor(epoch(ts) / 1800) AS BIGINT) * 1800)
                AS TIMESTAMP) AS w_start,
           event_type,
           count(*) AS cnt,
           CAST(sum(CAST(round(value * 10000) AS BIGINT)) AS BIGINT)
             AS value_e4
    FROM events
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
    category="window",
)
def q_table_api_fluent_window(spark, sf_dir):
    """The fluent Table-API group-window spelling end-to-end (ref:
    Tumble.java:47, Table.window → GroupWindowedTable →
    WindowGroupedTable): Tumble.over('30.minutes').on('ts').alias('w')
    with a select mixing w.start, a key and aggregates.  Integer 1e-4
    units keep the sum exact under any partial-agg order."""
    from my_flink_1_10_2_spark.operators.windows import Tumble
    from my_flink_1_10_2_spark.table import Table

    events = Table(read(spark, sf_dir, "events"))
    return (
        events.window(Tumble.over("30.minutes").on("ts").alias("w"))
        .group_by("w", "event_type")
        .select(
            "w.start AS w_start",
            "event_type",
            "count(*) AS cnt",
            "CAST(sum(CAST(round(value * 10000) AS BIGINT)) AS BIGINT) AS value_e4",
        )
        .order_by("w_start", "event_type")
        .to_df()
    )


@register(
    "q_fluent_window_join",
    oracle="""
    WITH a AS (SELECT event_type, ts, value FROM events WHERE event_id <= 300),
         b AS (SELECT event_type, ts, value FROM events
               WHERE event_id > 300 AND event_id <= 600)
    SELECT a.event_type,
           count(*) AS n_pairs,
           CAST(sum(CAST(round((a.value + b.value) * 10000) AS BIGINT)) AS BIGINT)
             AS pair_sum_e4
    FROM a JOIN b
      ON a.event_type = b.event_type
     AND floor(epoch(a.ts) / 1800) = floor(epoch(b.ts) / 1800)
    GROUP BY a.event_type
    ORDER BY a.event_type
    """,
    category="join",
)
def q_fluent_window_join(spark, sf_dir):
    """The fluent DataStream windowed-join spelling end-to-end (ref:
    JoinedStreams.java:128 where/equalTo, :170 window, :272 apply):
    two event slices joined per (event_type, 30-minute tumbling window),
    then rolled up.  The join is a plain equi-join on (key, window
    struct) — hash join, no range condition."""
    from pyspark.sql import functions as F

    from my_flink_1_10_2_spark.streaming.stream import Stream

    events = read(spark, sf_dir, "events")
    a = Stream(events.where("event_id <= 300").select("event_type", "ts", "value"))
    b = Stream(
        events.where("event_id > 300 AND event_id <= 600")
        .select(
            F.col("event_type").alias("event_type_b"),
            F.col("ts").alias("ts_b"),
            F.col("value").alias("value_b"),
        )
    )
    joined = (
        a.join(b)
        .where("event_type")
        .equal_to("event_type_b")
        .window("ts", "ts_b", "30 minutes")
        .apply(
            "event_type",
            "CAST(round((value + value_b) * 10000) AS BIGINT) AS pair_e4",
        )
    )
    return (
        joined.df.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum("pair_e4").cast("bigint").alias("pair_sum_e4"),
        )
        .orderBy("event_type")
    )


@register(
    "q_count_window_slide",
    oracle="""
    SELECT user_id, fire_seq, cnt, sum_v_e4 FROM (
      SELECT user_id,
             row_number() OVER w AS fire_seq,
             count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS cnt,
             CAST(sum(CAST(round(value * 10000) AS BIGINT))
                  OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS BIGINT) AS sum_v_e4
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ) WHERE fire_seq % 2 = 0
    """,
    category="window",
)
def q_count_window_slide(spark, sf_dir):
    """Sliding count window — fire every 2 records over the last 5 per
    key (ref: KeyedStream.countWindow(size, slide) KeyedStream.java:653,
    GlobalWindows + CountEvictor + CountTrigger). Integer 1e-4 value
    units keep the 5-row frame sums exact; one key shuffle."""
    from my_flink_1_10_2_spark.operators.windows import count_slide_window

    events = read(spark, sf_dir, "events").withColumn(
        "v_e4", F.round(F.col("value") * 10000).cast("bigint")
    )
    out = count_slide_window(
        events, ["user_id"], ["ts", "event_id"], size=5, slide=2, value_col="v_e4"
    )
    return out.select(
        "user_id", "fire_seq", "cnt", F.col("sum_value").cast("bigint").alias("sum_v_e4")
    )


@register(
    "q_asof_join_tolerance",
    oracle="""
    SELECT p.event_id, p.user_id,
           date_trunc('microseconds', p.ts) AS ts,
           p.value AS purchase_value,
           CASE WHEN c.ts >= p.ts - INTERVAL 30 MINUTE THEN c.value END
             AS last_click_value,
           CASE WHEN c.ts >= p.ts - INTERVAL 30 MINUTE THEN c.event_id END
             AS last_click_id
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
    category="join",
)
def q_asof_join_tolerance(spark, sf_dir):
    """As-of join with a max-staleness tolerance: matches older than 30
    minutes are nulled (the feature-store freshness guard; analog of the
    reference temporal join's idle-state retention).  Same single-key-
    shuffle union+last plan as q_asof_join — the guard is a map-side
    CASE, equivalent to latest-within-window because the latest prior
    version is the maximum over all priors."""
    from my_flink_1_10_2_spark.operators.joins import asof_join

    events = read(spark, sf_dir, "events")
    purchases = events.filter("event_type = 'purchase'").select(
        "event_id", "user_id", "ts", F.col("value").alias("purchase_value")
    )
    clicks = events.filter("event_type = 'click'").select(
        F.col("user_id").alias("c_user_id"),
        F.col("ts").alias("c_ts"),
        F.col("value").alias("last_click_value"),
        F.col("event_id").alias("last_click_id"),
    )
    return asof_join(
        purchases,
        clicks,
        key=("user_id", "c_user_id"),
        time=("ts", "c_ts"),
        right_value_cols=["last_click_value", "last_click_id"],
        tolerance="30 MINUTE",
    )


@register(
    "q_session_stats",
    oracle="""
    WITH seq AS (
      SELECT user_id, ts,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_s
      FROM events),
    sess AS (
      SELECT user_id, ts,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM seq),
    per_session AS (
      SELECT user_id, sid, count(*) AS n FROM sess GROUP BY user_id, sid)
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(max(n) AS BIGINT) AS max_session_events
    FROM per_session GROUP BY user_id
    """,
    category="window",
)
def q_session_stats(spark, sf_dir):
    """Sessionization rollup: per-user session count and busiest session
    (30-minute gap).  The engine uses native `session_window`; the
    oracle rebuilds sessions with the gaps-and-islands idiom (lag +
    cumulative new-session flags) — two structurally different
    formulations that must agree on every merge decision."""
    events = read(spark, sf_dir, "events")
    per_session = events.groupBy(
        F.session_window("ts", "30 minutes").alias("w"), "user_id"
    ).agg(F.count(F.lit(1)).alias("n"))
    return per_session.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
        F.max("n").cast("bigint").alias("max_session_events"),
    )


@register(
    "q_hypertable_rollup",
    oracle="""
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           CASE WHEN GROUPING(date_trunc('hour', ts)) = 0
                THEN CAST(date_trunc('hour', ts) AS TIMESTAMP) END AS hour,
           CAST(GROUPING(date_trunc('hour', ts)) AS BIGINT) AS is_day_total,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(round(value * 10000) AS BIGINT)) AS BIGINT) AS v_sum_e4
    FROM events
    WHERE ts < TIMESTAMP '2024-01-08'
    GROUP BY GROUPING SETS ((date_trunc('day', ts), date_trunc('hour', ts)),
                            (date_trunc('day', ts)))
    """,
    category="window",
)
def q_hypertable_rollup(spark, sf_dir):
    """Hypertable-style continuous aggregate: one scan produces BOTH the
    hourly buckets and their daily rollup via GROUPING SETS (Expand +
    a single two-phase aggregate — the timeseries-db materialization
    pattern with no second pass over the data).  GROUPING() tags the
    rollup rows; integer 1e-4 units keep both granularities exact."""
    base = (
        read(spark, sf_dir, "events")
        .where(F.col("ts") < "2024-01-08")
        .select(
            F.date_trunc("day", "ts").alias("day"),
            F.date_trunc("hour", "ts").alias("hour"),
            F.round(F.col("value") * 10000).cast("bigint").alias("v_e4"),
        )
    )
    g = base.groupingSets([["day", "hour"], ["day"]], "day", "hour")
    return g.agg(
        F.grouping("hour").cast("bigint").alias("is_day_total"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("v_e4").cast("bigint").alias("v_sum_e4"),
    ).select(
        "day",
        F.when(F.col("is_day_total") == 0, F.col("hour")).alias("hour"),
        "is_day_total",
        "n",
        "v_sum_e4",
    )
