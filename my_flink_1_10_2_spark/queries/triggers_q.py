"""Custom trigger / evictor window queries over `events`.

Reference: CountTrigger.java:33, ContinuousEventTimeTrigger.java:39,
PurgingTrigger.java:32, CountEvictor.java:36, TimeEvictor.java:39 —
the per-window firing/eviction knobs SURVEY §7.3-5 flags as coarser in
Spark; compiled here to native window functions (see operators/triggers.py).

Running double sums are rounded to 6 dp on BOTH sides: the firing order
is pinned by (ts, event_id) but engines may associate partial sums
differently in the last ULP.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from my_flink_1_10_2_spark.operators.triggers import (
    ContinuousEventTimeTrigger,
    CountEvictor,
    CountTrigger,
    PurgingTrigger,
    TimeEvictor,
    triggered_window,
)
from my_flink_1_10_2_spark.queries import read, register


@register(
    "q_count_trigger_window",
    oracle="""
    WITH numbered AS (
      SELECT date_trunc('hour', ts) AS window_start, event_type, ts, value,
             row_number() OVER w AS rn,
             sum(value)   OVER w AS run_sum
      FROM events
      WINDOW w AS (PARTITION BY date_trunc('hour', ts), event_type
                   ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)
    )
    SELECT window_start, event_type, ts AS fire_ts,
           CAST(rn / 5 AS BIGINT) AS fire_seq,
           rn AS cnt, round(run_sum, 6) AS sum_value
    FROM numbered WHERE rn % 5 = 0
    """,
    category="trigger",
)
def q_count_trigger_window(spark, sf_dir):
    """CountTrigger(5) on a 1h tumble: fire every 5th element with the
    accumulated pane aggregate (ref: CountTrigger.java:45)."""
    events = read(spark, sf_dir, "events")
    out = triggered_window(
        events,
        "ts",
        "1 hour",
        ["event_type"],
        aggs=[("count", "value", "cnt"), ("sum", "value", "sum_value")],
        trigger=CountTrigger(5),
        tiebreak="event_id",
    )
    return out.select(
        "window_start",
        "event_type",
        "fire_ts",
        "fire_seq",
        "cnt",
        F.round("sum_value", 6).alias("sum_value"),
    )


@register(
    "q_purging_count_trigger_window",
    oracle="""
    WITH numbered AS (
      SELECT date_trunc('hour', ts) AS window_start, event_type, ts, value,
             row_number() OVER w AS rn,
             sum(value) OVER (PARTITION BY date_trunc('hour', ts), event_type
                              ORDER BY ts, event_id
                              ROWS 4 PRECEDING) AS pane_sum
      FROM events
      WINDOW w AS (PARTITION BY date_trunc('hour', ts), event_type
                   ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)
    )
    SELECT window_start, event_type, ts AS fire_ts,
           CAST(rn / 5 AS BIGINT) AS fire_seq,
           round(pane_sum, 6) AS pane_sum
    FROM numbered WHERE rn % 5 = 0
    """,
    category="trigger",
)
def q_purging_count_trigger_window(spark, sf_dir):
    """PurgingTrigger(CountTrigger(5)): each firing aggregates only the 5
    elements since the previous purge (ref: PurgingTrigger.java:32)."""
    events = read(spark, sf_dir, "events")
    out = triggered_window(
        events,
        "ts",
        "1 hour",
        ["event_type"],
        aggs=[("sum", "value", "pane_sum")],
        trigger=PurgingTrigger(CountTrigger(5)),
        tiebreak="event_id",
    )
    return out.select(
        "window_start",
        "event_type",
        "fire_ts",
        "fire_seq",
        F.round("pane_sum", 6).alias("pane_sum"),
    )


@register(
    "q_early_fire_window",
    oracle="""
    WITH partials AS (
      SELECT date_trunc('hour', ts) AS window_start, event_type,
             make_timestamp((CAST(floor(epoch(ts) / 900) AS BIGINT) + 1)
                            * 900 * 1000000) AS fire_ts,
             count(*) AS c, sum(value) AS sv
      FROM events GROUP BY 1, 2, 3
    )
    SELECT window_start, event_type, fire_ts,
           CAST(row_number() OVER w AS BIGINT) AS fire_seq,
           CAST(sum(c) OVER w AS BIGINT) AS cnt,
           round(sum(sv) OVER w, 6) AS sum_value
    FROM partials
    WINDOW w AS (PARTITION BY window_start, event_type
                 ORDER BY fire_ts ROWS UNBOUNDED PRECEDING)
    """,
    category="trigger",
)
def q_early_fire_window(spark, sf_dir):
    """ContinuousEventTimeTrigger(15 min) on a 1h tumble: accumulated
    early firings at each quarter-hour boundary
    (ref: ContinuousEventTimeTrigger.java:39)."""
    events = read(spark, sf_dir, "events")
    out = triggered_window(
        events,
        "ts",
        "1 hour",
        ["event_type"],
        aggs=[("count", "value", "cnt"), ("sum", "value", "sum_value")],
        trigger=ContinuousEventTimeTrigger(900),
    )
    return out.select(
        "window_start",
        "event_type",
        "fire_ts",
        "fire_seq",
        "cnt",
        F.round("sum_value", 6).alias("sum_value"),
    )


@register(
    "q_count_evictor_window",
    oracle="""
    WITH numbered AS (
      SELECT date_trunc('hour', ts) AS window_start, event_type, ts, value,
             row_number() OVER (PARTITION BY date_trunc('hour', ts), event_type
                                ORDER BY ts DESC, event_id DESC) AS rd
      FROM events
    )
    SELECT window_start, event_type,
           count(*) AS cnt, round(sum(value), 6) AS sum_value,
           max(ts) AS fire_ts
    FROM numbered WHERE rd <= 5 GROUP BY 1, 2
    """,
    category="trigger",
)
def q_count_evictor_window(spark, sf_dir):
    """CountEvictor(5): the window-close firing sees only the last 5
    elements of each pane (ref: CountEvictor.java:36)."""
    events = read(spark, sf_dir, "events")
    out = triggered_window(
        events,
        "ts",
        "1 hour",
        ["event_type"],
        aggs=[("count", "value", "cnt"), ("sum", "value", "sum_value")],
        evictor=CountEvictor(5),
        tiebreak="event_id",
    )
    return out.select(
        "window_start",
        "event_type",
        "cnt",
        F.round("sum_value", 6).alias("sum_value"),
        "fire_ts",
    )


@register(
    "q_time_evictor_window",
    oracle="""
    WITH mx AS (
      SELECT date_trunc('hour', ts) AS window_start, event_type,
             max(ts) AS max_ts
      FROM events GROUP BY 1, 2
    )
    SELECT m.window_start, m.event_type,
           count(*) AS cnt, round(sum(e.value), 6) AS sum_value
    FROM events e
    JOIN mx m ON date_trunc('hour', e.ts) = m.window_start
             AND e.event_type = m.event_type
    WHERE e.ts >= m.max_ts - INTERVAL 10 MINUTE
    GROUP BY 1, 2
    """,
    category="trigger",
)
def q_time_evictor_window(spark, sf_dir):
    """TimeEvictor(10 min): keep only elements within 10 minutes of the
    pane's max timestamp (ref: TimeEvictor.java:39; boundary kept
    inclusive on both sides here)."""
    events = read(spark, sf_dir, "events")
    out = triggered_window(
        events,
        "ts",
        "1 hour",
        ["event_type"],
        aggs=[("count", "value", "cnt"), ("sum", "value", "sum_value")],
        evictor=TimeEvictor(600),
        tiebreak="event_id",
    )
    return out.select(
        "window_start",
        "event_type",
        "cnt",
        F.round("sum_value", 6).alias("sum_value"),
    )


_EF_SIZE = 21_600_000_000  # 6 h in micros
_EF_IVL = 7_200_000_000    # 2 h boundaries
_EF_DELAY = 7_200_000_000  # 2 h watermark lag
_EF_INF = 9_000_000_000_000_000_000

_EF_SRC = """
  SELECT user_id % 4 AS k,
         epoch_us(ts) AS te,
         CAST(round(value * 10000) AS BIGINT) AS v,
         LEAST(4, (extract(day FROM ts) - 1) // 7
                  + CASE WHEN event_id % 7 = 0 THEN 1 ELSE 0 END) AS batch
  FROM events WHERE event_id < 2000
"""


@register(
    "q_early_fire_sequence",
    oracle=f"""
    WITH src AS MATERIALIZED ({_EF_SRC}),
    wm AS MATERIALIZED (
      SELECT b.batch,
             CASE WHEN b.batch = (SELECT max(batch) FROM src)
                  THEN {_EF_INF}
                  ELSE max(s.te) - {_EF_DELAY} END AS wm
      FROM (SELECT DISTINCT batch FROM src) b JOIN src s ON s.batch <= b.batch
      GROUP BY b.batch
    ),
    fw AS MATERIALIZED (
      SELECT k, ws, b0, min(te) AS fts FROM (
        SELECT k, te, batch,
               te - te % {_EF_SIZE} AS ws,
               min(batch) OVER (PARTITION BY k, te - te % {_EF_SIZE}) AS b0
        FROM src) WHERE batch = b0
      GROUP BY k, ws, b0
    ),
    bounds AS (
      SELECT k, ws, b0,
             unnest(generate_series(fts - fts % {_EF_IVL} + {_EF_IVL},
                                    ws + {_EF_SIZE}, {_EF_IVL})) AS t
      FROM fw
    ),
    fires AS (
      SELECT k, ws, t, min(w.batch) AS fire_batch
      FROM bounds b JOIN wm w ON w.wm >= b.t AND w.batch >= b.b0
      GROUP BY k, ws, t
    ),
    panes AS (
      SELECT f.k, f.ws, f.t, f.fire_batch,
             count(*) AS cnt, sum(s.v) AS v_sum_e4
      FROM fires f JOIN src s
        ON s.k = f.k AND s.te - s.te % {_EF_SIZE} = f.ws
           AND s.batch <= f.fire_batch
      GROUP BY f.k, f.ws, f.t, f.fire_batch
    )
    SELECT k, make_timestamp(ws) AS window_start, make_timestamp(t) AS fire_ts,
           fire_batch,
           row_number() OVER (PARTITION BY k, ws ORDER BY t) AS fire_seq,
           cnt, CAST(v_sum_e4 AS BIGINT) AS v_sum_e4
    FROM panes
    """,
    category="triggers",
)
def q_early_fire_sequence(spark, sf_dir):
    """TRUE streaming early-fire EMISSION LOG (ref:
    ContinuousEventTimeTrigger.java:36 + WindowOperator.java:98): events
    replay through Structured Streaming in 5 scripted micro-batches
    (weekly arrival waves, ~14% of events arriving one wave late); the
    per-batch watermark advance fires every interval boundary it passes,
    and the graded result is the full (window, boundary) pane SEQUENCE —
    early fires, watermark-jump cascades, and end-of-input finals — not
    just the final pane states.  Integer micro-units end to end."""
    import shutil
    import tempfile

    from my_flink_1_10_2_spark.streaming.early_fire import (
        continuous_early_fire_log,
    )

    src = (
        read(spark, sf_dir, "events")
        .where("event_id < 2000")
        .select(
            (F.col("user_id") % 4).alias("k"),
            F.unix_micros(F.col("ts").cast("timestamp")).alias("te"),
            F.round(F.col("value") * 10000).cast("bigint").alias("v"),
            F.least(
                F.lit(4),
                F.expr("CAST((day(ts) - 1) DIV 7 AS BIGINT)")
                + F.when(F.col("event_id") % 7 == 0, 1).otherwise(0),
            ).alias("batch"),
        )
    )
    work = tempfile.mkdtemp(prefix="fl_earlyfire_q_")
    try:
        log = continuous_early_fire_log(
            spark,
            src,
            work,
            ts_col="te",
            batch_col="batch",
            keys=["k"],
            value_col="v",
            size_us=_EF_SIZE,
            interval_us=_EF_IVL,
            delay_us=_EF_DELAY,
        )
        out = log.select(
            "k",
            F.timestamp_micros(F.col("window_start"))
            .cast("timestamp_ntz")
            .alias("window_start"),
            F.timestamp_micros(F.col("fire_ts"))
            .cast("timestamp_ntz")
            .alias("fire_ts"),
            "fire_batch",
            "fire_seq",
            "cnt",
            F.col("v_sum").alias("v_sum_e4"),
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)


_EFH_SIZE = 21_600_000_000  # 6 h sliding windows
_EFH_SLIDE = 10_800_000_000  # every 3 h
_EFH_IVL = 10_800_000_000   # boundaries at 3 h
_EFH_SRC = """
  SELECT user_id % 2 AS k,
         epoch_us(ts) AS te,
         CAST(round(value * 10000) AS BIGINT) AS v,
         LEAST(4, (extract(day FROM ts) - 1) // 7
                  + CASE WHEN event_id % 7 = 0 THEN 1 ELSE 0 END) AS batch
  FROM events WHERE event_id < 1200
"""


@register(
    "q_early_fire_sequence_hop",
    oracle=f"""
    WITH src AS MATERIALIZED ({_EFH_SRC}),
    wm AS MATERIALIZED (
      SELECT b.batch,
             CASE WHEN b.batch = (SELECT max(batch) FROM src)
                  THEN {_EF_INF}
                  ELSE max(s.te) - {_EF_DELAY} END AS wm
      FROM (SELECT DISTINCT batch FROM src) b JOIN src s ON s.batch <= b.batch
      GROUP BY b.batch
    ),
    assigned AS MATERIALIZED (
      SELECT k, te, v, batch,
             unnest(generate_series(
               (te - te % {_EFH_SLIDE}) - {_EFH_SIZE} + {_EFH_SLIDE},
               te - te % {_EFH_SLIDE}, {_EFH_SLIDE})) AS ws
      FROM src
    ),
    fw AS MATERIALIZED (
      SELECT k, ws, b0, min(te) AS fts FROM (
        SELECT k, te, batch, ws,
               min(batch) OVER (PARTITION BY k, ws) AS b0
        FROM assigned) WHERE batch = b0
      GROUP BY k, ws, b0
    ),
    bounds AS (
      SELECT k, ws, b0,
             unnest(generate_series(fts - fts % {_EFH_IVL} + {_EFH_IVL},
                                    ws + {_EFH_SIZE}, {_EFH_IVL})) AS t
      FROM fw
    ),
    fires AS (
      SELECT k, ws, t, min(w.batch) AS fire_batch
      FROM bounds b JOIN wm w ON w.wm >= b.t AND w.batch >= b.b0
      GROUP BY k, ws, t
    ),
    panes AS (
      SELECT f.k, f.ws, f.t, f.fire_batch,
             count(*) AS cnt, sum(s.v) AS v_sum_e4
      FROM fires f JOIN assigned s
        ON s.k = f.k AND s.ws = f.ws AND s.batch <= f.fire_batch
      GROUP BY f.k, f.ws, f.t, f.fire_batch
    )
    SELECT k, make_timestamp(ws) AS window_start, make_timestamp(t) AS fire_ts,
           fire_batch,
           row_number() OVER (PARTITION BY k, ws ORDER BY t) AS fire_seq,
           cnt, CAST(v_sum_e4 AS BIGINT) AS v_sum_e4
    FROM panes
    """,
    category="triggers",
)
def q_early_fire_sequence_hop(spark, sf_dir):
    """Early-fire emission log over SLIDING windows (ref:
    SlidingEventTimeWindows.java × ContinuousEventTimeTrigger.java):
    every element feeds size/slide overlapping windows, and each
    window's boundary cascade fires independently as the scripted
    watermark advances — overlapping panes, early fires, and
    end-of-input drain all graded as one sequence."""
    import shutil
    import tempfile

    from my_flink_1_10_2_spark.streaming.early_fire import (
        continuous_early_fire_log,
    )

    src = (
        read(spark, sf_dir, "events")
        .where("event_id < 1200")
        .select(
            (F.col("user_id") % 2).alias("k"),
            F.unix_micros(F.col("ts").cast("timestamp")).alias("te"),
            F.round(F.col("value") * 10000).cast("bigint").alias("v"),
            F.least(
                F.lit(4),
                F.expr("CAST((day(ts) - 1) DIV 7 AS BIGINT)")
                + F.when(F.col("event_id") % 7 == 0, 1).otherwise(0),
            ).alias("batch"),
        )
    )
    work = tempfile.mkdtemp(prefix="fl_earlyfire_hop_")
    try:
        log = continuous_early_fire_log(
            spark,
            src,
            work,
            ts_col="te",
            batch_col="batch",
            keys=["k"],
            value_col="v",
            size_us=_EFH_SIZE,
            interval_us=_EFH_IVL,
            delay_us=_EF_DELAY,
            slide_us=_EFH_SLIDE,
        )
        out = log.select(
            "k",
            F.timestamp_micros(F.col("window_start"))
            .cast("timestamp_ntz")
            .alias("window_start"),
            F.timestamp_micros(F.col("fire_ts"))
            .cast("timestamp_ntz")
            .alias("fire_ts"),
            "fire_batch",
            "fire_seq",
            "cnt",
            F.col("v_sum").alias("v_sum_e4"),
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)


_AL_SIZE = 86_400_000_000      # 1-day tumbling windows
_AL_DELAY = 21_600_000_000     # 6 h watermark delay
_AL_LATE = 864_000_000_000     # 10 days allowed lateness
_AL_WEEK = 604_800_000_000
_AL_INF = 9_000_000_000_000_000_000


@register(
    "q_allowed_lateness_updates",
    oracle=f"""
    WITH src0 AS (
      SELECT user_id % 4 AS k, epoch_us(ts) AS te,
             CAST(round(value * 10000) AS BIGINT) AS v, event_id,
             epoch_us(ts) // {_AL_WEEK} AS wk
      FROM events WHERE event_id < 2000
    ),
    weeks AS (
      SELECT wk, row_number() OVER (ORDER BY wk) - 1 AS idx
      FROM (SELECT DISTINCT wk FROM src0)
    ),
    src AS (
      SELECT s.k, s.te, s.v,
             least((SELECT max(idx) FROM weeks),
                   w.idx + CASE WHEN s.event_id % 7 = 0 THEN 1 ELSE 0 END)
               AS b
      FROM src0 s JOIN weeks w USING (wk)
    ),
    wm AS MATERIALIZED (
      SELECT b.b,
             CASE WHEN b.b = (SELECT max(b) FROM src) THEN {_AL_INF}
                  ELSE max(s.te) - {_AL_DELAY} END AS wm
      FROM (SELECT DISTINCT b FROM src) b JOIN src s ON s.b <= b.b
      GROUP BY b.b
    ),
    wmp AS (SELECT b, wm, lag(wm) OVER (ORDER BY b) AS pwm FROM wm),
    accepted AS MATERIALIZED (
      SELECT s.k, s.te, s.v, s.b, s.te - s.te % {_AL_SIZE} AS ws
      FROM src s JOIN wmp w ON w.b = s.b
      WHERE coalesce(w.pwm, {-2**62}) < s.te - s.te % {_AL_SIZE}
                                        + {_AL_SIZE} + {_AL_LATE}
    ),
    wins AS (
      SELECT k, ws, min(b) AS fa FROM accepted GROUP BY 1, 2
    ),
    on_time AS (
      SELECT w.k, w.ws,
             greatest((SELECT min(b) FROM wmp x
                       WHERE x.wm >= w.ws + {_AL_SIZE}), w.fa) AS fb,
             'on_time' AS kind
      FROM wins w
    ),
    upd AS (
      SELECT DISTINCT a.k, a.ws, a.b AS fb, 'update' AS kind
      FROM accepted a JOIN on_time o ON o.k = a.k AND o.ws = a.ws
      WHERE a.b > o.fb
    ),
    fires AS (SELECT * FROM on_time UNION ALL SELECT * FROM upd),
    panes AS (
      SELECT f.k, f.ws, f.fb, f.kind,
             count(*) AS cnt, sum(a.v) AS v_sum
      FROM fires f JOIN accepted a
        ON a.k = f.k AND a.ws = f.ws AND a.b <= f.fb
      GROUP BY 1, 2, 3, 4
    )
    SELECT k, make_timestamp(ws) AS window_start, CAST(fb AS BIGINT)
             AS fire_batch, kind,
           row_number() OVER (PARTITION BY k, ws ORDER BY fb) AS fire_seq,
           CAST(cnt AS BIGINT) AS cnt, CAST(v_sum AS BIGINT) AS v_sum_e4
    FROM panes
    """,
    category="triggers",
)
def q_allowed_lateness_updates(spark, sf_dir):
    """allowedLateness UPDATE re-emission log graded e2e (ref:
    WindowOperator.java:98 isElementLate + allowedLateness, the
    accumulating re-fire every SLA dashboard depends on): events replay
    in epoch-week waves with ~14% of rows arriving one wave LATE; 1-day
    windows fire on time when the watermark passes, accepted late rows
    RE-FIRE the grown pane ('update' rows), and a window whose first row
    itself arrives behind the watermark fires immediately at arrival —
    the reference's immediately-firing late timer.  The 10-day lateness
    bound is enforced with the pre-batch watermark (the element-time
    drop test), and the whole log replays byte-identically under
    foreachBatch retries (same idempotent machinery as the early-fire
    harness)."""
    import shutil
    import tempfile

    from my_flink_1_10_2_spark.streaming.early_fire import (
        allowed_lateness_update_log,
    )

    e = (
        read(spark, sf_dir, "events")
        .where("event_id < 2000")
        .select(
            (F.col("user_id") % 4).alias("k"),
            F.unix_micros(F.col("ts").cast("timestamp")).alias("te"),
            F.round(F.col("value") * 10000).cast("bigint").alias("v"),
            "event_id",
            F.expr(f"unix_micros(CAST(ts AS TIMESTAMP)) DIV {_AL_WEEK}").alias(
                "__wk"
            ),
        )
    )
    wks = sorted(r[0] for r in e.select("__wk").distinct().collect())
    idx = spark.createDataFrame(
        [(w, i) for i, w in enumerate(wks)], "__wk long, __idx long"
    )
    src = (
        e.join(F.broadcast(idx), "__wk")
        .select(
            "k",
            "te",
            "v",
            F.least(
                F.lit(len(wks) - 1),
                F.col("__idx")
                + F.when(F.col("event_id") % 7 == 0, 1).otherwise(0),
            ).alias("batch"),
        )
    )
    work = tempfile.mkdtemp(prefix="fl_lateness_q_")
    try:
        log = allowed_lateness_update_log(
            spark,
            src,
            work,
            ts_col="te",
            batch_col="batch",
            keys=["k"],
            value_col="v",
            size_us=_AL_SIZE,
            delay_us=_AL_DELAY,
            lateness_us=_AL_LATE,
        )
        out = log.select(
            "k",
            F.timestamp_micros(F.col("window_start"))
            .cast("timestamp_ntz")
            .alias("window_start"),
            "fire_batch",
            "kind",
            "fire_seq",
            "cnt",
            F.col("v_sum").alias("v_sum_e4"),
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)
