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
