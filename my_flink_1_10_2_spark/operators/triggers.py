"""Custom window triggers and evictors.

Reference surface (flink-streaming-java/src/main/java/org/apache/flink/
streaming/api/windowing/):
  - triggers/CountTrigger.java        — fire every n elements
  - triggers/ContinuousEventTimeTrigger.java — periodic event-time
    early firing inside a window
  - triggers/PurgingTrigger.java      — clear pane contents on fire
  - triggers/EventTimeTrigger.java    — default: fire once at window end
  - evictors/CountEvictor.java        — keep only the last n elements
  - evictors/TimeEvictor.java         — keep elements within `size` of
    the pane's max timestamp
  - evictors/DeltaEvictor.java        — drop elements whose delta vs the
    pane's last element exceeds a threshold

Spark-first compilation (no UDFs, whole-stage codegen throughout):
a trigger picks the FIRING ROWS (every n-th element / the last element
of each interval bucket / the last element of the window) and an evictor
picks the AGGREGATION FRAME at those rows (unbounded preceding /
``ROWS n-1 PRECEDING`` / ``RANGE interval PRECEDING``).  Both are native
window-function concepts, so a triggered+evicted window aggregate is one
shuffle plus window functions — the same shape Catalyst gives a plain
OVER query.

Deviation (documented): ContinuousEventTimeTrigger re-registers timers
and so also fires at interval boundaries where no new data arrived,
repeating the previous result.  The batch emulation emits one firing per
*non-empty* bucket — the de-duplicated changelog of the same sequence.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _epoch_sec(col: Column) -> Column:
    """Epoch seconds from TIMESTAMP or TIMESTAMP_NTZ (UTC session: the
    NTZ→LTZ hop is value-preserving; NTZ can't cast to double directly)."""
    return col.cast("timestamp").cast("double")


# -- trigger / evictor descriptors -------------------------------------------


@dataclass
class EventTimeTrigger:
    """Default trigger: one firing when the watermark passes window end
    (ref: EventTimeTrigger.java:30)."""


@dataclass
class CountTrigger:
    """Fire every ``n`` elements per (key, window)
    (ref: CountTrigger.java:33)."""

    n: int


@dataclass
class ContinuousEventTimeTrigger:
    """Early firing every ``interval`` of event time within the window
    (ref: ContinuousEventTimeTrigger.java:39).  ``interval_seconds`` must
    divide the window size for aligned boundaries."""

    interval_seconds: int


@dataclass
class PurgingTrigger:
    """Wrap a trigger so each firing sees only the elements since the
    previous firing (ref: PurgingTrigger.java:32)."""

    of: object


@dataclass
class CountEvictor:
    """Keep only the last ``n`` elements of the pane
    (ref: CountEvictor.java:36)."""

    n: int


@dataclass
class TimeEvictor:
    """Keep only elements within ``size_seconds`` of the pane's max
    timestamp (ref: TimeEvictor.java:39)."""

    size_seconds: int


@dataclass
class DeltaEvictor:
    """Drop elements whose |value - last value| exceeds ``threshold``
    (ref: DeltaEvictor.java:41 with a EuclideanDistance delta)."""

    value_col: str
    threshold: float


_AGG_FNS = {
    "sum": F.sum,
    "count": F.count,
    "avg": F.avg,
    "min": F.min,
    "max": F.max,
}


def triggered_window(
    df: DataFrame,
    ts_col: str,
    size: str,
    keys: list[str],
    aggs: list[tuple[str, str, str]],
    trigger=None,
    evictor=None,
    tiebreak: str | None = None,
) -> DataFrame:
    """Tumbling event-time window with a custom trigger and/or evictor.

    ``aggs`` is a list of ``(fn, col, alias)`` with fn in sum/count/avg/
    min/max.  Output: window_start, window_end, keys, fire_seq, fire_ts,
    aggregates — one row per firing, in the order the reference's
    WindowOperator would emit them (ref: WindowOperator.java:98 onElement
    → trigger.onElement / onEventTime → emitWindowContents with the
    evictor applied first).
    """
    trigger = trigger or EventTimeTrigger()
    order = [F.col(ts_col)] + ([F.col(tiebreak)] if tiebreak else [])

    win = F.window(ts_col, size).alias("w")
    base = df.select("*", win).select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        *[c for c in df.columns],
    )
    part = ["window_start", "window_end", *keys]

    purging = isinstance(trigger, PurgingTrigger)
    inner = trigger.of if purging else trigger

    if isinstance(inner, ContinuousEventTimeTrigger):
        return _continuous_fire(base, ts_col, part, aggs, inner, purging, evictor)

    elem = Window.partitionBy(*part).orderBy(*order)
    base = base.withColumn("__rn", F.row_number().over(elem))

    # The evictor (or purging) narrows the frame seen at each firing row.
    frame = Window.partitionBy(*part).orderBy(*order)
    filt: Column | None = None
    if purging and isinstance(inner, CountTrigger):
        frame = frame.rowsBetween(-(inner.n - 1), 0)
    elif isinstance(evictor, CountEvictor):
        frame = frame.rowsBetween(-(evictor.n - 1), 0)
    elif isinstance(evictor, TimeEvictor):
        frame = (
            Window.partitionBy(*part)
            .orderBy(_epoch_sec(F.col(ts_col)))
            .rangeBetween(-evictor.size_seconds, 0)
        )
    elif isinstance(evictor, DeltaEvictor):
        # Evaluated against the pane's LAST element: precompute it, then
        # aggregate only surviving elements via conditional aggregation.
        last_val = F.last(evictor.value_col).over(
            Window.partitionBy(*part)
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        )
        filt = (
            F.abs(F.col(evictor.value_col) - last_val)
            <= F.lit(evictor.threshold)
        )
        frame = frame.rowsBetween(Window.unboundedPreceding, 0)
    else:
        frame = frame.rowsBetween(Window.unboundedPreceding, 0)

    cols = []
    for fn, col, alias in aggs:
        expr = F.when(filt, F.col(col)) if filt is not None else F.col(col)
        cols.append(_AGG_FNS[fn](expr).over(frame).alias(alias))
    out = base.select(*part, "__rn", F.col(ts_col).alias("fire_ts"), *cols)

    if isinstance(inner, CountTrigger):
        # ref CountTrigger.java:45 — fire iff count % n == 0; leftover
        # elements never fire (no event-time timer is registered).
        fired = out.filter(F.col("__rn") % inner.n == 0).withColumn(
            "fire_seq", (F.col("__rn") / inner.n).cast("bigint")
        )
    else:  # EventTimeTrigger: single firing at window close
        last_rn = F.max("__rn").over(Window.partitionBy(*part))
        fired = (
            out.withColumn("__last", last_rn)
            .filter(F.col("__rn") == F.col("__last"))
            .withColumn("fire_seq", F.lit(1).cast("bigint"))
            .drop("__last")
        )
    return fired.drop("__rn")


def _continuous_fire(
    base: DataFrame,
    ts_col: str,
    part: list[str],
    aggs: list[tuple[str, str, str]],
    trig: ContinuousEventTimeTrigger,
    purging: bool,
    evictor,
) -> DataFrame:
    """ContinuousEventTimeTrigger: partial-aggregate per interval bucket,
    then (unless purging) accumulate buckets per window — two-phase, so
    the shuffle carries one row per (window, key, bucket), not per
    element."""
    if evictor is not None:
        raise NotImplementedError(
            "evictors compose with count/event-time triggers; the "
            "continuous trigger path is partial-aggregated per bucket"
        )
    ivl = trig.interval_seconds
    bucket_end = F.timestamp_seconds(
        (F.floor(_epoch_sec(F.col(ts_col)) / ivl) + 1) * ivl
    ).cast("timestamp_ntz")
    partials = base.groupBy(*part, bucket_end.alias("fire_ts")).agg(
        *[
            _AGG_FNS[fn](col).alias(f"__p_{alias}")
            for fn, col, alias in aggs
        ],
        F.count(F.lit(1)).alias("__rows_in_bucket"),
        *[
            F.sum(col).alias(f"__s_{alias}")
            for fn, col, alias in aggs
            if fn == "avg"
        ],
    )
    if purging:
        out = partials.select(
            *part,
            "fire_ts",
            *[F.col(f"__p_{alias}").alias(alias) for _, _, alias in aggs],
        )
    else:
        cum = Window.partitionBy(*part).orderBy("fire_ts")
        cols = []
        for fn, col, alias in aggs:
            if fn == "sum":
                cols.append(F.sum(f"__p_{alias}").over(cum).alias(alias))
            elif fn == "count":
                cols.append(F.sum(f"__p_{alias}").over(cum).alias(alias))
            elif fn == "min":
                cols.append(F.min(f"__p_{alias}").over(cum).alias(alias))
            elif fn == "max":
                cols.append(F.max(f"__p_{alias}").over(cum).alias(alias))
            elif fn == "avg":
                cols.append(
                    (
                        F.sum(f"__s_{alias}").over(cum)
                        / F.sum("__rows_in_bucket").over(cum)
                    ).alias(alias)
                )
        out = partials.select(*part, "fire_ts", *cols)
    seq = Window.partitionBy(*part).orderBy("fire_ts")
    return out.withColumn("fire_seq", F.row_number().over(seq).cast("bigint"))
