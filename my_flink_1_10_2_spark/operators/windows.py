"""Group-window operators: TUMBLE / HOP / SESSION.

The reference's SQL group windows (ref: FlinkSqlOperatorTable.java:777-824,
StreamExecGroupWindowAggregate.scala:33, blink WindowOperator.java:98) and
Table API windows (Tumble.java:47, Slide.java:51, Session.java:47) map to
Spark's native ``window()`` / ``session_window()`` expressions, which
work identically over batch DataFrames and Structured Streaming (with a
watermark attached).

Each helper returns a GroupedData-ready DataFrame with the window struct
attached; ``*_agg`` convenience functions produce `window_start`/
`window_end` columns, matching the reference's ``TUMBLE_START``/
``TUMBLE_END`` auxiliary functions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumble(df: DataFrame, ts_col: str, size: str, keys: list[str] | None = None):
    """Tumbling window grouping (ref: TumblingEventTimeWindows.java)."""
    keys = keys or []
    return df.groupBy(F.window(ts_col, size).alias("w"), *keys)


def hop(df: DataFrame, ts_col: str, size: str, slide: str, keys: list[str] | None = None):
    """Sliding/hopping window grouping (ref: SlidingEventTimeWindows.java)."""
    keys = keys or []
    return df.groupBy(F.window(ts_col, size, slide).alias("w"), *keys)


def session(df: DataFrame, ts_col: str, gap: str, keys: list[str] | None = None):
    """Session window grouping with static gap
    (ref: EventTimeSessionWindows.java; dynamic gap = pass a Column)."""
    keys = keys or []
    return df.groupBy(F.session_window(ts_col, gap).alias("w"), *keys)


def with_window_bounds(df: DataFrame) -> DataFrame:
    """Flatten the ``w`` struct to `window_start`/`window_end` columns
    (ref: TUMBLE_START/TUMBLE_END, FlinkSqlOperatorTable.java:777-824)."""
    return df.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        *[F.col(c) for c in df.columns if c != "w"],
    )


def count_tumble_window(df: DataFrame, keys: list[str], order_by, count: int) -> DataFrame:
    """Count window: tumbling by record count per key
    (ref: KeyedStream.countWindow:643 — GlobalWindows + CountTrigger).

    No Spark native — expressed as ``(row_number() - 1) div count`` per
    key, which is exactly the reference's semantics for bounded data.
    Adds a ``w_id`` window-ordinal column.
    """
    from pyspark.sql import Window

    order_by = [order_by] if isinstance(order_by, str) else list(order_by)
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return df.withColumn("w_id", ((F.row_number().over(w) - F.lit(1)) / count).cast("bigint"))



def count_slide_window(
    df: DataFrame,
    keys: list[str],
    order_by,
    size: int,
    slide: int,
    value_col: str,
) -> DataFrame:
    """Sliding count window: fire every ``slide`` records per key over
    the last ``size`` records (ref: KeyedStream.countWindow(size, slide)
    KeyedStream.java:653 — GlobalWindows + CountEvictor(size) +
    CountTrigger(slide)).

    Batch formulation: per-key ``row_number`` plus a
    ``ROWS BETWEEN size-1 PRECEDING AND CURRENT ROW`` frame, filtered to
    rows where ``rn % slide == 0`` — exactly the evictor+trigger
    semantics on bounded data (early partial windows with < size rows
    fire too, as in the reference). One hash shuffle on the keys.

    Returns (keys..., fire_seq, cnt, sum_value).
    """
    from pyspark.sql import Window

    order_by = [order_by] if isinstance(order_by, str) else list(order_by)
    w = Window.partitionBy(*keys).orderBy(*order_by)
    frame = w.rowsBetween(-(size - 1), 0)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .withColumn("cnt", F.count(F.lit(1)).over(frame))
        .withColumn("sum_value", F.sum(value_col).over(frame))
        .where(F.col("__rn") % slide == 0)
        .select(*keys, F.col("__rn").alias("fire_seq"), "cnt", "sum_value")
    )


# ---------------------------------------------------------------------------
# Fluent Table API window descriptors (ref: flink-table-api-java
# org/apache/flink/table/api/Tumble.java:47, Slide.java:51,
# Session.java:47; consumed by Table.window → GroupWindowedTable →
# WindowGroupedTable, Table.java window()):
#
#   table.window(Tumble.over("10.minutes").on("ts").alias("w"))
#        .group_by("w", "k")
#        .select(...aggs..., "w.start", "w.end")
# ---------------------------------------------------------------------------

import re as _re

_DUR_RE = _re.compile(r"^\s*(\d+)\s*[. ]\s*(milli|second|minute|hour|day)s?\s*$", _re.IGNORECASE)


def parse_duration(expr: str) -> str:
    """Flink interval literal ('10.minutes', '30.seconds') → Spark
    duration string ('10 minutes')."""
    m = _DUR_RE.match(str(expr))
    if not m:
        raise ValueError(f"unparseable window duration: {expr!r}")
    unit = m.group(2).lower()
    unit = {"milli": "milliseconds"}.get(unit, unit + "s")
    return f"{m.group(1)} {unit}"


class GroupWindow:
    """A fully-specified window descriptor (kind + sizes + time attr +
    alias)."""

    def __init__(self, kind: str, size: str, slide_or_gap: str | None = None):
        self.kind = kind
        self.size = size
        self.slide_or_gap = slide_or_gap
        self.ts: str | None = None
        self.name: str | None = None

    def on(self, ts_col) -> "GroupWindow":
        self.ts = str(ts_col).lstrip("$").strip("'\"")
        return self

    def alias(self, name: str) -> "GroupWindow":
        self.name = name
        return self

    as_ = alias  # Flink spells it .as(); Python reserves `as`

    def column(self):
        if self.ts is None or self.name is None:
            raise ValueError("window needs .on(<time attr>) and .alias(<name>)")
        if self.kind == "tumble":
            col = F.window(self.ts, self.size)
        elif self.kind == "slide":
            col = F.window(self.ts, self.size, self.slide_or_gap)
        else:
            col = F.session_window(self.ts, self.size)
        return col.alias(self.name)


class Tumble:
    """ref: Tumble.java:47 — Tumble.over("10.minutes").on($("ts")).as("w")."""

    @staticmethod
    def over(size: str) -> GroupWindow:
        return GroupWindow("tumble", parse_duration(size))


class Slide:
    """ref: Slide.java:51 — Slide.over("10.minutes").every("5.minutes")."""

    @staticmethod
    def over(size: str) -> "_SlideBuilder":
        return _SlideBuilder(parse_duration(size))


class _SlideBuilder:
    def __init__(self, size: str):
        self._size = size

    def every(self, slide: str) -> GroupWindow:
        return GroupWindow("slide", self._size, parse_duration(slide))


class Session:
    """ref: Session.java:47 — Session.withGap("30.minutes")."""

    @staticmethod
    def with_gap(gap: str) -> GroupWindow:
        return GroupWindow("session", parse_duration(gap))


class GroupWindowedTable:
    """ref: org.apache.flink.table.api.GroupWindowedTable (Table.window)."""

    def __init__(self, df: DataFrame, gw: GroupWindow):
        self.df = df
        self.gw = gw

    def group_by(self, *fields: str) -> "WindowGroupedTable":
        from my_flink_1_10_2_spark.table import _split_top_level

        if self.gw.ts is None or self.gw.name is None:
            raise ValueError("window needs .on(<time attr>) and .alias(<name>)")
        fields = [
            p
            for f in fields
            for p in (_split_top_level(f) if isinstance(f, str) else [f])
        ]
        names = [str(f).lstrip("$").strip("'\"") for f in fields]
        if self.gw.name not in names:
            raise ValueError(
                f"group_by must include the window alias {self.gw.name!r}"
            )
        keys = [f for f in names if f != self.gw.name]
        return WindowGroupedTable(self.df, self.gw, keys)


class WindowGroupedTable:
    """ref: org.apache.flink.table.api.WindowGroupedTable — select() may
    mix keys, aggregates and `w.start` / `w.end` (TUMBLE_START/_END
    analogs; `w.rowtime` maps to the window end, the watermark-safe
    choice the SQL rewriter also makes)."""

    def __init__(self, df: DataFrame, gw: GroupWindow, keys: list[str]):
        self.df = df
        self.gw = gw
        self.keys = keys

    def select(self, *exprs):
        from my_flink_1_10_2_spark.table import Table, _split_top_level

        exprs = [
            p
            for e in exprs
            for p in (_split_top_level(e) if isinstance(e, str) else [e])
        ]
        name = self.gw.name
        win_ref = _re.compile(
            rf"^\s*{_re.escape(name)}\.(start|end|rowtime|proctime)\s*"
            r"(?:AS\s+(\w+))?\s*$",
            _re.IGNORECASE,
        )
        agg_list, plan = [], []
        for e in exprs:
            if isinstance(e, str):
                e_str = e.lstrip("$").strip()
                m = win_ref.match(e_str)
                if m:
                    field = {"rowtime": "end", "proctime": "end"}.get(
                        m.group(1).lower(), m.group(1).lower()
                    )
                    plan.append(("win", field, m.group(2) or f"{name}_{field}"))
                    continue
                if e_str in self.keys:
                    plan.append(("key", e_str))
                    continue
                col = F.expr(e_str)
            else:
                col = e
            plan.append(("agg", len(agg_list)))
            agg_list.append(col)
        if not agg_list:
            raise ValueError("window select needs at least one aggregate")
        agg_df = self.df.groupBy(self.gw.column(), *self.keys).agg(*agg_list)
        agg_out = agg_df.columns[1 + len(self.keys):]
        sel = []
        for p in plan:
            if p[0] == "win":
                sel.append(F.col(f"{name}.{p[1]}").alias(p[2]))
            elif p[0] == "key":
                sel.append(F.col(p[1]))
            else:
                sel.append(F.col(agg_out[p[1]]))
        return Table(agg_df.select(*sel))


# ---------------------------------------------------------------------------
# Fluent Table API OVER windows (ref: flink-table-api-java
# org/apache/flink/table/api/Over.java:48 — Over.partitionBy("k")
# .orderBy("rowtime").preceding(UNBOUNDED_RANGE).as("w"), consumed by
# Table.window(OverWindow) + select("sum(v) OVER w")).
# ---------------------------------------------------------------------------

UNBOUNDED_RANGE = "unbounded_range"
UNBOUNDED_ROW = "unbounded_row"
CURRENT_RANGE = "current_range"
CURRENT_ROW = "current_row"


class OverWindow:
    def __init__(self):
        self.partition: list[str] = []
        self.order: str | None = None
        self.preceding_spec: str = UNBOUNDED_RANGE
        self.following_spec: str | None = None
        self.name: str | None = None

    def order_by(self, col) -> "OverWindow":
        self.order = str(col).lstrip("$").strip("'\"")
        return self

    def preceding(self, spec) -> "OverWindow":
        self.preceding_spec = str(spec)
        return self

    def following(self, spec) -> "OverWindow":
        self.following_spec = str(spec)
        return self

    def alias(self, name: str) -> "OverWindow":
        self.name = name
        return self

    as_ = alias

    def spec(self):
        """Build the Spark WindowSpec.  Row-count frames map to
        rowsBetween; RANGE and time-interval frames map to rangeBetween
        (time intervals order by epoch seconds, the same engine-side
        trick StreamExecOverAggregate's range frames use)."""
        from pyspark.sql import Window

        if self.order is None or self.name is None:
            raise ValueError("over window needs .order_by(...) and .alias(...)")

        def bound(spec_str, default, direction):
            if spec_str is None:
                return default, "either"
            ss = spec_str.strip().lower()
            if ss in (UNBOUNDED_RANGE, UNBOUNDED_ROW):
                kind = "range" if ss == UNBOUNDED_RANGE else "rows"
                edge = (
                    Window.unboundedPreceding
                    if direction == "preceding"
                    else Window.unboundedFollowing
                )
                return edge, kind
            if ss in (CURRENT_RANGE, CURRENT_ROW):
                return Window.currentRow, "range" if ss == CURRENT_RANGE else "rows"
            m = _re.fullmatch(r"(\d+)\s*[. ]\s*rows?", ss)
            if m:
                return int(m.group(1)), "rows"
            # time interval → epoch-MILLIS-ordered range frame (millis
            # precision so sub-second frames are exact, never truncated)
            dur = parse_duration(ss)
            n, unit = dur.split(" ", 1)
            millis = {"milliseconds": 1, "seconds": 1000, "minutes": 60_000,
                      "hours": 3_600_000, "days": 86_400_000}[unit]
            return int(n) * millis, "range_time"
        lo, lo_kind = bound(self.preceding_spec, None, "preceding")
        hi, hi_kind = bound(self.following_spec, Window.currentRow, "following")
        kinds = {k for k in (lo_kind, hi_kind) if k != "either"}
        if kinds <= {"rows"}:
            frame_rows = True
        elif kinds <= {"range", "range_time"}:
            frame_rows = False
        else:
            raise ValueError(
                f"mixed ROWS/RANGE frame bounds: {self.preceding_spec!r} / "
                f"{self.following_spec!r}"
            )
        if lo_kind in ("rows", "range_time") and isinstance(lo, int) and lo > 0:
            lo = -lo  # "n preceding" is a negative offset in Spark frames
        w = Window.partitionBy(*self.partition) if self.partition else Window.partitionBy()
        if frame_rows:
            return w.orderBy(self.order).rowsBetween(lo, hi)
        if "range_time" in kinds:
            # interval frame: order by epoch millis (exact for ms frames)
            return w.orderBy(
                (F.col(self.order).cast("timestamp").cast("double") * 1000)
                .cast("long")
            ).rangeBetween(lo, hi)
        return w.orderBy(self.order).rangeBetween(lo, hi)


class Over:
    """ref: Over.java:48."""

    @staticmethod
    def partition_by(*cols) -> OverWindow:
        ow = OverWindow()
        ow.partition = [str(c).lstrip("$").strip("'\"") for c in cols]
        return ow

    @staticmethod
    def order_by(col) -> OverWindow:
        return OverWindow().order_by(col)


class OverWindowedTable:
    """ref: OverWindowedTable (Table.window(OverWindow...)); select
    entries spelled ``<agg expr> OVER <alias> [AS name]`` are applied
    over the window; everything else projects as usual."""

    def __init__(self, df: DataFrame, ow: OverWindow):
        self.df = df
        self.ow = ow

    def select(self, *exprs):
        from my_flink_1_10_2_spark.table import Table

        spec = self.ow.spec()
        over_re = _re.compile(
            rf"^(.*?)\s+OVER\s+{_re.escape(self.ow.name)}\s*(?:AS\s+(\w+))?\s*$",
            _re.IGNORECASE | _re.DOTALL,
        )
        out = []
        for i, e in enumerate(exprs):
            if isinstance(e, str):
                m = over_re.match(e.strip())
                if m:
                    col = F.expr(m.group(1)).over(spec)
                    out.append(col.alias(m.group(2) or f"over_{i}"))
                    continue
                out.append(F.expr(e))
            else:
                out.append(e)
        return Table(self.df.select(*out))
