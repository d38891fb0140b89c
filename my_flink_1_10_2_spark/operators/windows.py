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
