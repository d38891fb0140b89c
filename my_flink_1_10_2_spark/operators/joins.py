"""Time-oriented joins the reference supports but Spark lacks as built-ins.

- interval join  (ref: KeyedStream.intervalJoin:415, TimeBoundedStreamJoin.java:52)
- temporal / as-of join (ref: StreamExecTemporalJoin.scala:51,
  TemporalRowTimeJoinOperator.java:71)

Both are expressed declaratively so they scale: the interval join is an
equi-join on key plus a range predicate (Catalyst plans a shuffled hash /
sort-merge join on the key with the range as a post-join filter — the
range never forces a nested-loop because the key equality carries the
partitioning); the as-of join uses the union + last-known-version window
trick, one shuffle by (key, time), no per-row lookups.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: tuple[str, str],
    time: tuple[str, str],
    lower: str,
    upper: str,
    how: str = "inner",
) -> DataFrame:
    """a JOIN b ON a.key = b.key AND b.ts BETWEEN a.ts + lower AND a.ts + upper.

    ``lower``/``upper`` are SQL interval literal bodies, e.g. ``'0 seconds'``,
    ``'1 hour'``.  Columns from both sides are kept (right side gets no
    prefix — disambiguate by selecting before the call if names collide).
    """
    lk, rk = key
    lt, rt = time
    # Aliased frames keep the condition robust to column-name clashes.
    a = left.alias("a")
    b = right.alias("b")
    cond = (
        (F.col(f"a.{lk}") == F.col(f"b.{rk}"))
        & (F.col(f"b.{rt}") >= F.expr(f"a.{lt} + INTERVAL '{lower}'"))
        & (F.col(f"b.{rt}") <= F.expr(f"a.{lt} + INTERVAL '{upper}'"))
    )
    return a.join(b, cond, how)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: tuple[str, str],
    time: tuple[str, str],
    right_value_cols: list[str] | None = None,
    tolerance: str | None = None,
) -> DataFrame:
    """As-of join: for each left row, attach the latest right row whose
    time <= left.time, per key (ref: TemporalRowTimeJoinOperator.java:71 —
    `FOR SYSTEM_TIME AS OF` probe semantics).

    ``tolerance`` (SQL interval body, e.g. ``'30 minutes'``) bounds the
    staleness of the matched version: a match older than
    ``left.time - tolerance`` is nulled out — the feature-store
    max-staleness guard (equivalent to latest-within-window, since the
    latest prior version IS the maximum over all priors).  This is the
    analog of the reference's temporal-join state TTL
    (StreamingJoinOperator idle-state retention), which likewise stops
    serving versions older than the configured bound.

    Implementation (scales to 100 TB): tag and union both inputs, shuffle
    ONCE by key, sort by (time, side) within the window, and carry the
    last-seen right-side values forward with ``last(..., ignorenulls)``.
    This is one exchange + one sort — no per-row point lookups, no
    broadcast requirement, and skew only where the key itself is skewed.
    Left rows with no prior right row keep NULLs (left-outer semantics).
    """
    from pyspark.sql.types import StructType

    lk, rk = key
    lt, rt = time
    if right_value_cols is None:
        right_value_cols = [c for c in right.columns if c not in (rk, rt)]

    # All right value columns travel as ONE struct, and last(ignorenulls)
    # fills that struct: every probe row sees all values from the same
    # (latest) version row — a version whose value column is legitimately
    # NULL stays NULL instead of leaking the older version's value, and
    # multiple value columns can never mix versions (ref:
    # TemporalRowTimeJoinOperator.java returns whole rows, not columns).
    version_struct_t = StructType([right.schema[c] for c in right_value_cols])

    # Tagged union: side 0 = right (version rows), side 1 = left (probe rows).
    # Right rows sort before left rows at equal timestamps, so a version
    # with ts == probe ts IS visible (inclusive as-of, matching the
    # reference's rowtime join).
    null_left = [F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns]
    struct_cols = [F.col(c).alias(c) for c in right_value_cols]
    if tolerance is not None:
        # carry the version's own timestamp for the staleness guard
        from pyspark.sql.types import StructField

        struct_cols.append(F.col(rt).alias("__vt"))
        version_struct_t = StructType(
            [right.schema[c] for c in right_value_cols]
            + [StructField("__vt", right.schema[rt].dataType, True)]
        )
    r = right.select(
        F.col(rk).alias("__k"),
        F.col(rt).alias("__t"),
        F.lit(0).alias("__side"),
        *null_left,
        F.struct(*struct_cols).alias("__r"),
    )

    l = left.select(
        F.col(lk).alias("__k"),
        F.col(lt).alias("__t"),
        F.lit(1).alias("__side"),
        *[F.col(c) for c in left.columns],
        F.lit(None).cast(version_struct_t).alias("__r"),
    )

    unioned = r.unionByName(l)
    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__t"), F.col("__side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        "*", F.last(F.col("__r"), ignorenulls=True).over(w).alias("__v")
    )
    probe = filled.filter(F.col("__side") == 1)
    if tolerance is not None:
        fresh = F.col("__v.__vt") >= F.col("__t") - F.expr(f"INTERVAL {tolerance}")
        return probe.select(
            *[F.col(c) for c in left.columns],
            *[
                F.when(fresh, F.col(f"__v.{c}")).alias(c)
                for c in right_value_cols
            ],
        )
    return probe.select(
        *[F.col(c) for c in left.columns],
        *[F.col(f"__v.{c}").alias(c) for c in right_value_cols],
    )
