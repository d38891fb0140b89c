"""Top-N and deduplication operators.

The reference recognizes ``ROW_NUMBER() OVER (...) <= N`` as an
incremental Top-N (ref: FlinkLogicalRankRule.scala, StreamExecRank.scala:53,
AppendOnlyTopNFunction.java) and ``ROW_NUMBER() = 1`` as keep-first/last
deduplication (ref: StreamExecDeduplicate.scala:50,
DeduplicateKeepFirstRowFunction.java:34).  In batch Spark the same
pattern is planned as a WindowExec with rank-limit pushdown
(``spark.sql.execution.topKSortFallbackThreshold`` / WindowGroupLimit in
Spark 3.5+, which keeps only N rows per key on the map side before the
shuffle — the two-phase behavior the reference hand-implements).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _order_cols(order_by, ascending: bool) -> list[Column]:
    if isinstance(order_by, (str, Column)):
        order_by = [order_by]
    out = []
    for c in order_by:
        col = F.col(c) if isinstance(c, str) else c
        out.append(col if ascending else col.desc())
    return out


def top_n(
    df: DataFrame,
    partition_by: list[str],
    order_by,
    n: int,
    ascending: bool = False,
    rank_col: str | None = "rownum",
) -> DataFrame:
    """Top-N rows per key (ref: StreamExecRank.scala:53).

    Spark ≥3.5 plans this as WindowGroupLimit: each map task keeps at most
    N rows per key before the shuffle, so the exchange volume is
    O(keys × N), not O(rows) — the same optimization as the reference's
    AppendOnlyTopNFunction state bound.
    """
    w = Window.partitionBy(*partition_by).orderBy(*_order_cols(order_by, ascending))
    ranked = df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") <= n)
    if rank_col:
        return ranked.withColumnRenamed("__rn", rank_col)
    return ranked.drop("__rn")


def dedup_keep_first(df: DataFrame, keys: list[str], order_by, ascending: bool = True) -> DataFrame:
    """Keep the first row per key ordered by ``order_by``
    (ref: DeduplicateKeepFirstRowFunction.java:34)."""
    return top_n(df, keys, order_by, 1, ascending=ascending, rank_col=None)


def dedup_keep_last(df: DataFrame, keys: list[str], order_by, ascending: bool = True) -> DataFrame:
    """Keep the last row per key (ref: DeduplicateKeepLastRowFunction.java)."""
    return top_n(df, keys, order_by, 1, ascending=not ascending, rank_col=None)


def global_rank(
    df: DataFrame,
    order_by: list[Column] | list[str],
    rank_col: str = "rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact global ``row_number`` over a total order WITHOUT a
    single-task window (ref: BatchExecSort.scala + BatchExecRank.scala —
    the reference likewise ranks over a sample-based range partition,
    never one task).

    Two passes: ``repartitionByRange`` on the ordering (sampled
    boundaries; correctness does not depend on where they land, only
    balance), per-partition local ``row_number``, then each partition's
    offset = cumulative count of the partitions ordered before it —
    an O(P)-row collect folded on the driver and re-attached as a dense
    pid-indexed array literal (O(1) lookup per row).  ``order_by`` must
    be a total order (add a unique tie-break column), otherwise the rank
    of tied rows is boundary-dependent.

    At 100 TB: one range exchange, a P-row driver collect, and a pure
    projection — no single-task window, no offsets join, no broadcast
    exchange.  Builds EAGERLY (the collect runs the range exchange when
    the operator is constructed).
    """
    from pyspark.sql import Window

    order = [F.col(c) if isinstance(c, str) else c for c in order_by]
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    ranged = df.repartitionByRange(num_partitions, *order).withColumn(
        "__pid", F.spark_partition_id()
    )
    w_local = Window.partitionBy("__pid").orderBy(*order)
    # Pin the partition-id-tagged relation: both downstream consumers
    # (the offsets count and the final projection) must read the SAME
    # materialization — spark_partition_id() is nondeterministic, and an
    # independently recomputed range exchange could assign different ids
    # to the two consumers, corrupting ranks.
    local = ranged.withColumn("__lrn", F.row_number().over(w_local)).localCheckpoint(
        eager=False
    )
    # Per-partition counts are O(P) rows: collect them NOW (the job also
    # materializes the checkpoint), fold the exclusive prefix offsets on
    # the driver with exact integer arithmetic, and attach them as a
    # dense pid-indexed ARRAY literal — O(1) per-row lookup, and the
    # returned plan is a pure projection over the checkpoint scan: no
    # offsets join, no broadcast exchange, one fewer Spark job per use.
    counts = local.groupBy("__pid").agg(F.count(F.lit(1)).alias("__n")).collect()
    offs = _dense_offset_arrays(counts, [("__n", "sum")])["__n"]
    if offs is None:  # empty input: no partitions produced rows
        return local.withColumn(rank_col, F.col("__lrn").cast("bigint")).drop(
            "__pid", "__lrn"
        )
    off = F.element_at(F.lit(offs).cast("array<bigint>"), F.col("__pid") + 1)
    return (
        local.withColumn(rank_col, (F.col("__lrn") + off).cast("bigint"))
        .drop("__pid", "__lrn")
    )


def _dense_offset_arrays(
    totals_rows, specs: list[tuple[str, str]]
) -> dict[str, list | None]:
    """EXCLUSIVE prefix aggregates over collected per-partition totals.

    ``totals_rows``: Rows with ``__pid`` plus one total column per spec;
    ``specs``: ``(total_col, fn)`` with fn in {"sum", "max"}.  Returns,
    per total column, a dense array indexed by pid (missing pids — empty
    partitions — get the running value; they contribute no rows, so the
    value is never consulted) or None when there are no rows at all.
    Sum offsets start at 0 (SQL ``coalesce(sum, 0)``); max offsets start
    at NULL (SQL max over an empty frame); NULL totals are skipped, as
    SQL aggregates skip them.  Driver arithmetic is exact: Python ints
    are unbounded, floats/Decimals fold in ascending-pid order.
    """
    if not totals_rows:
        return {col: None for col, _ in specs}
    by_pid = sorted(totals_rows, key=lambda r: r["__pid"])
    size = by_pid[-1]["__pid"] + 1
    out: dict[str, list] = {}
    for col, fn in specs:
        acc = 0 if fn == "sum" else None
        arr: list = []
        it = iter(by_pid)
        nxt = next(it)
        for pid in range(size):
            arr.append(acc)
            if nxt is not None and nxt["__pid"] == pid:
                v = nxt[col]
                if v is not None:
                    if fn == "sum":
                        acc = acc + v
                    else:
                        acc = v if acc is None else max(acc, v)
                nxt = next(it, None)
        out[col] = arr
    return out


def global_running(
    df: DataFrame,
    order_by: list[Column] | list[str],
    specs: list[tuple[str, str, str, bool]],
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact global running aggregates over a total order WITHOUT a
    single-task window (ref: BatchExecOverAggregate.scala — the reference
    plans unbounded-preceding OVER frames on a sort-partitioned exchange
    with per-partition accumulators, never one task).

    specs: list of ``(out_col, value_col, fn, inclusive)`` with fn in
    {"sum", "max"}; ``inclusive=False`` is the
    ``ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING`` frame.  All
    running sums coalesce NULL (empty frame) to 0 — callers relying on
    SQL's NULL-for-first-row must re-introduce it themselves.

    ``order_by`` must be a total order (unique key), otherwise rows-frame
    results are tie-order dependent in ANY engine.

    Shape: one range exchange on the order key, per-partition local
    running aggregates, per-partition totals collected (O(P) rows),
    folded into exclusive prefix offsets on the driver, and re-attached
    as dense pid-indexed array literals.  Scales to any row count; the
    only single-point data structure is the P-row totals relation.
    Builds EAGERLY (the collect runs the range exchange at construction).
    """
    from pyspark.sql import Window

    order = [F.col(c) if isinstance(c, str) else c for c in order_by]
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    ranged = df.repartitionByRange(num_partitions, *order).withColumn(
        "__pid", F.spark_partition_id()
    )
    w_incl = (
        Window.partitionBy("__pid")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_excl = (
        Window.partitionBy("__pid")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = ranged
    for out, col, fn, inclusive in specs:
        w = w_incl if inclusive else w_excl
        agg = F.sum(col) if fn == "sum" else F.max(col)
        run = agg.over(w)
        if fn == "sum":
            run = F.coalesce(run, F.lit(0))
        local = local.withColumn(f"__l_{out}", run)
    # Pin partition ids — same nondeterminism hazard as global_rank.
    local = local.localCheckpoint(eager=False)
    # Same fused shape as global_rank: collect the O(P)-row totals NOW
    # (the job also materializes the checkpoint), fold exclusive prefix
    # offsets on the driver, attach them as dense pid-indexed array
    # literals — the returned plan is a pure projection over the
    # checkpoint scan (no offsets join, no broadcast exchange, one fewer
    # Spark job per use).  SQL type discipline is preserved by casting
    # each array to its total column's aggregate type (sum over ints is
    # already long there, decimals widened).
    totals_df = local.groupBy("__pid").agg(
        *[
            (F.sum(col) if fn == "sum" else F.max(col)).alias(f"__t_{out}")
            for out, col, fn, _ in specs
        ]
    )
    dtypes = {f.name: f.dataType.simpleString() for f in totals_df.schema.fields}
    arrays = _dense_offset_arrays(
        totals_df.collect(), [(f"__t_{out}", fn) for out, _, fn, _ in specs]
    )
    out_df = local
    for out, _, fn, _ in specs:
        arr = arrays[f"__t_{out}"]
        dt = dtypes[f"__t_{out}"]
        if arr is None:  # empty input: no rows consult the offset
            o = F.lit(None).cast(dt)
        else:
            o = F.element_at(
                F.lit(arr).cast(f"array<{dt}>"), F.col("__pid") + 1
            )
        l = F.col(f"__l_{out}")
        if fn == "sum":
            combined = l + F.coalesce(o, F.lit(0))
        else:
            combined = F.when(o.isNull(), l).otherwise(
                F.when(l.isNull(), o).otherwise(F.greatest(l, o))
            )
        out_df = out_df.withColumn(out, combined)
    drop = ["__pid"]
    for out, _, _, _ in specs:
        drop += [f"__l_{out}"]
    return out_df.drop(*drop)


def global_ntile(
    df: DataFrame,
    k: int,
    order_by: list[Column] | list[str],
    out_col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact SQL ``NTILE(k) OVER (ORDER BY ...)`` semantics WITHOUT the
    single-task window that ``F.ntile(k).over(Window.orderBy(...))``
    plans (Exchange SinglePartition — the 100 TB killer; ref:
    BatchExecRank.scala ranks over sample-based range partitions).

    Standard NTILE bucket sizing: with N rows, q = N div k, r = N mod k,
    buckets 1..r get q+1 rows and buckets r+1..k get q rows.  The bucket
    of global rank ``rn`` (1-based) is a closed-form integer expression,
    so the whole operator is ``global_rank`` + one tiny count broadcast —
    deterministic under a total ``order_by``.
    """
    n_df = df.agg(F.count(F.lit(1)).cast("bigint").alias("__N"))
    ranked = global_rank(df, order_by, rank_col="__grnk", num_partitions=num_partitions)
    # q = N DIV k, r = N % k, cut = r*(q+1): pure int64 arithmetic —
    # exact at any corpus size (no double division anywhere).
    bucket = F.expr(
        f"CASE WHEN __grnk <= (__N % {k}) * ((__N DIV {k}) + 1) "
        f"THEN (__grnk - 1) DIV ((__N DIV {k}) + 1) + 1 "
        f"ELSE (__N % {k}) "
        f"     + (__grnk - (__N % {k}) * ((__N DIV {k}) + 1) - 1) "
        f"       DIV greatest(__N DIV {k}, 1) + 1 END"
    )
    return (
        ranked.join(F.broadcast(n_df))
        .withColumn(out_col, bucket.cast("int"))
        .drop("__grnk", "__N")
    )


def global_ntile_multi(
    df: DataFrame,
    k: int,
    specs: list[tuple[str, list[tuple[str, bool]]]],
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact ``NTILE(k)`` for SEVERAL distinct total orders, assigned in
    ONE downstream pass over ``df`` (ref: BatchExecRank.scala — rank over
    sample-based range partitions, never one task).

    specs: ``[(out_col, [(col_name, ascending), ...])]`` — every order
    list must be a total order over non-null columns (add a unique
    tie-break column).

    Chaining ``global_ntile`` once per metric range-shuffles the FULL
    row set per metric and pins it with a localCheckpoint each time
    (3 metrics -> 6+ exchanges of full rows).  Fused shape instead:

    - bucket boundaries: bucket j ends at global rank
      ``e_j = j*(N div k) + min(j, N mod k)``; the k-1 rows AT those
      ranks are located with :func:`global_rank` over the NARROW
      (order-columns-only) projection and collected — k-1 rows per
      metric, bounded at any corpus size;
    - assignment: ``bucket = 1 + #{boundaries strictly before the row}``
      as a pure literal comparison expression, exact because rank order
      equals tuple order under a total order (duplicate boundary ranks —
      N < k — repeat the tuple, yielding the empty buckets NTILE
      specifies).

    The returned plan holds NO rank machinery: the boundary searches run
    as bounded side jobs at build time, and the main plan is a single
    projection — one exchange wherever the caller aggregates next,
    instead of a range exchange + offsets broadcast per metric.

    ``df`` is localCheckpointed ONCE (it feeds the count, one narrow
    boundary search per metric, and the returned plan); the old chained
    shape checkpointed the ever-wider full row set once per metric.
    """
    # lazy checkpoint: the count below is the materializing job
    df = df.localCheckpoint(eager=False)
    n = df.count()

    def locate(order):
        """Collect one metric's boundary rows (k-1 rows, bounded)."""
        q, r = divmod(n, k)
        cuts = [j * q + min(j, r) for j in range(1, k)]
        cuts = [c for c in cuts if 1 <= c < n]  # rank n ends bucket k: no cut
        cols = [c for c, _ in order]
        order_cols = [
            F.col(c) if asc else F.col(c).desc() for c, asc in order
        ]
        ranked = global_rank(
            df.select(*cols), order_cols, rank_col="__r",
            num_partitions=num_partitions,
        )
        bnd_rows = ranked.where(F.col("__r").isin(list(set(cuts)))).collect()
        return cuts, {row["__r"]: row for row in bnd_rows}

    # the per-metric boundary searches are independent bounded side jobs
    # — run them concurrently (guide §2.6: overlap independent jobs so
    # one search's straggler tail back-fills with the next search's
    # tasks); results are deterministic regardless of completion order
    located: dict[int, tuple] = {}
    live = [(i, order) for i, (_, order) in enumerate(specs) if n > 0]
    if len(live) > 1:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=min(3, len(live))) as pool:
            futs = {i: pool.submit(locate, order) for i, order in live}
        located = {i: f.result() for i, f in futs.items()}
    elif live:
        i, order = live[0]
        located[i] = locate(order)

    out = df
    for i, (out_col, order) in enumerate(specs):
        if n == 0:
            out = out.withColumn(out_col, F.lit(None).cast("int"))
            continue
        cuts, by_rank = located[i]
        bucket = F.lit(1)
        for c in cuts:
            b = by_rank[c]
            # indicator: boundary tuple sorts strictly BEFORE this row
            after = F.lit(False)
            for col, asc in reversed(order):
                gt = F.col(col) > F.lit(b[col]) if asc else F.col(col) < F.lit(b[col])
                after = gt | ((F.col(col) == F.lit(b[col])) & after)
            bucket = bucket + after.cast("int")
        out = out.withColumn(out_col, bucket.cast("int"))
    return out
