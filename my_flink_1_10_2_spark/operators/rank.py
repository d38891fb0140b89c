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
    offset = cumulative count of the partitions ordered before it — a
    window over <= num_partitions rows, broadcast back by partition id.
    ``order_by`` must be a total order (add a unique tie-break column),
    otherwise the rank of tied rows is boundary-dependent.

    At 100 TB: one range exchange + one tiny offsets broadcast —
    the plan gate asserts no `Exchange SinglePartition` feeds the
    row-data window.
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
    # Pin the partition-id-tagged relation: both downstream branches
    # (the offsets aggregate and the final join) must read the SAME
    # materialization — spark_partition_id() is nondeterministic, and an
    # independently recomputed range exchange could assign different ids
    # to the two branches, corrupting ranks.
    local = ranged.withColumn("__lrn", F.row_number().over(w_local)).localCheckpoint(
        eager=False
    )
    counts = local.groupBy("__pid").agg(F.count(F.lit(1)).alias("__n"))
    offsets = counts.withColumn(
        "__off", F.sum("__n").over(Window.orderBy("__pid")) - F.col("__n")
    ).select("__pid", "__off")
    return (
        local.join(F.broadcast(offsets), "__pid")
        .withColumn(rank_col, (F.col("__lrn") + F.col("__off")).cast("bigint"))
        .drop("__pid", "__lrn", "__off")
    )
