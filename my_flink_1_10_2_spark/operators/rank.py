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
