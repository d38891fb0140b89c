"""Table profiling: per-column statistics in one distributed pass — the
engine-side analog of the reference's catalog statistics collection
(ref: flink-table/flink-table-common/src/main/java/org/apache/flink/
table/catalog/stats/CatalogColumnStatistics.java and the per-type
CatalogColumnStatisticsData* holders: nullCount, min, max, ndv), which
feed the cost-based optimizer exactly like Spark's
``ANALYZE TABLE ... COMPUTE STATISTICS FOR COLUMNS``.

All columns are profiled in ONE aggregation job (Catalyst plans the
multi-distinct via Expand, two shuffles total regardless of column
count); the 1×(4·n_cols) result row is then unpivoted driver-free with
``stack`` into the familiar one-row-per-column stats shape.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(df: DataFrame, columns: Sequence[str] | None = None) -> DataFrame:
    """Per-column stats: (col_name, n_rows, n_nulls, n_distinct,
    min_value, max_value) — min/max rendered as strings so one schema
    covers every column type.  NULLs are excluded from n_distinct
    (ndv semantics, matching CatalogColumnStatisticsData and SQL
    COUNT(DISTINCT)).
    """
    cols = list(columns) if columns is not None else list(df.columns)
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.count(c).alias(f"__cnt_{c}"),
            F.countDistinct(c).alias(f"__ndv_{c}"),
            F.min(c).cast("string").alias(f"__min_{c}"),
            F.max(c).cast("string").alias(f"__max_{c}"),
        ]
    one = df.agg(*aggs)
    stack_args = []
    for c in cols:
        stack_args += [
            F.lit(c),
            F.col(f"__cnt_{c}"),
            F.col(f"__ndv_{c}"),
            F.col(f"__min_{c}"),
            F.col(f"__max_{c}"),
        ]
    return one.select(
        "__n",
        F.stack(F.lit(len(cols)), *stack_args).alias(
            "col_name", "__cnt", "n_distinct", "min_value", "max_value"
        ),
    ).select(
        "col_name",
        F.col("__n").alias("n_rows"),
        (F.col("__n") - F.col("__cnt")).alias("n_nulls"),
        "n_distinct",
        "min_value",
        "max_value",
    )
