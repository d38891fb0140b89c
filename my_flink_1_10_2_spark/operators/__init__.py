"""Custom operators for semantics Spark lacks natively (SURVEY §7.2 step 6).

Each is a composition of built-in DataFrame ops where semantics allow —
the declarative form keeps Catalyst's pushdown/codegen in play — and only
falls back to Pandas-UDF machinery where genuinely required.
"""

from my_flink_1_10_2_spark.operators.joins import asof_join, interval_join
from my_flink_1_10_2_spark.operators.rank import top_n, dedup_keep_first, dedup_keep_last
from my_flink_1_10_2_spark.operators.windows import tumble, hop, session

__all__ = [
    "asof_join",
    "interval_join",
    "top_n",
    "dedup_keep_first",
    "dedup_keep_last",
    "tumble",
    "hop",
    "session",
]
