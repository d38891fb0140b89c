"""Scalar function library — the engine's analog of the reference's
built-in function catalog.

Re-exports every Flink-named builder from :mod:`scalar` plus the
coverage catalog ``FUNCTION_CATALOG`` mapping each reference SQL
operator (ref: flink-table/flink-table-planner-blink/.../functions/sql/
FlinkSqlOperatorTable.java, 227 operators; runtime bodies in
flink-table/flink-table-runtime-blink/.../runtime/functions/
SqlFunctionUtils.java) to its Spark-side implementation.
"""

from my_flink_1_10_2_spark.functions.scalar import *  # noqa: F401,F403
from my_flink_1_10_2_spark.functions.scalar import FUNCTION_CATALOG  # noqa: F401
