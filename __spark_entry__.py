"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001;
``queries()`` exposes every implemented operator from SURVEY.md §2 (plus
the LLM-pipeline operators); ``oracle_sql()`` gives the DuckDB-equivalent
SQL for the t2 correctness gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _registry():
    from my_flink_1_10_2_spark.queries import all_queries

    return all_queries()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 pricing summary) on /root/testdata/sf0.001."""
    from my_flink_1_10_2_spark.session import tune_session

    tune_session(spark)
    reg = _registry()
    return reg["q1_pricing_summary"].spark_fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from my_flink_1_10_2_spark.session import tune_session

    reg = _registry()

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            tune_session(spark)
            return fn(spark, sf_dir)

        return run

    return {name: wrap(q.spark_fn) for name, q in reg.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query (omitted for non-SQL-expressible
    ops — driver records a rows-only check for those)."""
    return {name: q.oracle for name, q in _registry().items() if q.oracle}
