"""Query registry: every implemented operator family gets a named query.

Each :class:`Query` pairs
  - ``spark_fn(spark, sf_dir) -> DataFrame`` — the engine-side plan, built
    with the Table API / DataFrame ops / ``spark.sql``; and
  - ``oracle`` — equivalent ANSI SQL that DuckDB runs over the identical
    parquet fixtures (``None`` for non-SQL-expressible ops → rows-only
    check).

Column names are aliased identically on both sides (the driver's compare
sorts columns by name before hashing values).

This is the Spark-first analog of the reference's IT-case suite
(ref: flink-table/flink-table-planner-blink/src/test/scala/org/apache/
flink/table/planner/runtime/{stream,batch}/sql/*ITCase.scala).
"""

from __future__ import annotations

import os
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Query:
    name: str
    spark_fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    category: str
    doc: str = ""


REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None, category: str):
    """Decorator: add a (spark_fn, oracle) pair to the registry."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = Query(
            name=name, spark_fn=fn, oracle=oracle, category=category, doc=fn.__doc__ or ""
        )
        return fn

    return deco


def read(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table (lazy parquet scan — pruning/pushdown apply)."""
    from my_flink_1_10_2_spark.catalog import read_table

    return read_table(spark, sf_dir, name)


def register_views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Register fixture tables as temp views for SQL-surface queries."""
    from my_flink_1_10_2_spark.catalog import TABLE_NAMES

    for name in names or TABLE_NAMES:
        read(spark, sf_dir, name).createOrReplaceTempView(name)


def _load_all_modules() -> None:
    # Import side-effect: each module registers its queries.
    from my_flink_1_10_2_spark.queries import (  # noqa: F401
        relational,
        joins,
        setops,
        analytic,
        scalar_functions,
        time_windows,
        tpch,
        tpcds,
        sketches,
        cep,
        graph,
        gelly,
        udf,
        llm,
    )


def all_queries() -> dict[str, Query]:
    _load_all_modules()
    return dict(REGISTRY)
