"""my_flink_1_10_2_spark — a PySpark-native analytics engine.

A brand-new engine exposing the query and data-processing capabilities of
the reference stream/batch processor (Apache Flink 1.10.2 API surface:
DataStream / DataSet / Table / SQL), re-expressed idiomatically on
PySpark: DataFrame + Spark SQL + Catalyst for batch, Structured
Streaming + stateful Pandas ops for streams.

Layers (see SURVEY.md §7.0):
  - ``TableEnvironment``  — engine/session + catalog + ``sql()`` entry
    (ref: flink-table/flink-table-api-java/.../TableEnvironmentImpl.java:463)
  - ``Table``             — fluent relational API, thin DataFrame wrapper
    (ref: flink-table/flink-table-api-java/.../Table.java:1)
  - ``Stream``            — DataStream-like API on Structured Streaming
    (ref: flink-streaming-java/.../datastream/DataStream.java:1)

Design stance: declarative-first.  Catalyst replaces the reference's
planner/codegen stack entirely; custom work lives only where Spark has a
semantic gap (as-of joins, count windows, CEP, streaming top-n).
"""

from my_flink_1_10_2_spark.session import TableEnvironment, get_spark
from my_flink_1_10_2_spark.table import Table
from my_flink_1_10_2_spark.catalog import load_tables, TABLE_NAMES

__version__ = "0.1.0"

__all__ = [
    "TableEnvironment",
    "Table",
    "get_spark",
    "load_tables",
    "TABLE_NAMES",
]
