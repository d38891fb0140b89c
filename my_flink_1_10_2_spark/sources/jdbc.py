"""JDBC connector shim (ref: flink-connectors/flink-jdbc/src/main/java/
org/apache/flink/api/java/io/jdbc/JDBCInputFormat.java,
JDBCOutputFormat.java, JDBCTableSource.java, JDBCOptions.java).

Spark ships a native JDBC data source, so unlike Kafka this mapping is
fully functional — the translation below is the option-name bridge from
the reference's connector spellings to `format("jdbc")`:

  Flink (JDBCOptions / Table WITH keys)      Spark jdbc option
  -----------------------------------------  ---------------------------
  connector.url / url                        url
  connector.table / table-name               dbtable
  connector.driver / driver                  driver
  connector.username / username              user
  connector.password / password              password
  read.partition.column                      partitionColumn
  read.partition.num                         numPartitions
  read.partition.lower-bound                 lowerBound
  read.partition.upper-bound                 upperBound
  read.fetch-size                            fetchsize
  write.flush.max-rows                       batchsize
  (JDBCInputFormat custom query)             query (instead of dbtable)

Scale notes: the partitioned read (partition column + bounds + num) is
the reference's parallel JDBCInputFormat split strategy and Spark's
stride-partitioned scan — both issue one range query per split, so a
100 TB-adjacent dimension load parallelizes across executors instead of
funneling through one connection.  The lookup-join use of
JDBCTableSource maps to `Stream.lookup_join` over the batch frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_READ_KEYS = {
    "url": "url",
    "table-name": "dbtable",
    "table": "dbtable",
    "driver": "driver",
    "username": "user",
    "password": "password",
    "query": "query",
    "read.partition.column": "partitionColumn",
    "read.partition.num": "numPartitions",
    "read.partition.lower-bound": "lowerBound",
    "read.partition.upper-bound": "upperBound",
    "read.fetch-size": "fetchsize",
}

_WRITE_KEYS = {
    "url": "url",
    "table-name": "dbtable",
    "table": "dbtable",
    "driver": "driver",
    "username": "user",
    "password": "password",
    "write.flush.max-rows": "batchsize",
}

_PARTITION_KEYS = frozenset(
    ("partitionColumn", "numPartitions", "lowerBound", "upperBound")
)


def _translate(options: dict[str, str], mapping: dict[str, str]) -> dict[str, str]:
    out: dict[str, str] = {}
    for k, v in options.items():
        key = k.removeprefix("connector.")
        if key not in mapping:
            raise ValueError(f"unknown JDBC option {k!r}")
        out[mapping[key]] = str(v)
    return out


def jdbc_read_options(options: dict[str, str]) -> dict[str, str]:
    """Flink JDBC source options → Spark read options (pure function)."""
    out = _translate(options, _READ_KEYS)
    if "url" not in out:
        raise ValueError("JDBC source needs 'url'")
    if ("dbtable" in out) == ("query" in out):
        raise ValueError("exactly one of table-name / query is required")
    part = _PARTITION_KEYS & set(out)
    if part and part != _PARTITION_KEYS:
        raise ValueError(
            "partitioned read needs all of read.partition."
            "{column,num,lower-bound,upper-bound}; got only "
            + ", ".join(sorted(part))
        )
    return out


def jdbc_write_options(options: dict[str, str]) -> dict[str, str]:
    """Flink JDBC sink options → Spark write options (pure function)."""
    out = _translate(options, _WRITE_KEYS)
    if "url" not in out:
        raise ValueError("JDBC sink needs 'url'")
    if "dbtable" not in out:
        raise ValueError("JDBC sink needs 'table-name'")
    return out


def jdbc_source(spark: SparkSession, options: dict[str, str]) -> DataFrame:
    """Batch JDBC scan (ref: JDBCInputFormat.java) — partitioned when the
    read.partition.* quadruple is present."""
    return spark.read.format("jdbc").options(**jdbc_read_options(options)).load()


def jdbc_sink(df: DataFrame, options: dict[str, str], mode: str = "append") -> None:
    """Batch JDBC write (ref: JDBCOutputFormat.java); for streaming use
    foreachBatch with this as the per-batch writer — the reference's
    JDBCAppendTableSink upsert semantics need a keyed MERGE, which
    belongs to the target database."""
    df.write.format("jdbc").options(**jdbc_write_options(options)).mode(mode).save()
