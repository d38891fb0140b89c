"""Elasticsearch + Kinesis connector shims: Flink option surface →
Spark data-source options.

Like the Kafka shim (sources/streaming.py), these are thin, fully
unit-testable option-translation layers: the sandbox has no ES cluster or
Kinesis endpoint (and Spark's ES/Kinesis connectors are external jars), so
the *mapping* is the testable contract and the constructors raise a clear
error when the connector jar is absent instead of an opaque classpath
failure.

References:
  flink-connectors/flink-connector-elasticsearch-base/src/main/java/org/
    apache/flink/streaming/connectors/elasticsearch/ElasticsearchSinkBase.java
    (bulk-flush.* options, failure handlers)
  flink-connectors/flink-connector-kinesis/src/main/java/org/apache/flink/
    streaming/connectors/kinesis/FlinkKinesisConsumer.java and
    config/ConsumerConfigConstants.java (initial position, AWS credentials)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# ---------------------------------------------------------------------------
# Elasticsearch sink (ref: ElasticsearchSinkBase.java; table descriptor
# options in flink-table .../descriptors/Elasticsearch.java)
#
# Option parity table (Flink → es-hadoop Spark options):
#   hosts ("http://h1:9200;http://h2:9200") → es.nodes=h1:9200,h2:9200
#   index + document-type                   → es.resource=index/type
#   primary key (upsert mode)               → es.mapping.id + es.write.operation=upsert
#   bulk-flush.max-actions                  → es.batch.size.entries
#   bulk-flush.max-size (mb)                → es.batch.size.bytes
#   bulk-flush.interval                     → (per-batch flush; micro-batch
#                                              boundary IS the flush interval)
#   bulk-flush.backoff.max-retries          → es.batch.write.retry.count
#   bulk-flush.backoff.delay                → es.batch.write.retry.wait
#   failure-handler=fail                    → es.batch.write.retry.count=0
#   failure-handler=retry-rejected          → (retries per backoff options)
#   failure-handler=ignore                  → NotImplementedError (silent
#                                              data loss is not a mapping
#                                              this engine will imply)
# ---------------------------------------------------------------------------


def elasticsearch_sink_options(
    hosts: str | list[str],
    index: str,
    *,
    document_type: str = "_doc",
    key_field: str | None = None,
    failure_handler: str = "fail",
    bulk_flush_max_actions: int | None = None,
    bulk_flush_max_size_mb: int | None = None,
    bulk_flush_backoff_max_retries: int | None = None,
    bulk_flush_backoff_delay_millis: int | None = None,
) -> dict[str, str]:
    """Translate Flink ES sink options to es-hadoop options (pure
    function — see the parity table above)."""
    host_list = hosts.split(";") if isinstance(hosts, str) else list(hosts)
    nodes = []
    for h in host_list:
        h = h.strip()
        if not h:
            continue
        nodes.append(h.removeprefix("http://").removeprefix("https://"))
    if not nodes:
        raise ValueError("at least one ES host is required")
    opts: dict[str, str] = {
        "es.nodes": ",".join(nodes),
        "es.resource": f"{index}/{document_type}",
    }
    if key_field is not None:
        # upsert (key'd) mode — the reference's UpsertStreamTableSink path
        opts["es.mapping.id"] = key_field
        opts["es.write.operation"] = "upsert"
    if failure_handler == "fail":
        opts["es.batch.write.retry.count"] = "0"
    elif failure_handler == "retry-rejected":
        if bulk_flush_backoff_max_retries is not None:
            opts["es.batch.write.retry.count"] = str(bulk_flush_backoff_max_retries)
        if bulk_flush_backoff_delay_millis is not None:
            opts["es.batch.write.retry.wait"] = f"{bulk_flush_backoff_delay_millis}ms"
    elif failure_handler == "ignore":
        raise NotImplementedError(
            "failure-handler=ignore drops failed documents silently; map "
            "failures to a dead-letter sink with for_each_batch instead"
        )
    else:
        raise ValueError(f"unknown failure-handler {failure_handler!r}")
    if bulk_flush_max_actions is not None:
        opts["es.batch.size.entries"] = str(bulk_flush_max_actions)
    if bulk_flush_max_size_mb is not None:
        opts["es.batch.size.bytes"] = f"{bulk_flush_max_size_mb}mb"
    return opts


def elasticsearch_sink(df: DataFrame, checkpoint: str, **kwargs):
    """Streaming ES sink (ref: ElasticsearchSinkBase.java).  Requires the
    es-hadoop connector jar (`org.elasticsearch.spark.sql`) on the
    classpath; raises a clear error when absent."""
    opts = elasticsearch_sink_options(**kwargs)
    try:
        return (
            df.writeStream.format("org.elasticsearch.spark.sql")
            .options(**opts)
            .option("checkpointLocation", checkpoint)
            .start()
        )
    except Exception as ex:  # pragma: no cover - jar-gated
        raise RuntimeError(
            "Elasticsearch connector jar (elasticsearch-spark) not on the "
            "classpath — add it with spark.jars.packages"
        ) from ex


# ---------------------------------------------------------------------------
# Kinesis source (ref: FlinkKinesisConsumer.java, ConsumerConfigConstants)
#
# Option parity table (Flink → spark-sql-kinesis options):
#   stream name                        → streamName
#   aws.region                         → (endpointUrl derived) / region
#   aws.endpoint                       → endpointUrl
#   aws.credentials.provider=BASIC
#     + aws.credentials.basic.accesskeyid  → awsAccessKeyId
#     + aws.credentials.basic.secretkey    → awsSecretKey
#   aws.credentials.provider=AUTO      → (default provider chain; no opts)
#   flink.stream.initpos=LATEST        → startingPosition=latest
#   flink.stream.initpos=TRIM_HORIZON  → startingPosition=trim_horizon
#   flink.stream.initpos=AT_TIMESTAMP
#     + flink.stream.initpos.timestamp → startingPosition=at_timestamp
#                                        + startingTimestamp
#   flink.shard.getrecords.maxrecordcount → maxFetchRecordsPerShard
# ---------------------------------------------------------------------------

_INITPOS = {
    "LATEST": "latest",
    "TRIM_HORIZON": "trim_horizon",
    "AT_TIMESTAMP": "at_timestamp",
}


def kinesis_source_options(
    stream: str,
    *,
    region: str | None = None,
    endpoint: str | None = None,
    access_key_id: str | None = None,
    secret_key: str | None = None,
    initial_position: str = "LATEST",
    initial_timestamp: float | None = None,
    max_records_per_shard: int | None = None,
) -> dict[str, str]:
    """Translate Flink Kinesis consumer options to spark-sql-kinesis
    options (pure function — see the parity table above)."""
    if initial_position not in _INITPOS:
        raise ValueError(
            f"unknown initial position {initial_position!r}; "
            f"expected one of {tuple(_INITPOS)}"
        )
    if region is None and endpoint is None:
        raise ValueError("one of region / endpoint is required")
    opts: dict[str, str] = {"streamName": stream}
    opts["endpointUrl"] = (
        endpoint
        if endpoint is not None
        else f"https://kinesis.{region}.amazonaws.com"
    )
    if (access_key_id is None) != (secret_key is None):
        raise ValueError("BASIC credentials need both access_key_id and secret_key")
    if access_key_id is not None:
        opts["awsAccessKeyId"] = access_key_id
        opts["awsSecretKey"] = secret_key
    opts["startingPosition"] = _INITPOS[initial_position]
    if initial_position == "AT_TIMESTAMP":
        if initial_timestamp is None:
            raise ValueError("AT_TIMESTAMP needs initial_timestamp (epoch seconds)")
        opts["startingTimestamp"] = str(initial_timestamp)
    elif initial_timestamp is not None:
        raise ValueError("initial_timestamp only applies to AT_TIMESTAMP")
    if max_records_per_shard is not None:
        opts["maxFetchRecordsPerShard"] = str(int(max_records_per_shard))
    return opts


def kinesis_source(spark: SparkSession, **kwargs) -> DataFrame:
    """Kinesis source stream (ref: FlinkKinesisConsumer.java).  Requires a
    kinesis structured-streaming connector jar; raises a clear error when
    absent."""
    opts = kinesis_source_options(**kwargs)
    try:
        return spark.readStream.format("kinesis").options(**opts).load()
    except Exception as ex:  # pragma: no cover - jar-gated
        raise RuntimeError(
            "Kinesis connector jar (spark-sql-kinesis) not on the "
            "classpath — add it with spark.jars.packages"
        ) from ex
