"""Kafka option-translation shim (no broker needed): Flink connector
option spellings (ref: FlinkKafkaConsumerBase.java, KafkaValidator.java)
must map to the exact Spark `format("kafka")` options."""

from __future__ import annotations

import json

import pytest

from my_flink_1_10_2_spark.sources.streaming import (
    kafka_sink_options,
    kafka_source_options,
)

PROPS = {"bootstrap.servers": "broker1:9092,broker2:9092", "group.id": "g1"}


def test_topic_list_and_properties():
    opts = kafka_source_options(["a", "b"], properties=PROPS)
    assert opts["subscribe"] == "a,b"
    assert opts["kafka.bootstrap.servers"] == "broker1:9092,broker2:9092"
    assert opts["kafka.group.id"] == "g1"
    # group-offsets default → latest cold start (checkpoint takes over)
    assert opts["startingOffsets"] == "latest"


def test_topic_pattern():
    opts = kafka_source_options(topic_pattern="events-.*", properties=PROPS)
    assert opts["subscribePattern"] == "events-.*"
    assert "subscribe" not in opts


def test_startup_modes():
    assert (
        kafka_source_options("t", properties=PROPS, startup_mode="earliest-offset")[
            "startingOffsets"
        ]
        == "earliest"
    )
    assert (
        kafka_source_options("t", properties=PROPS, startup_mode="latest-offset")[
            "startingOffsets"
        ]
        == "latest"
    )
    ts = kafka_source_options(
        "t", properties=PROPS, startup_mode="timestamp",
        startup_timestamp_millis=1700000000000,
    )
    assert ts["startingTimestamp"] == "1700000000000"


def test_specific_offsets_translation():
    opts = kafka_source_options(
        "orders",
        properties=PROPS,
        startup_mode="specific-offsets",
        specific_offsets="partition:0,offset:42;partition:1,offset:300",
    )
    assert json.loads(opts["startingOffsets"]) == {"orders": {"0": 42, "1": 300}}


def test_consumer_extra_properties_prefixed():
    opts = kafka_source_options(
        "t",
        properties={**PROPS, "isolation.level": "read_committed"},
        max_offsets_per_trigger=10000,
    )
    assert opts["kafka.isolation.level"] == "read_committed"
    assert opts["maxOffsetsPerTrigger"] == "10000"


def test_source_validation_errors():
    with pytest.raises(ValueError, match="topic"):
        kafka_source_options(properties=PROPS)
    with pytest.raises(ValueError, match="topic"):
        kafka_source_options("t", topic_pattern="x", properties=PROPS)
    with pytest.raises(ValueError, match="bootstrap"):
        kafka_source_options("t", properties={"group.id": "g"})
    with pytest.raises(ValueError, match="startup-mode"):
        kafka_source_options("t", properties=PROPS, startup_mode="bogus")
    with pytest.raises(ValueError, match="specific_offsets"):
        kafka_source_options("t", properties=PROPS, startup_mode="specific-offsets")
    with pytest.raises(ValueError, match="malformed"):
        kafka_source_options(
            "t", properties=PROPS, startup_mode="specific-offsets",
            specific_offsets="partition:0",
        )
    with pytest.raises(ValueError, match="single topic"):
        kafka_source_options(
            ["a", "b"], properties=PROPS, startup_mode="specific-offsets",
            specific_offsets="partition:0,offset:1",
        )


def test_sink_options_and_semantics():
    opts = kafka_sink_options("out", properties=PROPS)
    assert opts["topic"] == "out"
    assert opts["kafka.bootstrap.servers"].startswith("broker1")
    with pytest.raises(NotImplementedError, match="at-least-once"):
        kafka_sink_options("out", properties=PROPS, semantic="exactly-once")
    with pytest.raises(ValueError, match="semantic"):
        kafka_sink_options("out", properties=PROPS, semantic="maybe")
