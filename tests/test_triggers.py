"""Trigger/evictor semantics on a hand-computed dataset
(ref: CountTrigger.java, PurgingTrigger.java, DeltaEvictor.java)."""

from __future__ import annotations

import datetime as dt

import pytest

from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
)

from my_flink_1_10_2_spark.operators.triggers import (
    CountEvictor,
    CountTrigger,
    DeltaEvictor,
    PurgingTrigger,
    triggered_window,
)

SCHEMA = StructType(
    [
        StructField("ts", TimestampNTZType()),
        StructField("k", StringType()),
        StructField("id", LongType()),
        StructField("v", DoubleType()),
    ]
)


@pytest.fixture(scope="module")
def small(spark):
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        # 7 elements for key a in one 1h window: firings at rn 3 and 6,
        # element 7 is leftover and must never fire
        (t0 + dt.timedelta(minutes=i), "a", i, float(i)) for i in range(1, 8)
    ] + [
        # 2 elements for key b: below the count, no firing at all
        (t0 + dt.timedelta(minutes=i), "b", 10 + i, 100.0 + i)
        for i in range(2)
    ]
    return spark.createDataFrame(rows, SCHEMA)


def test_count_trigger_fires_every_n_and_drops_leftover(small):
    out = triggered_window(
        small, "ts", "1 hour", ["k"],
        aggs=[("sum", "v", "s"), ("count", "v", "c")],
        trigger=CountTrigger(3), tiebreak="id",
    ).collect()
    by_key = {}
    for r in out:
        by_key.setdefault(r["k"], []).append(r)
    assert "b" not in by_key  # fewer than n elements: never fires
    a = sorted(by_key["a"], key=lambda r: r["fire_seq"])
    assert [r["fire_seq"] for r in a] == [1, 2]
    assert [r["c"] for r in a] == [3, 6]        # accumulating
    assert [r["s"] for r in a] == [6.0, 21.0]   # 1+2+3, 1+..+6


def test_purging_count_trigger_panes(small):
    out = triggered_window(
        small, "ts", "1 hour", ["k"],
        aggs=[("sum", "v", "s")],
        trigger=PurgingTrigger(CountTrigger(3)), tiebreak="id",
    ).collect()
    a = sorted((r for r in out if r["k"] == "a"), key=lambda r: r["fire_seq"])
    assert [r["s"] for r in a] == [6.0, 15.0]   # 1+2+3, 4+5+6 (purged)


def test_count_evictor_keeps_last_n(small):
    out = triggered_window(
        small, "ts", "1 hour", ["k"],
        aggs=[("sum", "v", "s"), ("count", "v", "c")],
        evictor=CountEvictor(2), tiebreak="id",
    ).collect()
    a = [r for r in out if r["k"] == "a"]
    assert len(a) == 1 and a[0]["c"] == 2 and a[0]["s"] == 13.0  # 6+7
    b = [r for r in out if r["k"] == "b"]
    assert len(b) == 1 and b[0]["c"] == 2 and b[0]["s"] == 201.0


def test_delta_evictor_drops_far_values(small):
    # pane last element for key a is v=7; threshold 2 keeps {5,6,7}
    out = triggered_window(
        small, "ts", "1 hour", ["k"],
        aggs=[("sum", "v", "s"), ("count", "v", "c")],
        evictor=DeltaEvictor("v", 2.0), tiebreak="id",
    ).collect()
    a = [r for r in out if r["k"] == "a"]
    assert len(a) == 1 and a[0]["c"] == 3 and a[0]["s"] == 18.0
