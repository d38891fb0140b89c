"""Unit tests for the time-oriented join operators (ref test model:
TemporalRowTimeJoinOperator / TimeBoundedStreamJoin harness tests —
scripted versions + probes, exact expected rows)."""

from __future__ import annotations

import datetime as dt

from my_flink_1_10_2_spark.operators.joins import asof_join


def _ts(s):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


def test_asof_join_null_version_value_stays_null(spark):
    """A version row whose value column is legitimately NULL must win as
    the latest version — the older version's value must NOT leak through
    (the reference's temporal join returns the whole latest row)."""
    rates = spark.createDataFrame(
        [("eur", _ts(0), 1.1), ("eur", _ts(10), None)],
        "ccy string, rtime timestamp_ntz, rate double",
    )
    probes = spark.createDataFrame(
        [("eur", _ts(5)), ("eur", _ts(15))],
        "ccy string, ptime timestamp_ntz",
    )
    out = asof_join(probes, rates, key=("ccy", "ccy"), time=("ptime", "rtime"))
    got = {r["ptime"]: r["rate"] for r in out.collect()}
    assert got[_ts(5)] == 1.1
    assert got[_ts(15)] is None  # latest version's NULL, not 1.1


def test_asof_join_multi_value_cols_same_version(spark):
    """With multiple value columns, all filled values must come from the
    SAME (latest) version row — no mixing across versions when one
    column is NULL in the newest version."""
    rates = spark.createDataFrame(
        [("eur", _ts(0), 1.0, 100.0), ("eur", _ts(10), None, 200.0)],
        "ccy string, rtime timestamp_ntz, bid double, ask double",
    )
    probes = spark.createDataFrame(
        [("eur", _ts(20))], "ccy string, ptime timestamp_ntz"
    )
    row = asof_join(
        probes, rates, key=("ccy", "ccy"), time=("ptime", "rtime")
    ).collect()[0]
    assert row["bid"] is None and row["ask"] == 200.0


def test_asof_join_no_prior_version_is_null(spark):
    probes = spark.createDataFrame(
        [("eur", _ts(0))], "ccy string, ptime timestamp_ntz"
    )
    rates = spark.createDataFrame(
        [("eur", _ts(5), 1.1)], "ccy string, rtime timestamp_ntz, rate double"
    )
    row = asof_join(
        probes, rates, key=("ccy", "ccy"), time=("ptime", "rtime")
    ).collect()[0]
    assert row["rate"] is None
