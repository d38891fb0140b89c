"""JDBC option-translation shim (ref: JDBCOptions.java spellings) —
pure-function tests, no database needed."""

from __future__ import annotations

import pytest

from my_flink_1_10_2_spark.sources.jdbc import jdbc_read_options, jdbc_write_options

URL = "jdbc:postgresql://db:5432/warehouse"


def test_read_basic_and_connector_prefix():
    opts = jdbc_read_options(
        {
            "connector.url": URL,
            "connector.table": "orders",
            "connector.driver": "org.postgresql.Driver",
            "connector.username": "u",
            "connector.password": "p",
        }
    )
    assert opts == {
        "url": URL,
        "dbtable": "orders",
        "driver": "org.postgresql.Driver",
        "user": "u",
        "password": "p",
    }


def test_partitioned_read_quadruple():
    opts = jdbc_read_options(
        {
            "url": URL,
            "table-name": "lineitem",
            "read.partition.column": "l_orderkey",
            "read.partition.num": "32",
            "read.partition.lower-bound": "0",
            "read.partition.upper-bound": "6000000",
        }
    )
    assert opts["partitionColumn"] == "l_orderkey"
    assert opts["numPartitions"] == "32"
    assert opts["lowerBound"] == "0" and opts["upperBound"] == "6000000"
    with pytest.raises(ValueError, match="partitioned read"):
        jdbc_read_options(
            {"url": URL, "table": "t", "read.partition.column": "id"}
        )


def test_query_vs_table_exclusive():
    q = jdbc_read_options({"url": URL, "query": "SELECT 1"})
    assert q["query"] == "SELECT 1"
    with pytest.raises(ValueError, match="table-name / query"):
        jdbc_read_options({"url": URL})
    with pytest.raises(ValueError, match="table-name / query"):
        jdbc_read_options({"url": URL, "table": "t", "query": "SELECT 1"})


def test_write_options():
    opts = jdbc_write_options(
        {"url": URL, "table-name": "out", "write.flush.max-rows": "5000"}
    )
    assert opts["batchsize"] == "5000" and opts["dbtable"] == "out"
    with pytest.raises(ValueError, match="table-name"):
        jdbc_write_options({"url": URL})
    with pytest.raises(ValueError, match="unknown JDBC option"):
        jdbc_write_options({"url": URL, "table": "t", "bogus": "1"})
