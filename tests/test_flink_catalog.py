"""Catalog SPI + catalog DDL statements (ref:
flink-table/flink-table-common/.../catalog/Catalog.java:1,
GenericInMemoryCatalog, ObjectPath.java; parser ddl/SqlCreateDatabase.java,
SqlDropTable.java, SqlAlterTableRename.java, dql/SqlShowTables.java)."""

from __future__ import annotations

import pytest

from my_flink_1_10_2_spark.flink_catalog import (
    CatalogDatabase,
    CatalogException,
    CatalogFunction,
    CatalogPartitionSpec,
    CatalogTable,
    GenericInMemoryCatalog,
)
from my_flink_1_10_2_spark.session import TableEnvironment

# ---------------------------------------------------------------------------
# pure in-memory SPI (no Spark needed)
# ---------------------------------------------------------------------------


def _cat():
    return GenericInMemoryCatalog("c1")


def test_database_lifecycle():
    cat = _cat()
    assert cat.list_databases() == ["default"]
    cat.create_database("db2", CatalogDatabase(comment="x"))
    assert cat.database_exists("db2")
    assert cat.get_database("db2").comment == "x"
    with pytest.raises(CatalogException):
        cat.create_database("db2")
    cat.create_database("db2", ignore_if_exists=True)  # no raise
    cat.drop_database("db2")
    assert not cat.database_exists("db2")
    with pytest.raises(CatalogException):
        cat.drop_database("nope")
    cat.drop_database("nope", ignore_if_not_exists=True)


def test_drop_database_restrict_vs_cascade():
    cat = _cat()
    cat.create_database("db2")
    cat.create_table("db2", "t", CatalogTable(reader=lambda: None))
    with pytest.raises(CatalogException):
        cat.drop_database("db2")  # RESTRICT default: non-empty
    cat.drop_database("db2", cascade=True)
    assert not cat.database_exists("db2")


def test_table_lifecycle_and_rename():
    cat = _cat()
    cat.create_table("default", "t1", CatalogTable(reader=lambda: "df1"))
    assert cat.table_exists("default", "t1")
    assert cat.list_tables("default") == ["t1"]
    assert cat.get_table("default", "t1").reader() == "df1"
    cat.rename_table("default", "t1", "t2")
    assert cat.list_tables("default") == ["t2"]
    with pytest.raises(CatalogException):
        cat.get_table("default", "t1")
    cat.drop_table("default", "t2")
    assert cat.list_tables("default") == []
    with pytest.raises(CatalogException):
        cat.create_table("missing_db", "t", CatalogTable(reader=lambda: None))


def test_views_listed_separately():
    cat = _cat()
    cat.create_table("default", "t", CatalogTable(reader=lambda: None))
    cat.create_table("default", "v", CatalogTable(reader=lambda: None, is_view=True))
    assert cat.list_tables("default") == ["t", "v"]
    assert cat.list_views("default") == ["v"]


def test_partition_lifecycle_and_partial_filter():
    cat = _cat()
    cat.create_table(
        "default",
        "sales",
        CatalogTable(reader=lambda: None, partition_keys=["region", "day"]),
    )
    for region in ("eu", "us"):
        for day in ("1", "2"):
            cat.create_partition(
                "default", "sales", CatalogPartitionSpec({"region": region, "day": day})
            )
    assert len(cat.list_partitions("default", "sales")) == 4
    eu = cat.list_partitions(
        "default", "sales", CatalogPartitionSpec({"region": "eu"})
    )
    assert [p.spec["day"] for p in eu] == ["1", "2"]
    spec = CatalogPartitionSpec({"region": "eu", "day": "1"})
    assert cat.partition_exists("default", "sales", spec)
    cat.drop_partition("default", "sales", spec)
    assert not cat.partition_exists("default", "sales", spec)
    # spec keys must match the table's partition keys exactly
    with pytest.raises(CatalogException):
        cat.create_partition(
            "default", "sales", CatalogPartitionSpec({"region": "eu"})
        )
    # unpartitioned table refuses partition ops
    cat.create_table("default", "flat", CatalogTable(reader=lambda: None))
    with pytest.raises(CatalogException):
        cat.list_partitions("default", "flat")


def test_function_lifecycle():
    cat = _cat()
    cat.create_function("default", "f1", CatalogFunction("mod.fn"))
    assert cat.list_functions("default") == ["f1"]
    assert cat.get_function("default", "f1").class_name == "mod.fn"
    with pytest.raises(CatalogException):
        cat.create_function("default", "f1", CatalogFunction("x"))
    cat.drop_function("default", "f1")
    assert cat.list_functions("default") == []


def test_table_statistics():
    cat = _cat()
    cat.create_table("default", "t", CatalogTable(reader=lambda: None))
    assert cat.get_table_statistics("default", "t") == {}
    cat.alter_table_statistics("default", "t", {"rowCount": 42})
    assert cat.get_table_statistics("default", "t")["rowCount"] == 42


# ---------------------------------------------------------------------------
# SQL statement routing through TableEnvironment.execute_sql
# ---------------------------------------------------------------------------


def test_catalog_ddl_statements(spark, tmp_path):
    env = TableEnvironment(spark)
    env.execute_sql("CREATE DATABASE analytics COMMENT 'rollups'")
    dbs = [r.database_name for r in env.execute_sql("SHOW DATABASES").collect()]
    assert dbs == ["analytics", "default"]

    env.execute_sql("USE analytics")
    assert env.current_database == "analytics"

    path = str(tmp_path / "t1")
    spark.createDataFrame([(1, "a"), (2, "b")], "id long, s string").write.mode(
        "overwrite"
    ).parquet(path)
    env.execute_sql(
        f"""CREATE TABLE t1 (id BIGINT, s STRING)
        WITH ('connector'='filesystem','path'='{path}','format'='parquet')"""
    )
    assert [r.table_name for r in env.execute_sql("SHOW TABLES").collect()] == ["t1"]

    desc = {r.name: r.type for r in env.execute_sql("DESCRIBE t1").collect()}
    assert desc == {"id": "bigint", "s": "string"}

    env.execute_sql("ALTER TABLE t1 RENAME TO t2")
    assert [r.table_name for r in env.execute_sql("SHOW TABLES").collect()] == ["t2"]
    assert env.sql_query("SELECT count(*) AS n FROM t2").df.collect()[0].n == 2

    env.execute_sql("DROP TABLE t2")
    assert env.execute_sql("SHOW TABLES").count() == 0
    env.execute_sql("DROP TABLE IF EXISTS t2")  # no raise
    with pytest.raises(CatalogException):
        env.execute_sql("DROP TABLE t2")

    env.execute_sql("USE default")
    env.execute_sql("DROP DATABASE analytics")
    assert [r.database_name for r in env.execute_sql("SHOW DATABASES").collect()] == [
        "default"
    ]


def test_show_views_and_functions(spark):
    env = TableEnvironment(spark)
    spark.createDataFrame([(1,)], "x long").createOrReplaceTempView("base_t")
    env.execute_sql("CREATE VIEW v_doubled AS SELECT x * 2 AS y FROM base_t")
    assert [r.view_name for r in env.execute_sql("SHOW VIEWS").collect()] == [
        "v_doubled"
    ]
    env.execute_sql(
        "CREATE FUNCTION my_upper AS 'tests.test_ddl.plain_upper' LANGUAGE PYTHON"
    )
    assert [
        r.function_name for r in env.execute_sql("SHOW FUNCTIONS").collect()
    ] == ["my_upper"]
    env.execute_sql("DROP VIEW v_doubled")
    assert env.execute_sql("SHOW VIEWS").count() == 0
    env.execute_sql("DROP VIEW IF EXISTS v_doubled")
    with pytest.raises(ValueError):
        env.execute_sql("DROP VIEW v_doubled")


# ---------------------------------------------------------------------------
# PARTITIONED BY: parse, read, prune, discover
# ---------------------------------------------------------------------------

_PART_DDL = """
CREATE TABLE sales (
  amount DOUBLE,
  region STRING,
  day INT
) PARTITIONED BY (region, day) WITH (
  'connector' = 'filesystem',
  'path' = '{path}',
  'format' = 'parquet'
)
"""


def _write_partitioned(spark, path: str) -> None:
    rows = [
        (float(i), region, day)
        for i, (region, day) in enumerate(
            [(r, d) for r in ("eu", "us") for d in (1, 2)] * 5
        )
    ]
    spark.createDataFrame(rows, "amount double, region string, day int").write.mode(
        "overwrite"
    ).partitionBy("region", "day").parquet(path)


def test_parse_partitioned_by():
    from my_flink_1_10_2_spark.ddl import parse_create_table

    ct = parse_create_table(_PART_DDL.format(path="/tmp/x"))
    assert ct.partition_keys == ["region", "day"]
    # partition keys must be declared columns
    bad = _PART_DDL.replace("PARTITIONED BY (region, day)", "PARTITIONED BY (nope)")
    with pytest.raises(ValueError):
        parse_create_table(bad.format(path="/tmp/x"))


def test_partitioned_table_read_prune_discover(spark, tmp_path):
    path = str(tmp_path / "sales")
    _write_partitioned(spark, path)
    env = TableEnvironment(spark)
    env.execute_sql(_PART_DDL.format(path=path))

    # correct values including partition columns, with DDL-declared types
    df = env.sql_query("SELECT region, day, sum(amount) AS s FROM sales GROUP BY region, day").df
    got = {(r.region, r.day): r.s for r in df.collect()}
    assert set(got) == {("eu", 1), ("eu", 2), ("us", 1), ("us", 2)}
    assert dict(df.dtypes)["day"] == "int"

    # partition pruning reaches the scan: a filter on the partition column
    # appears as PartitionFilters, not a post-scan Filter over all files
    plan = env.sql_query(
        "SELECT sum(amount) AS s FROM sales WHERE region = 'eu'"
    ).df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "region" in plan.split("PartitionFilters")[1][:120]

    # SHOW PARTITIONS sees the auto-discovered hive layout
    parts = [r.partition for r in env.execute_sql("SHOW PARTITIONS sales").collect()]
    assert parts == ["region=eu/day=1", "region=eu/day=2", "region=us/day=1", "region=us/day=2"]


def test_analyze_table_statistics(spark, tmp_path):
    """ANALYZE TABLE ... COMPUTE STATISTICS files the row count in the
    catalog (ref: Catalog.java alterTableStatistics,
    stats/CatalogTableStatistics.java)."""
    env = TableEnvironment(spark)
    path = str(tmp_path / "t_an")
    spark.range(7).write.mode("overwrite").parquet(path)
    env.execute_sql(
        f"""CREATE TABLE t_an (id BIGINT)
        WITH ('connector'='filesystem','path'='{path}','format'='parquet')"""
    )
    out = env.execute_sql("ANALYZE TABLE t_an COMPUTE STATISTICS")
    assert out.collect()[0].rowCount == 7
    assert env.catalog.get_table_statistics("default", "t_an") == {"rowCount": 7}


def test_db_qualified_names_and_unsupported_alter(spark, tmp_path):
    """[db.]table resolution (ref: ObjectPath.java) + a clear error for
    catalog statements outside the supported grammar."""
    env = TableEnvironment(spark)
    env.execute_sql("CREATE DATABASE db9")
    path = str(tmp_path / "tq")
    spark.range(3).write.mode("overwrite").parquet(path)
    env.execute_sql("USE db9")
    env.execute_sql(
        f"""CREATE TABLE tq (id BIGINT)
        WITH ('connector'='filesystem','path'='{path}','format'='parquet')"""
    )
    env.execute_sql("USE default")
    # qualified DESCRIBE + DROP from another current database
    desc = {r.name for r in env.execute_sql("DESCRIBE db9.tq").collect()}
    assert desc == {"id"}
    env.execute_sql("DROP TABLE db9.tq")
    assert env.catalog.list_tables("db9") == []
    with pytest.raises(ValueError, match="unsupported catalog statement"):
        env.execute_sql("ALTER TABLE t SET ('k'='v')")
