"""connect() descriptor API (ref: pyflink/table/descriptors.py —
FileSystem:676, Kafka:697, OldCsv:272, Csv:381, Json:545, Avro:512,
Schema:175, Rowtime:72; table_environment.py:682 connect();
sources.py CsvTableSource:35; sinks.py CsvTableSink:40).
"""

from __future__ import annotations

import pytest

from my_flink_1_10_2_spark.descriptors import (
    Avro,
    Csv,
    CsvTableSink,
    CsvTableSource,
    FileSystem,
    Json,
    Kafka,
    OldCsv,
    Rowtime,
    Schema,
)
from my_flink_1_10_2_spark.session import TableEnvironment


def test_filesystem_csv_descriptor_roundtrip(spark, tmp_path):
    data = tmp_path / "people.csv"
    data.write_text("id|name\n1|ada\n2|grace\n")
    env = TableEnvironment(spark)
    (
        env.connect(FileSystem().path(str(data)))
        .with_format(OldCsv().field_delimiter("|").ignore_first_line())
        .with_schema(Schema().field("id", "BIGINT").field("name", "STRING"))
        .create_temporary_table("people")
    )
    got = sorted((r.id, r.name) for r in env.sql_query("SELECT * FROM people").df.collect())
    assert got == [(1, "ada"), (2, "grace")]


def test_filesystem_json_and_rowtime_watermark(spark, tmp_path):
    data = tmp_path / "clicks.json"
    data.write_text(
        '{"user_id": 1, "ts": "2021-01-01 00:00:00"}\n'
        '{"user_id": 2, "ts": "2021-01-01 00:10:00"}\n'
    )
    env = TableEnvironment(spark)
    (
        env.connect(FileSystem().path(str(data)))
        .with_format(Json())
        .with_schema(
            Schema()
            .field("user_id", "BIGINT")
            .field("ts", "TIMESTAMP(3)")
            .rowtime(
                Rowtime().timestamps_from_field("ts").watermarks_periodic_bounded(5000)
            )
        )
        .create_temporary_table("clicks")
    )
    assert env.sql_query("SELECT count(*) AS n FROM clicks").df.collect()[0].n == 2
    # the watermark spec landed on the DDL record (stream_table uses it)
    ct = env._ddl_tables["clicks"]
    assert ct.watermark == ("ts", "5 seconds")


def test_descriptor_sink_is_insert_target(spark, tmp_path):
    env = TableEnvironment(spark)
    (
        env.connect(FileSystem().path(str(tmp_path / "out_csv")))
        .with_format(Csv().field_delimiter(";"))
        .with_schema(Schema().field("k", "BIGINT").field("v", "STRING"))
        .create_temporary_table("out_t")
    )
    env.execute_sql("INSERT INTO out_t VALUES (1, 'x'), (2, 'y')")
    got = sorted((r.k, r.v) for r in env.sql_query("SELECT * FROM out_t").df.collect())
    assert got == [(1, "x"), (2, "y")]
    # delimiter honored on disk
    import glob

    raw = "".join(open(f).read() for f in glob.glob(str(tmp_path / "out_csv" / "*.csv")))
    assert ";" in raw


def test_kafka_descriptor_lowering_no_broker(spark):
    env = TableEnvironment(spark)
    desc = (
        env.connect(
            Kafka()
            .version("universal")
            .topic("events")
            .property("bootstrap.servers", "broker:9092")
            .start_from_earliest()
        )
        .with_format(Json())
        .with_schema(Schema().field("v", "STRING"))
    )
    props = desc.to_properties()
    assert props["connector.type"] == "kafka"
    assert props["connector.topic"] == "events"
    assert props["connector.startup-mode"] == "earliest-offset"
    ct = desc._to_create_table("ev")
    assert ct.options["topic"] == "events"
    assert ct.options["scan.startup.mode"] == "earliest-offset"
    assert ct.options["properties.bootstrap.servers"] == "broker:9092"


def test_csv_table_source_and_sink(spark, tmp_path):
    src = tmp_path / "in.csv"
    src.write_text("1,a\n2,b\n")
    env = TableEnvironment(spark)
    env.register_table_source(
        "src_t", CsvTableSource(str(src), ["id", "s"], ["BIGINT", "STRING"])
    )
    env.register_table_sink(
        "snk_t", CsvTableSink(["id", "s"], ["BIGINT", "STRING"], str(tmp_path / "out"))
    )
    env.sql_update("INSERT INTO snk_t SELECT id, s FROM src_t WHERE id = 2")
    env.execute()
    got = [(r.id, r.s) for r in env.sql_query("SELECT * FROM snk_t").df.collect()]
    assert got == [(2, "b")]


def test_descriptor_validation_errors(spark):
    env = TableEnvironment(spark)
    with pytest.raises(ValueError, match="with_schema"):
        env.connect(FileSystem().path("/nope")).with_format(Json()).create_temporary_table("x")
    with pytest.raises(ValueError, match="path"):
        env.connect(FileSystem()).with_schema(
            Schema().field("a", "INT")
        ).create_temporary_table("y")
    with pytest.raises(ValueError, match="topic"):
        env.connect(Kafka()).with_schema(
            Schema().field("a", "INT")
        ).create_temporary_table("z")
    # Avro descriptor carries the format through
    assert Avro().avro_schema('{"type":"record"}').to_properties()["format.type"] == "avro"


def test_environment_settings_and_table_config(spark):
    """ref: environment_settings.py:23, table_config.py:29,
    TableEnvironment.create table_environment.py:1255."""
    import datetime

    from my_flink_1_10_2_spark.config import EnvironmentSettings, TableConfig

    settings = (
        EnvironmentSettings.new_instance()
        .use_blink_planner()
        .in_batch_mode()
        .with_built_in_catalog_name("cat1")
        .with_built_in_database_name("db1")
        .build()
    )
    assert not settings.is_streaming_mode()

    cfg = TableConfig()
    cfg.set_local_timezone("UTC")
    cfg.set_null_check(False)
    cfg.set_idle_state_retention_time(
        datetime.timedelta(hours=1), datetime.timedelta(hours=2)
    )
    assert cfg.get_min_idle_state_retention_time() == 3_600_000
    assert cfg.get_max_idle_state_retention_time() == 7_200_000

    env = TableEnvironment.create(settings, cfg, spark=spark)
    assert env.catalog.name == "cat1"
    assert env.current_database == "db1"
    assert env.in_streaming_mode is False
    assert env.config.get_null_check() is False
    assert env.sql_query("SELECT 1 AS one").df.collect()[0].one == 1

    with pytest.raises(NotImplementedError):
        EnvironmentSettings.new_instance().use_old_planner()


def test_table_environment_navigation_surface(spark, tmp_path):
    """ref: pyflink table_environment.py — register_catalog/get_catalog/
    use_catalog, list_*, register_table/scan, register_function,
    insert_into, drop_temporary_view, explain, get_config."""
    from my_flink_1_10_2_spark.flink_catalog import GenericInMemoryCatalog
    from my_flink_1_10_2_spark.functions.udf_api import udf
    from my_flink_1_10_2_spark.table import Table
    from my_flink_1_10_2_spark.types import DataTypes

    env = TableEnvironment(spark)
    assert env.get_current_catalog() == "default_catalog"
    other = GenericInMemoryCatalog("other_cat", "odb")
    env.register_catalog("other_cat", other)
    assert env.list_catalogs() == ["default_catalog", "other_cat"]
    env.use_catalog("other_cat")
    assert env.get_current_catalog() == "other_cat"
    assert env.get_current_database() == "odb"
    assert env.list_databases() == ["odb"]
    # switching back works — the original catalog stays registered
    env.use_catalog("default_catalog")
    assert env.get_current_catalog() == "default_catalog"

    env2 = TableEnvironment(spark)
    t = Table(spark.createDataFrame([(1, "a")], "id long, s string"))
    env2.register_table("reg_t", t)
    assert "reg_t" in env2.list_temporary_views()
    assert env2.scan("reg_t").count() == 1

    double_it = udf(lambda s: s * 2, result_type=DataTypes.BIGINT())
    env2.register_function("dbl", double_it)
    assert env2.sql_query("SELECT dbl(id) AS d FROM reg_t").df.collect()[0].d == 2

    env2.execute_sql(
        f"""CREATE TABLE nav_sink (id BIGINT, s STRING) WITH (
          'connector'='filesystem', 'path'='{tmp_path / "nav_sink"}',
          'format'='parquet')"""
    )
    env2.insert_into("nav_sink", t)
    assert env2.sql_query("SELECT count(*) AS n FROM nav_sink").df.collect()[0].n == 1

    plan = env2.explain(t)
    assert "Physical Plan" in plan
    assert env2.explain("SELECT 1 AS x")

    assert env2.get_config().get_local_timezone() == "UTC"
    assert env2.drop_temporary_view("reg_t") is True


def test_add_python_file_reaches_executors(spark, tmp_path):
    """ref: pyflink add_python_file → SparkContext.addPyFile: the module
    must be importable inside executor-side functions."""
    mod = tmp_path / "shipped_helper_mod.py"
    mod.write_text("def triple(x):\n    return 3 * x\n")
    env = TableEnvironment(spark)
    env.add_python_file(str(mod))

    def apply_it(it):
        import shipped_helper_mod

        for row in it:
            yield (row.id, shipped_helper_mod.triple(row.id))

    got = dict(spark.range(4).rdd.mapPartitions(apply_it).collect())
    assert got == {0: 0, 1: 3, 2: 6, 3: 9}

    import pytest

    with pytest.raises(NotImplementedError, match="wheels|bake"):
        env.set_python_requirements("requirements.txt")
