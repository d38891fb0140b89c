"""PyFlink-1.10 verbatim-program compatibility (ref: the import surface
of flink-python/pyflink/{dataset,datastream,table} and the 1.10
program idiom — sqlUpdate DDL, string expressions, insert_into +
env.execute).  The alias layer (my_flink_1_10_2_spark/compat.py) must
let a migrating user's program text run unchanged."""

import pytest

from my_flink_1_10_2_spark.compat import (
    install_pyflink_aliases,
    uninstall_pyflink_aliases,
)


@pytest.fixture()
def pyflink_aliases():
    install_pyflink_aliases(force=True)
    yield
    uninstall_pyflink_aliases()


def test_batch_word_count_program_runs_verbatim(spark, tmp_path, pyflink_aliases):
    """A 1.10-idiom batch program: TableConfig + ExecutionEnvironment +
    BatchTableEnvironment.create(env, config), sql_update filesystem/csv
    sink DDL with the 1.10 'connector.type' property spellings,
    from_elements -> group_by -> string-expression select ->
    insert_into -> execute."""
    # ---- program text a 1.10 user would have written ----
    from pyflink.dataset import ExecutionEnvironment
    from pyflink.table import BatchTableEnvironment, TableConfig

    result_path = str(tmp_path / "result")
    t_config = TableConfig()
    env = ExecutionEnvironment.get_execution_environment()
    t_env = BatchTableEnvironment.create(env, t_config)

    sink_ddl = """
        create table Results(
            word VARCHAR,
            `count` BIGINT
        ) with (
            'connector.type' = 'filesystem',
            'format.type' = 'csv',
            'connector.path' = '{}'
        )
        """.format(result_path)
    t_env.sql_update(sink_ddl)

    content = "to be or not to be that is the question"
    elements = [(word, 1) for word in content.split(" ")]
    t_env.from_elements(elements, ["word", "count"]) \
         .group_by("word") \
         .select("word, count(1) as count") \
         .insert_into("Results")

    t_env.execute("word_count")
    # ---- end program text ----

    got = {
        (r.word, r["count"])
        for r in spark.read.schema("word string, `count` bigint")
        .csv(result_path)
        .collect()
    }
    assert got == {
        ("to", 2), ("be", 2), ("or", 1), ("not", 1),
        ("that", 1), ("is", 1), ("the", 1), ("question", 1),
    }


def test_stream_tumble_window_program_runs_verbatim(spark, pyflink_aliases):
    """The 1.10 fluent-window idiom: Tumble.over(...).on(...).alias +
    group_by(window, key) + string select with window start."""
    from pyflink.table import EnvironmentSettings, StreamTableEnvironment
    from pyflink.table.window import Tumble

    settings = EnvironmentSettings.new_instance().in_streaming_mode().build()
    t_env = StreamTableEnvironment.create(settings)
    rows = [
        ("u1", "2024-01-01 00:00:05", 2),
        ("u1", "2024-01-01 00:00:55", 3),
        ("u2", "2024-01-01 00:01:10", 4),
        ("u1", "2024-01-01 00:01:40", 5),
    ]
    src = t_env.from_elements(rows, ["user", "ts_str", "v"]).select(
        "user, cast(ts_str as timestamp) as rowtime, v"
    )
    windowed = (
        src.window(Tumble.over("1.minutes").on("rowtime").alias("w"))
        .group_by("w, user")
        .select("user, w.start as wstart, sum(v) as total")
    )
    got = {(r.user, str(r.wstart), r.total) for r in windowed.to_pandas().itertuples(index=False)}
    assert got == {
        ("u1", "2024-01-01 00:00:00", 5),
        ("u2", "2024-01-01 00:01:00", 4),
        ("u1", "2024-01-01 00:01:00", 5),
    }


def test_udf_decorator_program_runs_verbatim(spark, pyflink_aliases):
    from pyflink.table import BatchTableEnvironment, DataTypes
    from pyflink.table.udf import udf

    t_env = BatchTableEnvironment.create()

    @udf(input_types=[DataTypes.BIGINT()], result_type=DataTypes.BIGINT())
    def plus_one(x):
        return x + 1

    t_env.register_function("plus_one", plus_one)
    out = t_env.sql_query("SELECT plus_one(v) AS v1 FROM (VALUES (1), (41)) t(v)")
    assert sorted(r.v1 for r in out.to_pandas().itertuples(index=False)) == [2, 42]


def test_aliases_refuse_real_pyflink_without_force(pyflink_aliases):
    # aliases are installed (fixture); a second non-forced install sees
    # the alias marker and succeeds idempotently
    install_pyflink_aliases(force=True)


def test_uninstall_removes_alias_modules():
    import sys

    install_pyflink_aliases(force=True)
    assert "pyflink.table" in sys.modules
    uninstall_pyflink_aliases()
    assert "pyflink" not in sys.modules

def test_install_aliases_is_idempotent(pyflink_aliases):
    """A second non-force install must be a no-op, not a find_spec crash
    on the spec-less alias module."""
    from my_flink_1_10_2_spark.compat import install_pyflink_aliases

    install_pyflink_aliases()  # fixture already installed once
    install_pyflink_aliases()
