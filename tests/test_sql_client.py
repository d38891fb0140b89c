"""SQL client REPL (sql_client.py — ref: SqlClient.java embedded mode,
cli/SqlCommandParser.java grammar, cli/CliClient.java statement loop):
scripted-stdin sessions driving DDL + queries + result printing over
the real engine."""

from __future__ import annotations

import io
import os

import pytest

from my_flink_1_10_2_spark.sql_client import (
    SqlClientSession,
    format_table,
    parse_command,
    run_repl,
    split_statements,
)
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def session(spark):
    from my_flink_1_10_2_spark.session import TableEnvironment

    return SqlClientSession(TableEnvironment(spark))


def _repl(session, script: str) -> str:
    out = io.StringIO()
    run_repl(io.StringIO(script), out, session, prompt=False)
    return out.getvalue()


def test_command_grammar_matches_reference_enum():
    assert parse_command("QUIT;")[0] == "QUIT"
    assert parse_command("exit")[0] == "QUIT"
    assert parse_command("  Help ;")[0] == "HELP"
    assert parse_command("SHOW TABLES")[0] == "SHOW_TABLES"
    assert parse_command("USE CATALOG c")[:2] == ("USE_CATALOG", ("c",))
    assert parse_command("USE db1") == ("USE", ("db1",))
    assert parse_command("select 1") [0] == "SELECT"
    assert parse_command("WITH t AS (SELECT 1) SELECT * FROM t")[0] == "SELECT"
    assert parse_command("INSERT INTO x SELECT 1")[0] == "INSERT_INTO"
    cmd, ops = parse_command("SET a.b = c d")
    assert cmd == "SET" and ops[1:] == ("a.b", " c d")
    assert parse_command("SET")[1] == ()
    assert parse_command("EXPLAIN SELECT 1") == ("EXPLAIN", ("SELECT 1",))
    with pytest.raises(ValueError, match="Unknown"):
        parse_command("FROBNICATE 7")


def test_split_statements_quote_aware():
    assert split_statements("SELECT 'a;b'; SELECT 2;") == [
        "SELECT 'a;b'",
        "SELECT 2",
    ]


def test_format_table_grid():
    grid = format_table(["k", "name"], [(1, "ALGERIA"), (2, None)])
    lines = grid.splitlines()
    assert lines[0] == lines[2] == lines[-1]
    assert lines[0].startswith("+") and "-" in lines[0]
    assert "| k | name    |" == lines[1]
    assert "| 2 | NULL    |" in lines


def test_repl_ddl_query_and_print(session):
    nation = os.path.join(SF_DIR, "nation.parquet")
    script = f"""
CREATE TABLE cli_nation (
  n_nationkey BIGINT,
  n_name STRING,
  n_regionkey BIGINT
) WITH (
  'connector' = 'filesystem',
  'path' = '{nation}',
  'format' = 'parquet'
);
SELECT n_regionkey, count(*) AS n FROM cli_nation
GROUP BY n_regionkey ORDER BY n_regionkey;
QUIT;
"""
    out = _repl(session, script)
    assert "[INFO] Statement has been executed successfully." in out
    assert "| n_regionkey | n |" in out
    assert "| 0           | 5 |" in out
    assert "Received a total of 5 row(s)" in out
    assert out.rstrip().endswith("Bye.")


def test_repl_show_describe_explain_and_views(session):
    out = _repl(
        session,
        "CREATE VIEW cli_v AS SELECT n_name, n_regionkey FROM cli_nation;"
        "SHOW TABLES;"
        "DESCRIBE cli_v;"
        "EXPLAIN SELECT * FROM cli_v;"
        "SELECT count(*) AS c FROM cli_v;"
        "DROP VIEW cli_v;",
    )
    assert "[INFO] View has been created." in out
    assert "cli_nation" in out and "cli_v" in out
    assert "n_name" in out
    assert "== Optimized" in out or "Physical Plan" in out or "Plan" in out
    assert "| 25 |" in out
    assert "[INFO] View has been removed." in out


def test_repl_set_reset_and_errors_survive(session):
    out = _repl(
        session,
        "SET table.exec.cli-test = 42;"
        "SET;"
        "SELECT definitely_not_a_column FROM cli_nation;"
        "SELECT 1 AS ok;"
        "RESET;"
        "SET;",
    )
    assert "table.exec.cli-test=42" in out
    assert "[ERROR]" in out  # bad query reported...
    assert "| 1  |" in out or "| ok |" in out  # ...session continued
    # RESET wipes the property listing
    assert out.count("table.exec.cli-test=42") == 1


def test_repl_source_command(session, tmp_path):
    f = tmp_path / "script.sql"
    f.write_text("SELECT 7 AS seven;")
    out = _repl(session, f"SOURCE {f};")
    assert "seven" in out and "| 7" in out


def test_multiline_statement_accumulates(session):
    out = _repl(session, "SELECT\n1 AS a\n;\n")
    assert "| a |" in out and "| 1 |" in out


def test_help_lists_reference_commands(session):
    out = _repl(session, "HELP;")
    for word in ("CREATE TABLE", "INSERT INTO", "USE CATALOG", "SOURCE"):
        assert word in out
