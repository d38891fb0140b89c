"""Interactive SQL client — the execute-and-print front-end over the
engine's TableEnvironment (ref: flink-table/flink-sql-client/.../
SqlClient.java + cli/CliClient.java + cli/SqlCommandParser.java).

Contract mirrored from the reference:

- statements accumulate across lines until a terminating ``;``
  (CliClient.java's parseStatement loop);
- the command grammar is SqlCommandParser.java's enum, case-insensitive
  with DOTALL operands: QUIT/EXIT, CLEAR, HELP, SHOW CATALOGS/DATABASES/
  TABLES/FUNCTIONS/MODULES, USE CATALOG, USE, DESCRIBE, EXPLAIN,
  SELECT/WITH, INSERT INTO/OVERWRITE, CREATE/DROP/ALTER TABLE/DATABASE,
  CREATE/DROP VIEW, SET [k=v], RESET, SOURCE <file>;
- queries print in the batch "table mode" grid of CliTableResultView
  (+-...-+ borders, header row, ``Received N rows``); DDL answers with
  the [INFO] strings of CliStrings.java.

Divergence, stated: the reference's ``-d/-e`` YAML environment files are
replaced by ``--init FILE`` (a ;-separated SQL script executed before
the prompt — the SOURCE command gives the same capability in-session).
The engine dispatch itself is session.TableEnvironment.execute_sql /
sql_query — the same surface every other query in this repo uses.

Usage::

    python -m my_flink_1_10_2_spark.sql_client [--init FILE] [-u STMT]
"""

from __future__ import annotations

import re
import sys

_HELP = """\
The following commands are available:

CLEAR\t\tClears the current terminal.
CREATE TABLE\tCreate table under current catalog and database.
CREATE VIEW\tCreates a virtual table from a SQL query.
DESCRIBE\tDescribes the schema of a table with the given name.
DROP TABLE\tDrop table under current catalog and database.
DROP VIEW\tDeletes a previously created virtual table.
EXPLAIN\t\tDescribes the execution plan of a query or table.
HELP\t\tPrints the available commands.
INSERT INTO\tInserts the results of a SQL SELECT query into a declared table sink.
INSERT OVERWRITE\tInserts the results of a SQL SELECT query into a declared table sink and overwrite existing data.
QUIT\t\tQuits the SQL CLI client.
RESET\t\tResets all session configuration properties.
SELECT\t\tExecutes a SQL SELECT query on the Flink cluster.
SET\t\tSets a session configuration property. Syntax: 'SET <key>=<value>;'. Use 'SET;' for listing all properties.
SHOW FUNCTIONS\tShows all user-defined and built-in functions.
SHOW TABLES\tShows all registered tables.
SOURCE\t\tReads a SQL SELECT query from a file and executes it on the Flink cluster.
USE CATALOG\tSets the current catalog.
USE\t\tSets the current default database.
"""

# (name, regex) — order matters, first match wins; mirrors the enum
# order of SqlCommandParser.java:73 (DEFAULT_PATTERN_FLAGS =
# CASE_INSENSITIVE | DOTALL, anchored on the full statement).
_COMMANDS: list[tuple[str, str]] = [
    ("QUIT", r"(QUIT|EXIT)"),
    ("CLEAR", r"CLEAR"),
    ("HELP", r"HELP"),
    ("SHOW_CATALOGS", r"SHOW\s+CATALOGS"),
    ("SHOW_DATABASES", r"SHOW\s+DATABASES"),
    ("SHOW_TABLES", r"SHOW\s+TABLES"),
    ("SHOW_FUNCTIONS", r"SHOW\s+FUNCTIONS"),
    ("SHOW_MODULES", r"SHOW\s+MODULES"),
    ("USE_CATALOG", r"USE\s+CATALOG\s+(.*)"),
    ("USE", r"USE\s+(?!CATALOG)(.*)"),
    ("DESCRIBE", r"DESCRIBE\s+(.*)"),
    ("EXPLAIN", r"EXPLAIN\s+(.*)"),
    ("SELECT", r"(WITH.*SELECT.*|SELECT.*)"),
    ("INSERT_INTO", r"(INSERT\s+INTO.*)"),
    ("INSERT_OVERWRITE", r"(INSERT\s+OVERWRITE.*)"),
    ("CREATE_TABLE", r"(CREATE\s+TABLE\s+.*)"),
    ("DROP_TABLE", r"(DROP\s+TABLE\s+.*)"),
    ("CREATE_VIEW", r"CREATE\s+VIEW\s+(\S+)\s+AS\s+(.*)"),
    ("CREATE_DATABASE", r"(CREATE\s+DATABASE\s+.*)"),
    ("DROP_DATABASE", r"(DROP\s+DATABASE\s+.*)"),
    ("DROP_VIEW", r"DROP\s+VIEW\s+(.*)"),
    ("ALTER_DATABASE", r"(ALTER\s+DATABASE\s+.*)"),
    ("ALTER_TABLE", r"(ALTER\s+TABLE\s+.*)"),
    ("CREATE_FUNCTION", r"(CREATE\s+(?:TEMPORARY\s+)?FUNCTION\s+.*)"),
    ("SET", r"SET(\s+(\S+)\s*=(.*))?"),
    ("RESET", r"RESET"),
    ("SOURCE", r"SOURCE\s+(.*)"),
]
_PATTERNS = [
    (name, re.compile(rx + r"\s*\Z", re.IGNORECASE | re.DOTALL))
    for name, rx in _COMMANDS
]


def parse_command(statement: str) -> tuple[str, tuple[str, ...]]:
    """Statement → (command, operands); raises ValueError on unknown
    input (CliClient prints the 'unknown statement' error for those)."""
    stmt = statement.strip().rstrip(";").strip()
    if not stmt:
        return ("EMPTY", ())
    for name, pat in _PATTERNS:
        m = pat.match(stmt)
        if m:
            return (name, tuple(g for g in m.groups() if g is not None))
    raise ValueError(f"Unknown or unsupported SQL statement: {stmt[:80]}")


def format_table(header: list[str], rows: list[tuple]) -> str:
    """Batch table-mode grid (ref: CliTableResultView / CliUtils): value
    cells stringified, NULL for None, +---+ borders."""

    def s(v) -> str:
        return "NULL" if v is None else str(v)

    cells = [[s(v) for v in row] for row in rows]
    widths = [
        max(len(h), *(len(r[i]) for r in cells)) if cells else len(h)
        for i, h in enumerate(header)
    ]
    border = "+" + "+".join("-" * (w + 2) for w in widths) + "+"
    out = [border]
    out.append(
        "|" + "|".join(f" {h:<{w}} " for h, w in zip(header, widths)) + "|"
    )
    out.append(border)
    for r in cells:
        out.append(
            "|" + "|".join(f" {c:<{w}} " for c, w in zip(r, widths)) + "|"
        )
    out.append(border)
    return "\n".join(out)


class SqlClientSession:
    """One CLI session over a TableEnvironment: execute one parsed
    statement, return the text the client prints."""

    def __init__(self, env=None, max_rows: int = 1000):
        if env is None:
            from my_flink_1_10_2_spark.session import TableEnvironment

            env = TableEnvironment()
        self.env = env
        self.max_rows = max_rows
        self.properties: dict[str, str] = {}

    # -- dispatch ------------------------------------------------------------

    def execute(self, statement: str) -> str:
        cmd, ops = parse_command(statement)
        if cmd == "EMPTY":
            return ""
        if cmd == "QUIT":
            raise EOFError
        if cmd == "CLEAR":
            return "\x1b[2J\x1b[H"
        if cmd == "HELP":
            return _HELP
        if cmd == "SHOW_CATALOGS":
            return self._list(self.env.list_catalogs())
        if cmd == "SHOW_DATABASES":
            return self._list(self.env.list_databases())
        if cmd == "SHOW_TABLES":
            return self._list(sorted(self.env.list_tables()))
        if cmd == "SHOW_FUNCTIONS":
            return self._list(sorted(self.env.list_functions()))
        if cmd == "SHOW_MODULES":
            return self._list(self.env.list_modules())
        if cmd == "USE_CATALOG":
            self.env.use_catalog(ops[0].strip())
            return ""
        if cmd == "USE":
            self.env.use_database(ops[0].strip())
            return ""
        if cmd == "DESCRIBE":
            df = self.env.execute_sql(f"DESCRIBE {ops[0].strip()}")
            return self._render(df)
        if cmd == "EXPLAIN":
            return self.env.explain_sql(ops[0])
        if cmd == "SELECT":
            return self._render(self.env.sql_query(ops[0]).df)
        if cmd in ("INSERT_INTO", "INSERT_OVERWRITE"):
            self.env.execute_sql(ops[0])
            return (
                "[INFO] Submitting SQL update statement to the cluster...\n"
                "[INFO] Table update statement has been successfully submitted"
            )
        if cmd in (
            "CREATE_TABLE", "DROP_TABLE", "CREATE_DATABASE", "DROP_DATABASE",
            "ALTER_DATABASE", "ALTER_TABLE", "CREATE_FUNCTION",
        ):
            self.env.execute_sql(ops[0])
            return "[INFO] Statement has been executed successfully."
        if cmd == "CREATE_VIEW":
            self.env.execute_sql(f"CREATE VIEW {ops[0]} AS {ops[1]}")
            return "[INFO] View has been created."
        if cmd == "DROP_VIEW":
            self.env.execute_sql(f"DROP VIEW {ops[0]}")
            return "[INFO] View has been removed."
        if cmd == "SET":
            if not ops:
                lines = [f"{k}={v}" for k, v in sorted(self.properties.items())]
                return "\n".join(lines) if lines else ""
            key, value = ops[1].strip(), ops[2].strip()
            self.properties[key] = value
            try:  # engine-relevant keys pass through to the Spark conf
                self.env.spark.conf.set(key, value)
            except Exception:  # noqa: BLE001 — non-Spark keys are session-only
                pass
            return ""
        if cmd == "RESET":
            self.properties.clear()
            return ""
        if cmd == "SOURCE":
            path = ops[0].strip().strip("'\"")
            with open(path) as f:
                script = f.read()
            outs = [self.execute(s) for s in split_statements(script)]
            return "\n".join(o for o in outs if o)
        raise ValueError(f"unhandled command {cmd}")  # unreachable

    # -- rendering -----------------------------------------------------------

    def _render(self, df) -> str:
        rows = df.limit(self.max_rows + 1).collect()
        clipped = len(rows) > self.max_rows
        rows = rows[: self.max_rows]
        grid = format_table(list(df.columns), [tuple(r) for r in rows])
        note = f"Received a total of {len(rows)} row(s)"
        if clipped:
            note += f" (result clipped at {self.max_rows})"
        return f"{grid}\n{note}"

    @staticmethod
    def _list(names: list[str]) -> str:
        return "\n".join(names)


def split_statements(text: str) -> list[str]:
    """;-separated statements, quote-aware (a ';' inside '...' string
    literals does not terminate — CliClient reads character-wise with
    the same rule)."""
    out, buf, in_str = [], [], False
    i = 0
    while i < len(text):
        ch = text[i]
        if ch == "'":
            in_str = not in_str
            buf.append(ch)
        elif ch == ";" and not in_str:
            stmt = "".join(buf).strip()
            if stmt:
                out.append(stmt)
            buf = []
        else:
            buf.append(ch)
        i += 1
    tail = "".join(buf).strip()
    if tail:
        out.append(tail)
    return out


def run_repl(stdin, stdout, session: SqlClientSession, prompt: bool = True) -> None:
    """Line loop: accumulate until ';', dispatch, print.  Errors print
    as [ERROR] lines and the session continues (CliClient.java
    callCommand error handling)."""
    banner = "Welcome to the SQL client for my_flink_1_10_2_spark.\n"
    stdout.write(banner)
    buf: list[str] = []
    while True:
        if prompt:
            stdout.write("Flink SQL> " if not buf else "         > ")
            stdout.flush()
        line = stdin.readline()
        if not line:
            break
        buf.append(line)
        text = "".join(buf)
        if ";" not in line:
            continue
        buf = []
        for stmt in split_statements(text):
            try:
                out = session.execute(stmt)
            except EOFError:
                stdout.write("Bye.\n")
                return
            except Exception as exc:  # noqa: BLE001 — REPL survives errors
                stdout.write(f"[ERROR] {exc}\n")
                continue
            if out:
                stdout.write(out + "\n")
    stdout.write("Bye.\n")


def main(argv: list[str] | None = None) -> int:
    import argparse

    p = argparse.ArgumentParser(
        prog="python -m my_flink_1_10_2_spark.sql_client",
        description="Interactive SQL shell over the engine "
        "(ref: SqlClient.java embedded mode)",
    )
    p.add_argument(
        "--init", help="SQL script executed before the prompt "
        "(;-separated; the YAML environment-file analog)",
    )
    p.add_argument(
        "-u", "--update", help="execute a single statement and exit "
        "(ref: SqlClient -u)",
    )
    args = p.parse_args(argv)
    session = SqlClientSession()
    if args.init:
        with open(args.init) as f:
            for stmt in split_statements(f.read()):
                out = session.execute(stmt)
                if out:
                    sys.stdout.write(out + "\n")
    if args.update is not None:
        out = session.execute(args.update)
        if out:
            sys.stdout.write(out + "\n")
        return 0
    run_repl(sys.stdin, sys.stdout, session, prompt=sys.stdin.isatty())
    return 0


if __name__ == "__main__":  # pragma: no cover — exercised via pytest run_repl
    raise SystemExit(main())
