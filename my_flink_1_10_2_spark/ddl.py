"""SQL DDL surface — ``CREATE TABLE ... WITH (...)`` + ``WATERMARK FOR``
(ref: flink-sql-parser/.../ddl/SqlCreateTable.java:56, SqlWatermark.java;
planner wiring CatalogSourceTable.scala).

The reference registers connector-backed sources from DDL text; here the
filesystem connector maps onto Spark's native readers:

  CREATE TABLE clicks (
    user_id BIGINT,
    ts TIMESTAMP(3),
    WATERMARK FOR ts AS ts - INTERVAL '5' SECOND
  ) WITH (
    'connector' = 'filesystem',
    'path'      = '/data/clicks',
    'format'    = 'parquet'
  )

registers a lazy batch view under the table name (scans stay
pushdown/pruning-friendly — nothing is materialized at DDL time) and
records the watermark spec so the streaming surface
(``TableEnvironment.stream_table``) reads the same path with
``readStream`` + ``withWatermark`` — the Spark spelling of the
reference's rowtime-attribute-with-bounded-delay (SURVEY §1.2).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_CT_HEAD = re.compile(
    r"^\s*CREATE\s+(?:TEMPORARY\s+)?TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?([\w.]+)\s*\(",
    re.IGNORECASE,
)

# Flink DDL type → Spark SQL type
_TYPE_MAP = {
    "STRING": "string",
    "VARCHAR": "string",
    "CHAR": "string",
    "BYTES": "binary",
    "TINYINT": "tinyint",
    "SMALLINT": "smallint",
    "INT": "int",
    "INTEGER": "int",
    "BIGINT": "bigint",
    "FLOAT": "float",
    "DOUBLE": "double",
    "BOOLEAN": "boolean",
    "DATE": "date",
    "TIMESTAMP": "timestamp_ntz",  # Flink TIMESTAMP(p) is local-time
    "TIMESTAMP_LTZ": "timestamp",
}


@dataclass
class CreateTable:
    name: str
    columns: list[tuple[str, str]]  # (col, spark type)
    watermark: tuple[str, str] | None  # (col, delay e.g. "5 seconds")
    primary_key: list[str] = field(default_factory=list)
    options: dict[str, str] = field(default_factory=dict)


def contains_create_table(query: str) -> bool:
    return _CT_HEAD.match(query) is not None


def _split_top_level(s: str) -> list[str]:
    parts, depth, cur = [], 0, []
    for ch in s:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
            continue
        cur.append(ch)
    parts.append("".join(cur))
    return [p.strip() for p in parts if p.strip()]


def _flink_type(t: str) -> str:
    base = re.match(r"(\w+)", t.strip()).group(1).upper()
    if base == "DECIMAL" or base == "NUMERIC":
        m = re.fullmatch(r"\w+\s*\(\s*(\d+)\s*,\s*(\d+)\s*\)", t.strip())
        return f"decimal({m.group(1)},{m.group(2)})" if m else "decimal(10,0)"
    if base not in _TYPE_MAP:
        raise ValueError(f"unsupported DDL type: {t!r}")
    return _TYPE_MAP[base]


_UNITS = {"SECOND": "seconds", "MINUTE": "minutes", "HOUR": "hours", "DAY": "days"}


def parse_create_table(query: str) -> CreateTable:
    head = _CT_HEAD.match(query)
    if not head:
        raise ValueError("not a CREATE TABLE statement")
    name = head.group(1)
    # body = balanced-paren section after the head
    start = head.end()
    depth, i = 1, start
    while i < len(query) and depth:
        if query[i] == "(":
            depth += 1
        elif query[i] == ")":
            depth -= 1
        i += 1
    body, rest = query[start : i - 1], query[i:]

    columns: list[tuple[str, str]] = []
    watermark: tuple[str, str] | None = None
    primary_key: list[str] = []
    for item in _split_top_level(body):
        wm = re.fullmatch(
            r"WATERMARK\s+FOR\s+(\w+)\s+AS\s+(\w+)\s*-\s*"
            r"INTERVAL\s+'([\d.]+)'\s+(\w+)S?",
            item,
            re.IGNORECASE | re.DOTALL,
        )
        if wm:
            if wm.group(1) != wm.group(2):
                raise ValueError("WATERMARK expression must reference its column")
            unit = _UNITS[wm.group(4).upper().rstrip("S")]
            watermark = (wm.group(1), f"{wm.group(3)} {unit}")
            continue
        pk = re.match(
            r"PRIMARY\s+KEY\s*\(([^)]*)\)", item, re.IGNORECASE
        )
        if pk:
            primary_key = [c.strip() for c in pk.group(1).split(",")]
            continue
        cm = re.match(r"(\w+)\s+(.+)", item, re.DOTALL)
        if not cm:
            raise ValueError(f"unsupported column definition: {item!r}")
        columns.append((cm.group(1), _flink_type(cm.group(2))))

    options: dict[str, str] = {}
    wm_with = re.search(r"WITH\s*\((.*)\)\s*$", rest, re.IGNORECASE | re.DOTALL)
    if wm_with:
        for om in re.finditer(r"'([^']+)'\s*=\s*'([^']*)'", wm_with.group(1)):
            options[om.group(1)] = om.group(2)
    return CreateTable(name, columns, watermark, primary_key, options)


def _batch_reader(spark: SparkSession, ct: CreateTable) -> DataFrame:
    fmt = ct.options.get("format", "parquet").lower()
    path = ct.options.get("path")
    if path is None:
        raise ValueError(f"table {ct.name}: WITH must provide 'path'")
    connector = ct.options.get("connector", "filesystem")
    if connector != "filesystem":
        raise ValueError(
            f"table {ct.name}: connector {connector!r} unavailable in this "
            "environment (filesystem only; ref SURVEY §7.3 external connectors)"
        )
    schema = ", ".join(f"{c} {t}" for c, t in ct.columns)
    if fmt == "parquet":
        df = spark.read.parquet(path)
        # project + cast to the declared shape (parquet is self-describing,
        # the DDL wins on types)
        if ct.columns:
            df = df.select(
                [F.col(c).cast(t).alias(c) for c, t in ct.columns]
            )
        return df
    if fmt == "csv":
        return spark.read.schema(schema).option(
            "header", ct.options.get("csv.header", "false")
        ).csv(path)
    if fmt == "json":
        return spark.read.schema(schema).json(path)
    raise ValueError(f"table {ct.name}: unsupported format {fmt!r}")


def execute_create_table(spark: SparkSession, query: str) -> CreateTable:
    """Parse + register: batch temp view under the table name; returns
    the spec so the caller can record watermark/pk for streaming reads."""
    ct = parse_create_table(query)
    _batch_reader(spark, ct).createOrReplaceTempView(ct.name)
    return ct


def stream_reader(spark: SparkSession, ct: CreateTable) -> DataFrame:
    """The streaming twin of the registered source: same path/format via
    ``readStream`` with the DDL schema, watermark applied per the
    ``WATERMARK FOR`` clause (ref: SqlWatermark.java → rowtime attribute
    with bounded out-of-orderness)."""
    fmt = ct.options.get("format", "parquet").lower()
    schema = ", ".join(f"{c} {t}" for c, t in ct.columns)
    reader = spark.readStream.schema(schema)
    if fmt == "parquet":
        df = reader.parquet(ct.options["path"])
    elif fmt == "csv":
        df = reader.option(
            "header", ct.options.get("csv.header", "false")
        ).csv(ct.options["path"])
    elif fmt == "json":
        df = reader.json(ct.options["path"])
    else:
        raise ValueError(f"unsupported streaming format {fmt!r}")
    if ct.watermark is not None:
        col, delay = ct.watermark
        # Spark watermarks require TIMESTAMP (with tz); the session tz is
        # pinned UTC so the cast from the DDL's NTZ rowtime is faithful
        if dict(df.dtypes).get(col) == "timestamp_ntz":
            df = df.withColumn(col, F.col(col).cast("timestamp"))
        df = df.withWatermark(col, delay)
    return df


# ---------------------------------------------------------------------------
# CREATE VIEW / CREATE FUNCTION (ref: flink-sql-parser/.../ddl/
# SqlCreateView.java, SqlCreateFunction.java; catalog surface
# flink-table-common/.../catalog/Catalog.java createFunction/createTable)
# ---------------------------------------------------------------------------

_CV_HEAD = re.compile(
    r"^\s*CREATE\s+(?:TEMPORARY\s+)?VIEW\s+(?:IF\s+NOT\s+EXISTS\s+)?"
    r"([\w.]+)\s*(\(([^)]*)\))?\s+AS\s+(.*)$",
    re.IGNORECASE | re.DOTALL,
)
_CF_HEAD = re.compile(
    r"^\s*CREATE\s+(?:TEMPORARY\s+(?:SYSTEM\s+)?)?FUNCTION\s+"
    r"(?:IF\s+NOT\s+EXISTS\s+)?([\w.]+)\s+AS\s+'([^']+)'"
    r"(?:\s+LANGUAGE\s+(\w+))?\s*$",
    re.IGNORECASE,
)


def contains_create_view(query: str) -> bool:
    return _CV_HEAD.match(query) is not None


def contains_create_function(query: str) -> bool:
    return _CF_HEAD.match(query) is not None


def execute_create_view(env, statement: str) -> str:
    """``CREATE [TEMPORARY] VIEW name [(col, ...)] AS <query>`` (ref:
    SqlCreateView.java).  The defining query runs through the full
    Flink-SQL rewriter (TUMBLE/LATERAL TABLE/MATCH_RECOGNIZE all legal
    in a view body) and registers a lazy temp view — nothing is
    materialized, so pushdown/pruning still reach the underlying scans
    when the view is queried."""
    m = _CV_HEAD.match(statement)
    if not m:
        raise ValueError("not a CREATE VIEW statement")
    name, cols, body = m.group(1), m.group(3), m.group(4).strip().rstrip(";")
    df = env.sql_query(body).df
    if cols:
        df = df.toDF(*[c.strip() for c in cols.split(",")])
    df.createOrReplaceTempView(name)
    return name


def execute_create_function(spark: SparkSession, statement: str) -> str:
    """``CREATE [TEMPORARY] FUNCTION name AS 'module.attr' [LANGUAGE
    PYTHON]`` (ref: SqlCreateFunction.java — the identifier plays the
    role of the reference's fully-qualified class name).

    The dotted path resolves to either a ready-made pyspark UDF object
    (``F.udf``/``pandas_udf`` result — keeps its declared return type;
    pandas UDFs stay Arrow-vectorized) or a plain callable (registered
    with Spark's default STRING return type — declare a typed UDF for
    anything else)."""
    m = _CF_HEAD.match(statement)
    if not m:
        raise ValueError("not a CREATE FUNCTION statement")
    name, path, lang = m.group(1), m.group(2), (m.group(3) or "PYTHON").upper()
    if lang != "PYTHON":
        raise ValueError(
            f"LANGUAGE {lang} unavailable here — Python UDFs only "
            "(JVM-side functions come from the built-in catalog)"
        )
    import importlib

    mod_name, _, attr = path.rpartition(".")
    if not mod_name:
        raise ValueError(
            f"function identifier {path!r} must be a dotted 'module.attr' path"
        )
    try:
        fn = getattr(importlib.import_module(mod_name), attr)
    except (ImportError, AttributeError) as ex:
        raise ValueError(f"cannot resolve function {path!r}: {ex}") from ex
    spark.udf.register(name, fn)
    return name
