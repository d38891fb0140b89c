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
    "TIME": "int",  # TIME(p) → millis-of-day (SURVEY §1.2; TimeType.java)
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
    partition_keys: list[str] = field(default_factory=list)  # PARTITIONED BY


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
        cm = re.match(r"`?(\w+)`?\s+(.+)", item, re.DOTALL)
        if not cm:
            raise ValueError(f"unsupported column definition: {item!r}")
        columns.append((cm.group(1), _flink_type(cm.group(2))))

    # PARTITIONED BY (col, ...) between the column list and WITH
    # (ref: SqlCreateTable.java:293 unparse "PARTITIONED BY")
    partition_keys: list[str] = []
    pb = re.search(
        r"PARTITIONED\s+BY\s*\(([^)]*)\)", rest, re.IGNORECASE
    )
    if pb:
        partition_keys = [c.strip() for c in pb.group(1).split(",") if c.strip()]
        declared = {c for c, _ in columns}
        missing = [k for k in partition_keys if k not in declared]
        if missing:
            raise ValueError(
                f"PARTITIONED BY columns {missing} not in the column list "
                "(the reference requires partition keys to be declared columns)"
            )

    options: dict[str, str] = {}
    wm_with = re.search(r"WITH\s*\((.*)\)\s*$", rest, re.IGNORECASE | re.DOTALL)
    if wm_with:
        for om in re.finditer(r"'([^']+)'\s*=\s*'([^']*)'", wm_with.group(1)):
            options[om.group(1)] = om.group(2)
    # Flink-1.10 descriptor spellings (ref: the pre-FLIP-122 property
    # keys every 1.10 DDL used — 'connector.type'/'connector.path'/
    # 'format.type') normalize onto the canonical keys so 1.10 programs
    # run verbatim.
    for old, new in (
        ("connector.type", "connector"),
        ("connector.path", "path"),
        ("format.type", "format"),
    ):
        if old in options and new not in options:
            options[new] = options.pop(old)
    return CreateTable(name, columns, watermark, primary_key, options, partition_keys)


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
    # With PARTITIONED BY, partition columns live in hive-style `col=value`
    # directory names (ref: SqlCreateTable.java:293; the filesystem
    # connector's partition layout) — Spark's source discovers them at scan
    # time, so a filter on a partition key prunes whole directories from
    # the file listing (plan shows PartitionFilters, the 100 TB win).
    file_cols = [(c, t) for c, t in ct.columns if c not in ct.partition_keys]
    schema = ", ".join(f"{c} {t}" for c, t in file_cols)
    # Sink-first workflow: CREATE TABLE before any INSERT — the path does
    # not exist yet, so the table reads as empty with the declared schema
    # (the reference's filesystem connector behaves the same; the view is
    # re-registered after each INSERT, picking up the real files).
    import os as _os

    if not _os.path.exists(path):
        full = ", ".join(f"{c} {t}" for c, t in ct.columns)
        return spark.createDataFrame([], schema=full)
    if fmt == "parquet":
        df = spark.read.parquet(path)
        # project + cast to the declared shape (parquet is self-describing,
        # the DDL wins on types; discovered partition cols cast the same way)
        if ct.columns:
            df = df.select(
                [F.col(c).cast(t).alias(c) for c, t in ct.columns]
            )
        return df
    if fmt == "csv":
        df = spark.read.schema(schema).option(
            "header", ct.options.get("csv.header", "false")
        ).option(
            "delimiter", ct.options.get("csv.field-delimiter", ",")
        ).option(
            "mode", ct.options.get("csv.mode", "PERMISSIVE")
        ).csv(path)
    elif fmt == "json":
        df = spark.read.schema(schema).json(path)
    else:
        raise ValueError(f"table {ct.name}: unsupported format {fmt!r}")
    if ct.partition_keys:
        df = df.select([F.col(c).cast(t).alias(c) for c, t in ct.columns])
    return df


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


# ---------------------------------------------------------------------------
# Catalog statements: CREATE/DROP DATABASE, USE, SHOW ..., DROP TABLE/VIEW,
# ALTER TABLE RENAME, DESCRIBE (ref: flink-sql-parser/.../ddl/
# SqlCreateDatabase.java, SqlDropDatabase.java, SqlDropTable.java,
# SqlAlterTableRename.java; dql/SqlShowDatabases.java, SqlShowTables.java;
# executed against the catalog SPI Catalog.java)
# ---------------------------------------------------------------------------

_CATALOG_STMT = re.compile(
    r"^\s*(CREATE\s+DATABASE|DROP\s+DATABASE|USE|SHOW\s+DATABASES|"
    r"SHOW\s+TABLES|SHOW\s+VIEWS|SHOW\s+FUNCTIONS|SHOW\s+PARTITIONS|"
    r"DROP\s+TABLE|DROP\s+VIEW|ALTER\s+TABLE|DESCRIBE|DESC|ANALYZE\s+TABLE)\b",
    re.IGNORECASE,
)


def contains_catalog_statement(query: str) -> bool:
    return _CATALOG_STMT.match(query) is not None


def execute_catalog_statement(env, statement: str):
    """Route one catalog statement to the in-memory catalog
    (:class:`my_flink_1_10_2_spark.flink_catalog.GenericInMemoryCatalog`)
    and/or Spark's temp-view registry.  SHOW/DESCRIBE return a DataFrame
    (like the reference's ``TableResult``); mutations return an empty one.

    Everything here is driver-side metadata — listing databases over a
    100 TB warehouse is O(#names), no data is touched.
    """
    from pyspark.sql import Row

    spark = env.spark
    cat = env.catalog
    db = env.current_database
    s = statement.strip().rstrip(";")

    def empty():
        return spark.range(0)

    m = re.match(
        r"CREATE\s+DATABASE\s+(IF\s+NOT\s+EXISTS\s+)?([\w.]+)"
        r"(?:\s+COMMENT\s+'([^']*)')?\s*$",
        s,
        re.IGNORECASE,
    )
    if m:
        from my_flink_1_10_2_spark.flink_catalog import CatalogDatabase

        cat.create_database(
            m.group(2),
            CatalogDatabase(comment=m.group(3) or ""),
            ignore_if_exists=bool(m.group(1)),
        )
        return empty()

    m = re.match(
        r"DROP\s+DATABASE\s+(IF\s+EXISTS\s+)?([\w.]+)\s*(CASCADE|RESTRICT)?\s*$",
        s,
        re.IGNORECASE,
    )
    if m:
        cat.drop_database(
            m.group(2),
            ignore_if_not_exists=bool(m.group(1)),
            cascade=(m.group(3) or "").upper() == "CASCADE",
        )
        return empty()

    m = re.match(r"USE\s+([\w.]+)\s*$", s, re.IGNORECASE)
    if m:
        if not cat.database_exists(m.group(1)):
            raise ValueError(f"database {m.group(1)} does not exist")
        env.current_database = m.group(1)
        return empty()

    if re.match(r"SHOW\s+DATABASES\s*$", s, re.IGNORECASE):
        return spark.createDataFrame(
            [Row(database_name=d) for d in cat.list_databases()]
        )

    if re.match(r"SHOW\s+TABLES\s*$", s, re.IGNORECASE):
        return spark.createDataFrame(
            [Row(table_name=t) for t in cat.list_tables(db)] or [],
            schema="table_name string",
        )

    if re.match(r"SHOW\s+VIEWS\s*$", s, re.IGNORECASE):
        return spark.createDataFrame(
            [Row(view_name=v) for v in cat.list_views(db)] or [],
            schema="view_name string",
        )

    if re.match(r"SHOW\s+FUNCTIONS\s*$", s, re.IGNORECASE):
        return spark.createDataFrame(
            [Row(function_name=f) for f in cat.list_functions(db)] or [],
            schema="function_name string",
        )

    m = re.match(r"SHOW\s+PARTITIONS\s+([\w.]+)\s*$", s, re.IGNORECASE)
    if m:
        d, t = _split_object_path(m.group(1), db)
        parts = cat.list_partitions(d, t)
        return spark.createDataFrame(
            [Row(partition=p.path_suffix()) for p in parts] or [],
            schema="partition string",
        )

    m = re.match(r"DROP\s+TABLE\s+(IF\s+EXISTS\s+)?([\w.]+)\s*$", s, re.IGNORECASE)
    if m:
        d, t = _split_object_path(m.group(2), db)
        cat.drop_table(d, t, ignore_if_not_exists=bool(m.group(1)))
        env._ddl_tables.pop(t, None)
        spark.catalog.dropTempView(t)
        return empty()

    m = re.match(r"DROP\s+VIEW\s+(IF\s+EXISTS\s+)?([\w.]+)\s*$", s, re.IGNORECASE)
    if m:
        d, t = _split_object_path(m.group(2), db)
        if cat.table_exists(d, t):
            cat.drop_table(d, t)
        dropped = spark.catalog.dropTempView(t)
        if not dropped and not m.group(1):
            raise ValueError(f"view {t} does not exist")
        return empty()

    m = re.match(
        r"ALTER\s+TABLE\s+([\w.]+)\s+RENAME\s+TO\s+([\w.]+)\s*$", s, re.IGNORECASE
    )
    if m:
        d, t = _split_object_path(m.group(1), db)
        _, new = _split_object_path(m.group(2), db)
        cat.rename_table(d, t, new)
        if spark.catalog.tableExists(t):
            spark.table(t).createOrReplaceTempView(new)
            spark.catalog.dropTempView(t)
        if t in env._ddl_tables:
            env._ddl_tables[new] = env._ddl_tables.pop(t)
        return empty()

    m = re.match(
        r"ANALYZE\s+TABLE\s+([\w.]+)\s+COMPUTE\s+STATISTICS\s*$", s, re.IGNORECASE
    )
    if m:
        # ref: Catalog.java alterTableStatistics + catalog/stats/
        # CatalogTableStatistics.java — row count feeds the planner's CBO
        # (the same role the reference's statistics play in join reordering).
        # One distributed count job; only the scalar reaches the driver.
        d, t = _split_object_path(m.group(1), db)
        df = (
            cat.get_table(d, t).reader()
            if cat.table_exists(d, t)
            else spark.table(t)
        )
        n = df.count()
        if cat.table_exists(d, t):
            cat.alter_table_statistics(d, t, {"rowCount": n})
        return spark.createDataFrame([Row(rowCount=n)], schema="rowCount bigint")

    m = re.match(r"(?:DESCRIBE|DESC)\s+([\w.]+)\s*$", s, re.IGNORECASE)
    if m:
        d, t = _split_object_path(m.group(1), db)
        if cat.table_exists(d, t):
            df = cat.get_table(d, t).reader()
        else:
            df = spark.table(t)
        return spark.createDataFrame(
            [Row(name=f.name, type=f.dataType.simpleString()) for f in df.schema],
            schema="name string, type string",
        )

    raise ValueError(f"unsupported catalog statement: {statement!r}")


def _split_object_path(name: str, current_db: str) -> tuple[str, str]:
    """``[db.]table`` → (db, table) (ref: ObjectPath.java:1)."""
    if "." in name:
        d, _, t = name.rpartition(".")
        return d, t
    return current_db, name


# ---------------------------------------------------------------------------
# INSERT INTO / INSERT OVERWRITE (ref: flink-sql-parser/.../dml — Flink
# 1.10's sqlUpdate("INSERT ...") path, planned by
# StreamExecSink/BatchExecSink; column matching is positional)
# ---------------------------------------------------------------------------

_INS_HEAD = re.compile(
    r"^\s*INSERT\s+(INTO|OVERWRITE)\s+(?:TABLE\s+)?([\w.]+)\s*"
    r"(?:\(([^)]*)\))?\s*(SELECT\b.*|VALUES\b.*)$",
    re.IGNORECASE | re.DOTALL,
)


def contains_insert(query: str) -> bool:
    return _INS_HEAD.match(query) is not None


def execute_insert(env, statement: str) -> DataFrame:
    """Run an INSERT statement against a DDL-registered filesystem table
    or a Spark catalog table.

    - the SELECT part goes through the full Flink-SQL rewriter (group
      windows, LATERAL TABLE, MATCH_RECOGNIZE all legal in the source
      query);
    - columns match positionally and are cast to the target's declared
      types (the reference's SinkCodeGenerator inserts the same implicit
      casts);
    - INTO appends, OVERWRITE replaces (ref: SqlInsert overwrite flag) —
      for partitioned filesystem tables OVERWRITE is dynamic per
      partition (spark.sql.sources.partitionOverwriteMode=dynamic), the
      100 TB-safe semantics: only partitions present in the new data are
      rewritten, never the whole table;
    - temp views and other unwritable relations get a clear error.

    Returns a 1-row DataFrame with the written row count (the analog of
    the reference's JobExecutionResult).
    """
    m = _INS_HEAD.match(statement)
    if not m:
        raise ValueError(f"not an INSERT statement: {statement!r}")
    mode_kw, target, col_list, query = m.groups()
    overwrite = mode_kw.upper() == "OVERWRITE"
    if query.upper().startswith("VALUES"):
        query = f"SELECT * FROM ({query})"
    df = env.sql_query(query).df

    _, tname = _split_object_path(target, env.current_database)
    ct = env._ddl_tables.get(tname)
    if ct is None:
        # not DDL-registered: a real Spark catalog table still works
        # (temp views pass tableExists but are read-only relations)
        try:
            is_view = env.spark.catalog.getTable(target).tableType == "TEMPORARY"
        except Exception:
            is_view = False
        if not is_view and env.spark.catalog.tableExists(target):
            # persist so the source query runs ONCE (the count reads the
            # materialized cache the write produced, not a re-execution
            # — matters for expensive or non-deterministic sources)
            df = df.persist()
            try:
                df.write.insertInto(target, overwrite=overwrite)
                n = df.count()
            finally:
                df.unpersist()
            return env.spark.createDataFrame([(n,)], schema="rows_written bigint")
        raise ValueError(
            f"INSERT target {target!r} is not a DDL-registered table or a "
            "catalog table (temp views are read-only relations)"
        )

    types = dict(ct.columns)
    if col_list:
        # The column list matches the SELECT output in the USER's order
        # (ref: SqlInsert column list semantics); unlisted columns are
        # null-filled so the table schema stays intact.
        names = [c.strip() for c in col_list.split(",") if c.strip()]
        unknown = set(names) - set(types)
        if unknown:
            raise ValueError(f"INSERT column list references unknown columns {unknown}")
        declared = [(n, types[n]) for n in names]
    else:
        declared = list(ct.columns)
    if len(df.columns) != len(declared):
        raise ValueError(
            f"INSERT has {len(df.columns)} columns, target expects {len(declared)}"
        )
    # rename positionally first — SELECT outputs can carry names like
    # `2.5` that column resolution would mis-parse as a nested path
    df = df.toDF(*[f"__src{i}" for i in range(len(df.columns))])
    provided = {
        name: F.col(f"__src{i}").cast(t) for i, (name, t) in enumerate(declared)
    }
    # emit in full table-column order, nulls for unlisted columns
    aligned = df.select(
        *[
            provided.get(name, F.lit(None).cast(t)).alias(name)
            for name, t in ct.columns
        ]
    )
    fmt = ct.options.get("format", "parquet").lower()
    path = ct.options.get("path")
    if not path:
        raise ValueError(f"DDL table {tname!r} has no 'path' option to write to")
    # persist: the source query executes once (write + count share the
    # materialization); avoids re-reading the whole table post-insert
    aligned = aligned.persist()
    writer = aligned.write.mode("overwrite" if overwrite else "append")
    if ct.partition_keys:
        writer = writer.option("partitionOverwriteMode", "dynamic").partitionBy(
            *ct.partition_keys
        )
    if fmt == "parquet":
        writer.parquet(path)
    elif fmt == "csv":
        writer.option("header", ct.options.get("csv.header", "false")).option(
            "delimiter", ct.options.get("csv.field-delimiter", ",")
        ).csv(path)
    elif fmt == "json":
        writer.json(path)
    else:
        raise ValueError(f"unsupported sink format {fmt!r}")
    n = aligned.count()
    aligned.unpersist()
    # the old temp view snapshotted the file listing — re-register so
    # subsequent queries see the new files
    _batch_reader(env.spark, ct).createOrReplaceTempView(ct.name)
    return env.spark.createDataFrame([(n,)], schema="rows_written bigint")
