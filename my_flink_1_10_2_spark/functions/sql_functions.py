"""Flink-only function names, callable from SQL.

The Table-API builders in `functions/scalar.py` cover the reference's
scalar catalog for DataFrame code, but a user porting *SQL text* (ref:
FlinkSqlOperatorTable.java — SPLIT_INDEX, IS_DECIMAL, HASH_CODE, ...)
needs the names to resolve inside `TableEnvironment.sql_query`.  Spark 4
SQL scalar functions (`CREATE FUNCTION ... RETURNS ... RETURN <expr>`)
make that possible *without* Python UDFs: each body is inlined by
Catalyst into native expressions — whole-stage codegen, pushdown and
constant folding all still apply, so the hot path stays JVM-side at any
scale.

Names already native in Spark SQL (STR_TO_MAP, PARSE_URL, TIMESTAMPADD,
TIMESTAMPDIFF, REGEXP, CARDINALITY, E, PI, CHR, LISTAGG, ...) are left
untouched.  Aggregates that SQL UDFs cannot express (SUM0, COLLECT) stay
Table-API-only — documented in FUNCTION_CATALOG.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

# name -> (typed parameter list, return type, body). Bodies use only
# native Spark SQL so every registration inlines to JVM expressions.
_SQL_FUNCTIONS: dict[str, tuple[str, str, str]] = {
    # ref FlinkSqlOperatorTable SPLIT_INDEX (0-based; NULL out of range)
    "SPLIT_INDEX": (
        "s STRING, d STRING, i INT",
        "STRING",
        # negative index -> NULL (the reference's contract), and never a
        # Spark negative-index lookup
        "CASE WHEN i < 0 THEN NULL ELSE try_element_at(split(s, d), i + 1) END",
    ),
    # ref :276-292 — character-class predicates
    "IS_DECIMAL": (
        "s STRING",
        "BOOLEAN",
        r"s RLIKE '^[+-]?([0-9]+(\\.[0-9]*)?|\\.[0-9]+)([eE][+-]?[0-9]+)?$'",
    ),
    "IS_DIGIT": ("s STRING", "BOOLEAN", "s RLIKE '^[0-9]+$'"),
    "IS_ALPHA": ("s STRING", "BOOLEAN", "s RLIKE '^[A-Za-z]+$'"),
    # ref :393 — deterministic 32-bit hash (murmur3 stands in for
    # String.hashCode; same documented deviation as scalar.hash_code)
    "HASH_CODE": ("s STRING", "INT", "hash(s)"),
    # ref :957
    "RAND_INTEGER": ("bound INT", "INT", "CAST(floor(rand() * bound) AS INT)"),
    # ref :230-240 — Spark spells these base64/unbase64
    "TO_BASE64": ("s STRING", "STRING", "base64(CAST(s AS BINARY))"),
    "FROM_BASE64": ("s STRING", "STRING", "CAST(unbase64(s) AS STRING)"),
    # ref :964 — numeric truncate toward zero, d decimal places
    "TRUNCATE": (
        "x DOUBLE, d INT",
        "DOUBLE",
        "CASE WHEN x >= 0 THEN floor(x * power(10, d)) / power(10, d) "
        "ELSE ceil(x * power(10, d)) / power(10, d) END",
    ),
    # ref :901 — sole element of a 1-element array, else NULL (Flink
    # errors on >1; NULL is the documented deviation, as in scalar.py)
    "ELEMENT": ("a ARRAY<STRING>", "STRING", "CASE WHEN size(a) = 1 THEN a[0] END"),
    # ref :113 — processing-time attribute
    "PROCTIME": ("", "TIMESTAMP", "current_timestamp()"),
    # ref :742-778 — single-arg SHA forms (Spark only has sha2(s, n))
    "SHA224": ("s STRING", "STRING", "sha2(s, 224)"),
    "SHA256": ("s STRING", "STRING", "sha2(s, 256)"),
    "SHA384": ("s STRING", "STRING", "sha2(s, 384)"),
    "SHA512": ("s STRING", "STRING", "sha2(s, 512)"),
}

def register_flink_sql_functions(spark: SparkSession, force: bool = False) -> None:
    """Register every Flink-only SQL function name on `spark` as a
    temporary SQL scalar function (idempotent per session).  The marker
    lives ON the session object, so a recycled id() of a dead session
    can never skip registration for a fresh one."""
    if getattr(spark, "_graft_flink_sql_functions", False) and not force:
        return
    for name, (params, ret, body) in _SQL_FUNCTIONS.items():
        spark.sql(
            f"CREATE OR REPLACE TEMPORARY FUNCTION {name}({params}) "
            f"RETURNS {ret} RETURN {body}"
        )
    spark._graft_flink_sql_functions = True
