"""Flink-only SQL function names resolve in sql_query as native Spark
SQL scalar functions (ref: FlinkSqlOperatorTable.java; registered by
functions/sql_functions.py). No Python UDFs — bodies inline to JVM
expressions, so plans stay codegen/pushdown-eligible.
"""

from __future__ import annotations

from my_flink_1_10_2_spark.functions.sql_functions import register_flink_sql_functions
from my_flink_1_10_2_spark.session import TableEnvironment


def test_flink_sql_functions_values(spark):
    env = TableEnvironment(spark)
    row = env.sql_query(
        """
        SELECT SPLIT_INDEX('a,b,c', ',', 0) AS first,
               SPLIT_INDEX('a,b,c', ',', 9) AS oob,
               IS_DECIMAL('-1.5e3') AS dec_sci,
               IS_DECIMAL('12abc') AS dec_bad,
               IS_DIGIT('0042') AS dig,
               IS_DIGIT('4.2') AS dig_bad,
               IS_ALPHA('Spark') AS al,
               IS_ALPHA('Spark1') AS al_bad,
               FROM_BASE64(TO_BASE64('roundtrip')) AS b64_rt,
               TRUNCATE(1.999, 2) AS tr_pos,
               TRUNCATE(-1.999, 2) AS tr_neg,
               ELEMENT(array('x')) AS el_one,
               ELEMENT(array('x', 'y')) AS el_two,
               SHA256('') AS sha_empty,
               RAND_INTEGER(5) AS ri
        """
    ).df.collect()[0]
    assert row.first == "a" and row.oob is None
    assert row.dec_sci and not row.dec_bad
    assert row.dig and not row.dig_bad
    assert row.al and not row.al_bad
    assert row.b64_rt == "roundtrip"
    assert row.tr_pos == 1.99 and row.tr_neg == -1.99
    assert row.el_one == "x" and row.el_two is None
    # SHA-256 of "" is the well-known constant
    assert row.sha_empty.startswith("e3b0c44298fc1c149afbf4c8996fb924")
    assert 0 <= row.ri < 5


def test_registration_is_idempotent(spark):
    register_flink_sql_functions(spark)
    register_flink_sql_functions(spark)  # cached, no re-registration
    register_flink_sql_functions(spark, force=True)  # explicit refresh ok
    assert spark.sql("SELECT HASH_CODE('x') AS h").collect()[0].h is not None


def test_sql_function_plan_is_native(spark):
    """The inlined body must not introduce a Python eval node."""
    register_flink_sql_functions(spark)
    df = spark.range(100).selectExpr("SPLIT_INDEX(CAST(id AS STRING), '5', 0) AS p")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_split_index_negative_returns_null(spark):
    """Regression: negative index -> NULL (the reference's contract),
    both in SQL and in the Table-API builder."""
    from pyspark.sql import functions as F

    from my_flink_1_10_2_spark.functions.scalar import split_index
    from my_flink_1_10_2_spark.session import TableEnvironment

    env = TableEnvironment(spark)
    r = env.sql_query(
        "SELECT SPLIT_INDEX('a,b', ',', -1) AS m1, SPLIT_INDEX('a,b', ',', -2) AS m2"
    ).df.collect()[0]
    assert r.m1 is None and r.m2 is None
    df = spark.createDataFrame([("a,b",)], "s string")
    assert df.select(split_index("s", ",", -2)).collect()[0][0] is None
    assert df.select(split_index("s", ",", 1)).collect()[0][0] == "b"
