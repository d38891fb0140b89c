"""Scalar function library (SURVEY §2.9) — the reference's 227-operator SQL
surface (ref: FlinkSqlOperatorTable.java, SqlFunctionUtils.java 1,108 LoC,
SqlDateTimeUtils.java 1,513 LoC) maps nearly 1:1 to
``pyspark.sql.functions``; these queries exercise each family and pin the
semantics against the DuckDB oracle.

All expressions are JVM-side built-ins — zero Python UDFs — so every
query stays inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from my_flink_1_10_2_spark.queries import read, register


@register(
    "q_string_functions",
    oracle="""
    SELECT c_custkey,
           upper(c_name)                       AS up_name,
           lower(c_mktsegment)                 AS low_seg,
           length(c_name)                      AS name_len,
           substring(c_name, 1, 8)             AS name_prefix,
           c_name || '#' || c_mktsegment       AS concat_basic,
           concat_ws('-', c_mktsegment, c_name) AS concat_sep,
           lpad(c_mktsegment, 12, '*')         AS seg_lpad,
           rpad(c_mktsegment, 12, '.')         AS seg_rpad,
           trim('  pad  ')                     AS trimmed,
           ltrim('  pad  ')                    AS ltrimmed,
           rtrim('  pad  ')                    AS rtrimmed,
           replace(c_name, 'Customer', 'Cust') AS replaced,
           reverse(c_mktsegment)               AS seg_rev,
           repeat(left(c_mktsegment, 2), 2)    AS rep2,
           instr(c_name, '0')                  AS pos_zero,
           split_part(c_name, '#', 2)          AS name_num,
           regexp_extract(c_name, '([0-9]+)', 1) AS digits,
           regexp_replace(c_mktsegment, '[AEIOU]', '_', 'g') AS devowel,
           ascii(c_mktsegment)                 AS first_ascii,
           chr(65 + c_nationkey % 26)          AS nation_chr,
           left(c_name, 4)                     AS left4,
           right(c_name, 3)                    AS right3,
           translate(c_mktsegment, 'AEI', 'aei') AS translated
    FROM customer WHERE c_custkey <= 60
    """,
    category="scalar",
)
def q_string_functions(spark, sf_dir):
    """String family (ref: BuiltInFunctionDefinitions.java:230-362,
    SqlFunctionUtils.java)."""
    customer = read(spark, sf_dir, "customer").filter("c_custkey <= 60")
    return customer.select(
        "c_custkey",
        F.upper("c_name").alias("up_name"),
        F.lower("c_mktsegment").alias("low_seg"),
        F.length("c_name").alias("name_len"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.concat(F.col("c_name"), F.lit("#"), F.col("c_mktsegment")).alias("concat_basic"),
        F.concat_ws("-", "c_mktsegment", "c_name").alias("concat_sep"),
        F.lpad("c_mktsegment", 12, "*").alias("seg_lpad"),
        F.rpad("c_mktsegment", 12, ".").alias("seg_rpad"),
        F.trim(F.lit("  pad  ")).alias("trimmed"),
        F.ltrim(F.lit("  pad  ")).alias("ltrimmed"),
        F.rtrim(F.lit("  pad  ")).alias("rtrimmed"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Cust")).alias("replaced"),
        F.reverse(F.col("c_mktsegment")).alias("seg_rev"),
        F.repeat(F.substring("c_mktsegment", 1, 2), 2).alias("rep2"),
        F.instr(F.col("c_name"), "0").alias("pos_zero"),
        F.split_part(F.col("c_name"), F.lit("#"), F.lit(2)).alias("name_num"),
        F.regexp_extract(F.col("c_name"), "([0-9]+)", 1).alias("digits"),
        F.regexp_replace(F.col("c_mktsegment"), "[AEIOU]", "_").alias("devowel"),
        F.ascii(F.col("c_mktsegment")).alias("first_ascii"),
        F.chr(F.lit(65) + F.col("c_nationkey") % 26).alias("nation_chr"),
        F.substring("c_name", 1, 4).alias("left4"),
        F.expr("right(c_name, 3)").alias("right3"),
        F.translate(F.col("c_mktsegment"), "AEI", "aei").alias("translated"),
    )


@register(
    "q_math_functions",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           abs(l_discount - 0.05)        AS abs_v,
           CAST(ceil(l_quantity / 7) AS BIGINT)  AS ceil_v,
           CAST(floor(l_quantity / 7) AS BIGINT) AS floor_v,
           round(l_extendedprice, 1)     AS round_v,
           round(exp(l_discount), 9)     AS exp_v,
           round(ln(l_extendedprice), 9) AS ln_v,
           round(log10(l_extendedprice), 9) AS log10_v,
           round(log2(l_quantity + 1), 9)   AS log2_v,
           round(power(l_quantity, 2), 9)   AS pow_v,
           round(sqrt(l_extendedprice), 9)  AS sqrt_v,
           mod(CAST(l_quantity AS BIGINT), 5) AS mod_v,
           CAST(sign(l_discount - 0.05) AS BIGINT) AS sign_v,
           round(sin(l_discount), 9)     AS sin_v,
           round(cos(l_discount), 9)     AS cos_v,
           round(tan(l_discount), 9)     AS tan_v,
           round(atan2(l_discount, l_tax + 0.01), 9) AS atan2_v,
           round(degrees(l_discount), 9) AS deg_v,
           round(radians(l_quantity), 9) AS rad_v,
           pi()                          AS pi_v,
           greatest(l_quantity, l_extendedprice / 1000) AS greatest_v,
           least(l_quantity, l_extendedprice / 1000)    AS least_v
    FROM lineitem WHERE l_orderkey <= 300
    """,
    category="scalar",
)
def q_math_functions(spark, sf_dir):
    """Math family (ref: BuiltInFunctionDefinitions.java:370-596).

    Transcendental outputs are rounded to 9 decimals on BOTH sides: JVM
    libm and DuckDB libm differ in the last ULP on exp/ln/tan/... and the
    driver's correctness gate hashes values exactly.
    """
    li = read(spark, sf_dir, "lineitem").filter("l_orderkey <= 300")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_discount") - 0.05).alias("abs_v"),
        F.ceil(F.col("l_quantity") / 7).alias("ceil_v"),
        F.floor(F.col("l_quantity") / 7).alias("floor_v"),
        F.round(F.col("l_extendedprice"), 1).alias("round_v"),
        F.round(F.exp("l_discount"), 9).alias("exp_v"),
        F.round(F.log(F.col("l_extendedprice")), 9).alias("ln_v"),
        F.round(F.log10("l_extendedprice"), 9).alias("log10_v"),
        F.round(F.log2(F.col("l_quantity") + 1), 9).alias("log2_v"),
        F.round(F.pow(F.col("l_quantity"), 2), 9).alias("pow_v"),
        F.round(F.sqrt("l_extendedprice"), 9).alias("sqrt_v"),
        (F.col("l_quantity").cast("bigint") % 5).alias("mod_v"),
        F.signum(F.col("l_discount") - 0.05).cast("bigint").alias("sign_v"),
        F.round(F.sin("l_discount"), 9).alias("sin_v"),
        F.round(F.cos("l_discount"), 9).alias("cos_v"),
        F.round(F.tan("l_discount"), 9).alias("tan_v"),
        F.round(F.atan2(F.col("l_discount"), F.col("l_tax") + 0.01), 9).alias("atan2_v"),
        F.round(F.degrees("l_discount"), 9).alias("deg_v"),
        F.round(F.radians("l_quantity"), 9).alias("rad_v"),
        F.lit(3.141592653589793).alias("pi_v"),
        F.greatest(F.col("l_quantity"), F.col("l_extendedprice") / 1000).alias("greatest_v"),
        F.least(F.col("l_quantity"), F.col("l_extendedprice") / 1000).alias("least_v"),
    )


@register(
    "q_datetime_functions",
    oracle="""
    SELECT o_orderkey,
           year(o_orderdate)                     AS y,
           month(o_orderdate)                    AS mo,
           day(o_orderdate)                      AS d,
           quarter(o_orderdate)                  AS q,
           dayofyear(o_orderdate)                AS doy,
           dayofweek(o_orderdate) + 1            AS dow,
           date_trunc('month', o_orderdate)      AS month_start,
           strftime(o_orderdate, '%Y-%m-%d')     AS fmt,
           CAST(epoch(o_orderdate) AS BIGINT)    AS epoch_s,
           o_orderdate + INTERVAL 3 DAY          AS plus3d,
           o_orderdate - INTERVAL 2 HOUR         AS minus2h,
           date_diff('day', o_orderdate, TIMESTAMP '1998-01-01 00:00:00') AS days_to_98,
           CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS as_date
    FROM orders WHERE o_orderkey <= 500
    """,
    category="scalar",
)
def q_datetime_functions(spark, sf_dir):
    """Temporal family (ref: SqlDateTimeUtils.java, BuiltInFunctionDefinitions.java:600-654).

    DuckDB's dayofweek is 0-based (Sunday=0), Spark's is 1-based — the
    oracle adds 1.
    """
    orders = read(spark, sf_dir, "orders").filter("o_orderkey <= 500")
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").alias("y"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("d"),
        F.quarter("o_orderdate").alias("q"),
        F.dayofyear("o_orderdate").alias("doy"),
        F.dayofweek("o_orderdate").alias("dow"),
        F.date_trunc("month", F.col("o_orderdate")).cast("timestamp_ntz").alias("month_start"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("fmt"),
        F.unix_timestamp(F.col("o_orderdate").cast("timestamp")).alias("epoch_s"),
        (F.col("o_orderdate") + F.expr("INTERVAL 3 DAY")).alias("plus3d"),
        (F.col("o_orderdate") - F.expr("INTERVAL 2 HOUR")).alias("minus2h"),
        F.datediff(F.lit("1998-01-01").cast("date"), F.col("o_orderdate").cast("date")).alias(
            "days_to_98"
        ),
        # string-typed on both sides: DATE round-trips through pandas as
        # datetime64 in DuckDB but date objects in Spark
        F.col("o_orderdate").cast("date").cast("string").alias("as_date"),
    )


@register(
    "q_conditional_functions",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'debt'
                WHEN c_acctbal < 5000 THEN 'low'
                ELSE 'high' END                            AS bal_class,
           coalesce(nullif(c_mktsegment, 'BUILDING'), 'N/A') AS seg_or_na,
           CASE WHEN c_acctbal > 0 THEN c_acctbal ELSE 0 END AS pos_bal,
           (c_nationkey IS DISTINCT FROM 3)                AS not_nation3,
           if(c_acctbal > 5000, 'vip', 'std')              AS tier,
           (c_acctbal BETWEEN 1000 AND 2000)               AS in_band,
           (c_mktsegment IN ('BUILDING', 'MACHINERY'))     AS in_segs,
           (c_name LIKE '%001%')                           AS has_001
    FROM customer
    """,
    category="scalar",
)
def q_conditional_functions(spark, sf_dir):
    """CASE / NULLIF / COALESCE / IF / IS DISTINCT FROM / BETWEEN / IN / LIKE
    (ref: FlinkSqlOperatorTable.java:840-877,916-928)."""
    customer = read(spark, sf_dir, "customer")
    return customer.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, "debt")
        .when(F.col("c_acctbal") < 5000, "low")
        .otherwise("high")
        .alias("bal_class"),
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("N/A")).alias(
            "seg_or_na"
        ),
        F.when(F.col("c_acctbal") > 0, F.col("c_acctbal")).otherwise(F.lit(0.0)).alias("pos_bal"),
        F.expr("c_nationkey IS DISTINCT FROM 3").alias("not_nation3"),
        F.when(F.col("c_acctbal") > 5000, "vip").otherwise("std").alias("tier"),
        F.col("c_acctbal").between(1000, 2000).alias("in_band"),
        F.col("c_mktsegment").isin("BUILDING", "MACHINERY").alias("in_segs"),
        F.col("c_name").like("%001%").alias("has_001"),
    )


@register(
    "q_hash_functions",
    oracle="""
    SELECT doc_id,
           md5(text)                          AS md5_hex,
           sha256(text)                       AS sha256_hex,
           to_base64(CAST(source AS BLOB))    AS src_b64
    FROM documents WHERE doc_id <= 100
    """,
    category="scalar",
)
def q_hash_functions(spark, sf_dir):
    """Crypto/hash family (ref: BuiltInFunctionDefinitions.java:742-778):
    MD5, SHA2, BASE64."""
    docs = read(spark, sf_dir, "documents").filter("doc_id <= 100")
    return docs.select(
        "doc_id",
        F.md5(F.col("text")).alias("md5_hex"),
        F.sha2(F.col("text"), 256).alias("sha256_hex"),
        F.base64(F.col("source").cast("binary")).alias("src_b64"),
    )


@register(
    "q_json_functions",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k')            AS k_str,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_int
    FROM events WHERE event_id <= 200
    """,
    category="scalar",
)
def q_json_functions(spark, sf_dir):
    """JSON access on string payloads (ref: PARSE_URL/STR_TO_MAP family;
    events.props per FIXTURES.md) — `get_json_object` stays JVM-side."""
    events = read(spark, sf_dir, "events").filter("event_id <= 200")
    return events.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        F.get_json_object("props", "$.k").cast("bigint").alias("k_int"),
    )


@register(
    "q_collection_functions",
    oracle="""
    SELECT vec_id,
           len(embedding)                        AS dim,
           embedding[1]                          AS first_elem,
           embedding[64]                         AS last_elem,
           round(list_dot_product(list_transform(embedding, x -> CAST(x AS DOUBLE)),
                  list_transform(embedding, x -> CAST(x AS DOUBLE))), 6) AS self_dot
    FROM embeddings WHERE vec_id <= 100
    """,
    category="scalar",
)
def q_collection_functions(spark, sf_dir):
    """Collection family (ref: BuiltInFunctionDefinitions.java:662-706):
    CARDINALITY / ITEM / array math via higher-order functions."""
    emb = read(spark, sf_dir, "embeddings").filter("vec_id <= 100")
    return emb.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.element_at("embedding", 1).alias("first_elem"),
        F.element_at("embedding", 64).alias("last_elem"),
        F.round(
            F.aggregate(
                F.zip_with("embedding", "embedding", lambda a, b: a.cast("double") * b),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            6,
        ).alias("self_dot"),
    )


@register(
    "q_str_to_map",
    oracle="""
    SELECT event_id, event_type,
           map_extract(map(['type','uid'],
                           [event_type, CAST(user_id AS VARCHAR)]), 'uid')[1] AS uid_str
    FROM events WHERE event_id <= 100
    """,
    category="scalar",
)
def q_str_to_map(spark, sf_dir):
    """Map construction + element access (ref: STR_TO_MAP
    FlinkSqlOperatorTable.java:266, MAP constructor)."""
    events = read(spark, sf_dir, "events").filter("event_id <= 100")
    m = F.create_map(
        F.lit("type"), F.col("event_type"), F.lit("uid"), F.col("user_id").cast("string")
    )
    return events.select(
        "event_id", "event_type", F.element_at(m, "uid").alias("uid_str")
    )


@register(
    "q_sql_flink_functions",
    oracle="""
    SELECT doc_id,
           str_split(source, 'c')[2] AS src_tail,
           regexp_matches(CAST(n_chars AS VARCHAR), '^[0-9]+$') AS chars_digit,
           regexp_matches(lang, '^[A-Za-z]+$') AS lang_alpha,
           sha256(lang) AS lang_sha,
           to_base64(encode(source)) AS src_b64,
           CASE WHEN n_chars / 7.0 >= 0
                THEN floor(n_chars / 7.0 * 100) / 100
                ELSE ceil(n_chars / 7.0 * 100) / 100 END AS sevenths_trunc
    FROM documents
    ORDER BY doc_id
    """,
    category="scalar",
)
def q_sql_flink_functions(spark, sf_dir):
    """Flink-only function names used from SQL TEXT — SPLIT_INDEX,
    IS_DIGIT, IS_ALPHA, SHA256, TO_BASE64, TRUNCATE (ref:
    FlinkSqlOperatorTable.java; registered by
    functions/sql_functions.py as Spark SQL scalar functions, which
    Catalyst inlines to native JVM expressions — no Python UDFs)."""
    from my_flink_1_10_2_spark.session import TableEnvironment

    env = TableEnvironment(spark)
    read(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return env.sql_query(
        """
        SELECT doc_id,
               SPLIT_INDEX(source, 'c', 1) AS src_tail,
               IS_DIGIT(CAST(n_chars AS STRING)) AS chars_digit,
               IS_ALPHA(lang) AS lang_alpha,
               SHA256(lang) AS lang_sha,
               TO_BASE64(source) AS src_b64,
               TRUNCATE(n_chars / 7.0, 2) AS sevenths_trunc
        FROM documents
        ORDER BY doc_id
        """
    ).df


@register(
    "q_time_type_ops",
    oracle="""
    WITH t AS (
      SELECT event_type,
             ((hour(ts)*60 + minute(ts))*60 + second(ts))*1000
               + (CAST(date_part('microsecond', ts) AS BIGINT) % 1000000) // 1000
               AS tod
      FROM events)
    SELECT event_type,
           CAST(min(tod) AS BIGINT) AS min_t,
           CAST(max(tod) AS BIGINT) AS max_t,
           lpad(CAST(min(tod) // 3600000 AS VARCHAR), 2, '0') || ':'
             || lpad(CAST((min(tod) // 60000) % 60 AS VARCHAR), 2, '0') || ':'
             || lpad(CAST((min(tod) // 1000) % 60 AS VARCHAR), 2, '0') AS min_fmt,
           CAST(sum(CASE WHEN tod >= 43200000 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_afternoon,
           CAST(count(*) AS BIGINT) AS n_fmt_roundtrip
    FROM t GROUP BY event_type ORDER BY event_type
    """,
    category="scalar_functions",
)
def q_time_type_ops(spark, sf_dir):
    """TIME(p) type surface (SURVEY §1.2 gap closed by evidence):
    time-of-day carried as the reference's canonical millis-of-day
    integer encoding (TimeType.java / LocalTime millis), with CAST
    (timestamp→TIME via time_of_day, TIME→STRING via time_format,
    STRING→TIME via to_time), field extraction (HOUR/MINUTE/SECOND),
    TIME literals (time_lit '12:00:00'), all as exact JVM integer
    arithmetic.  n_fmt_roundtrip re-parses the formatted string with
    to_time and must equal count(*) — the oracle grades the Spark parse
    path against the identity it must satisfy."""
    from my_flink_1_10_2_spark.functions.time_type import (
        time_format,
        time_lit,
        time_of_day,
        to_time,
    )

    e = read(spark, sf_dir, "events")
    t = e.select("event_type", time_of_day("ts").alias("tod"))
    noon = time_lit("12:00:00")
    return (
        t.groupBy("event_type")
        .agg(
            F.min("tod").cast("bigint").alias("min_t"),
            F.max("tod").cast("bigint").alias("max_t"),
            F.sum((F.col("tod") >= noon).cast("int")).cast("bigint").alias("n_afternoon"),
            F.sum(
                (
                    to_time(time_format(F.col("tod")))
                    == F.col("tod") - F.col("tod") % 1000
                ).cast("int")
            ).cast("bigint").alias("n_fmt_roundtrip"),
        )
        .select(
            "event_type",
            "min_t",
            "max_t",
            time_format(F.col("min_t")).alias("min_fmt"),
            "n_afternoon",
            "n_fmt_roundtrip",
        )
        .orderBy("event_type")
    )
