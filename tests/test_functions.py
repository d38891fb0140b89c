"""Unit tests for the Flink-named scalar builders (functions/scalar.py) —
the analog of the reference's function unit layer (ref:
flink-table/flink-table-planner-blink/src/test/.../functions/)."""

from __future__ import annotations

from pyspark.sql import functions as F

from my_flink_1_10_2_spark.functions import (
    FUNCTION_CATALOG,
    cardinality,
    element,
    from_base64,
    if_,
    is_alpha,
    is_decimal,
    is_digit,
    locate,
    rand_integer,
    split_index,
    str_to_map,
    temporal_overlaps,
    timestamp_add,
    timestamp_diff,
    to_base64,
    truncate,
)


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).first()["v"]


def test_split_index_is_zero_based(spark):
    assert _one(spark, split_index(F.lit("a,b,c"), ",", 1)) == "b"
    assert _one(spark, split_index(F.lit("a,b,c"), ",", 0)) == "a"


def test_str_to_map(spark):
    assert _one(spark, str_to_map(F.lit("k1=v1,k2=v2"))) == {"k1": "v1", "k2": "v2"}


def test_base64_roundtrip(spark):
    assert _one(spark, from_base64(to_base64(F.lit("hello")))) == "hello"


def test_char_class_predicates(spark):
    assert _one(spark, is_decimal(F.lit("-12.5e3"))) is True
    assert _one(spark, is_decimal(F.lit("12x"))) is False
    assert _one(spark, is_digit(F.lit("00123"))) is True
    assert _one(spark, is_digit(F.lit("1.5"))) is False
    assert _one(spark, is_alpha(F.lit("abcZ"))) is True
    assert _one(spark, is_alpha(F.lit("ab1"))) is False


def test_locate(spark):
    assert _one(spark, locate("b", F.lit("abcb"))) == 2
    assert _one(spark, locate("b", F.lit("abcb"), 3)) == 4


def test_truncate_toward_zero(spark):
    assert _one(spark, truncate(F.lit(1.999), 2)) == 1.99
    assert _one(spark, truncate(F.lit(-1.999), 2)) == -1.99
    assert _one(spark, truncate(F.lit(42.7))) == 42.0


def test_rand_integer_bounds(spark):
    vals = [
        r["v"]
        for r in spark.range(200).select(rand_integer(10, seed=7).alias("v")).collect()
    ]
    assert all(0 <= v < 10 for v in vals)
    assert len(set(vals)) > 3


def test_timestamp_add_diff(spark):
    ts = F.lit("2024-01-01 00:00:00").cast("timestamp")
    later = timestamp_add("HOUR", 25, ts)
    assert str(_one(spark, later)) == "2024-01-02 01:00:00"
    assert _one(spark, timestamp_diff("DAY", ts, later)) == 1


def test_temporal_overlaps(spark):
    t = lambda s: F.lit(s).cast("timestamp")  # noqa: E731
    assert (
        _one(
            spark,
            temporal_overlaps(
                t("2024-01-01 00:00:00"), t("2024-01-01 02:00:00"),
                t("2024-01-01 01:00:00"), t("2024-01-01 03:00:00"),
            ),
        )
        is True
    )
    assert (
        _one(
            spark,
            temporal_overlaps(
                t("2024-01-01 00:00:00"), t("2024-01-01 01:00:00"),
                t("2024-01-01 01:00:00"), t("2024-01-01 02:00:00"),
            ),
        )
        is False
    )


def test_collections(spark):
    assert _one(spark, cardinality(F.array(F.lit(1), F.lit(2)))) == 2
    assert _one(spark, element(F.array(F.lit(7)))) == 7
    assert _one(spark, element(F.array(F.lit(1), F.lit(2)))) is None
    assert _one(spark, if_(F.lit(1) < F.lit(2), F.lit("y"), F.lit("n"))) == "y"


def test_catalog_covers_reference_surface():
    # Spot-check the §2.9 inventory: every family present, no missing keys.
    for name in [
        "COALESCE", "SUBSTRING", "REGEXP_REPLACE", "SPLIT_INDEX", "PARSE_URL",
        "MD5", "SHA256", "TIMESTAMPADD", "DATE_FORMAT", "CARDINALITY",
        "GROUPING_ID", "RAND_INTEGER", "STR_TO_MAP", "TO_BASE64",
    ]:
        assert name in FUNCTION_CATALOG, name
    assert len(FUNCTION_CATALOG) >= 150


def test_catalog_pyspark_names_resolve():
    # Every plain-string catalog value that names a pyspark function must
    # actually exist (guards against typo'd mappings).
    import pyspark.sql.functions as SF

    for ref_name, impl in FUNCTION_CATALOG.items():
        if isinstance(impl, str) and not impl.startswith(("op:", "lit(")):
            base = impl.split("(")[0]
            assert hasattr(SF, base) or base in {
                "isNull", "isNotNull", "between", "like", "rlike", "isin",
                "when", "getField", "position", "extract", "replace", "cot",
                "left", "right", "nullif", "now", "localtimestamp",
            }, f"{ref_name} -> {impl} does not resolve"


def test_between_symmetric_and_is_unknown(spark):
    from my_flink_1_10_2_spark.functions.scalar import between_symmetric, is_unknown
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(5,), (15,)], "x int")
    got = [r[0] for r in df.select(between_symmetric("x", 10, 1)).collect()]
    assert got == [True, False]  # bounds given in reversed order
    df2 = spark.createDataFrame([(None,), (True,)], "b boolean")
    assert [r[0] for r in df2.select(is_unknown("b")).collect()] == [True, False]
