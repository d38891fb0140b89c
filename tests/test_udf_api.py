"""udf decorator + ScalarFunction + DataTypes (ref: pyflink udf.py:197,
:75; types.py:2218)."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from my_flink_1_10_2_spark.functions.udf_api import ScalarFunction, udf
from my_flink_1_10_2_spark.table import Table
from my_flink_1_10_2_spark.types import DataTypes


def test_pandas_udf_in_table_select(spark):
    @udf(result_type=DataTypes.BIGINT())
    def plus_one(s):
        return s + 1

    t = Table(spark.range(5).toDF("i"))
    got = sorted(r[0] for r in t.select(plus_one("i")).collect())
    assert got == [1, 2, 3, 4, 5]


def test_general_udf_per_row(spark):
    @udf(result_type=DataTypes.STRING(), udf_type="general")
    def label(i):
        return f"row-{i}"

    t = Table(spark.range(3).toDF("i"))
    assert sorted(r[0] for r in t.select(label("i")).collect()) == [
        "row-0", "row-1", "row-2",
    ]


def test_scalar_function_class(spark):
    class Scale(ScalarFunction):
        def __init__(self, factor):
            self.factor = factor

        def eval(self, s):
            return s * self.factor

    scale3 = udf(Scale(3), result_type=DataTypes.BIGINT())
    t = Table(spark.range(4).toDF("i"))
    assert sorted(r[0] for r in t.select(scale3("i")).collect()) == [0, 3, 6, 9]


def test_nondeterministic_flag_and_bad_type(spark):
    rnd = udf(lambda s: s * 0, result_type=DataTypes.BIGINT(), deterministic=False)
    assert spark.range(1).select(rnd("id")).collect()[0][0] == 0
    with pytest.raises(ValueError, match="udf_type"):
        udf(lambda s: s, result_type="string", udf_type="sidecar")


def test_datatypes_construct_spark_types():
    row = DataTypes.ROW(
        [
            DataTypes.FIELD("id", DataTypes.BIGINT()),
            DataTypes.FIELD("tags", DataTypes.ARRAY(DataTypes.STRING())),
            DataTypes.FIELD("attrs", DataTypes.MAP(DataTypes.STRING(), DataTypes.INT())),
            DataTypes.FIELD("ts", DataTypes.TIMESTAMP(3)),
            DataTypes.FIELD("ltz", DataTypes.TIMESTAMP_LTZ(3)),
            DataTypes.FIELD("amount", DataTypes.DECIMAL(12, 2)),
        ]
    )
    assert isinstance(row, T.StructType)
    assert row["id"].dataType == T.LongType()
    assert row["tags"].dataType == T.ArrayType(T.StringType())
    assert row["ts"].dataType == T.TimestampNTZType()
    assert row["ltz"].dataType == T.TimestampType()
    assert row["amount"].dataType == T.DecimalType(12, 2)


def test_table_get_schema(spark):
    t = Table(spark.range(2).selectExpr("id", "CAST(id AS STRING) AS s"))
    schema = t.get_schema()
    assert [f.name for f in schema.fields] == ["id", "s"]
    assert schema["s"].dataType == T.StringType()


def test_table_alias_and_outer_lateral(spark):
    t = Table(
        spark.createDataFrame(
            [(1, ["a", "b"]), (2, [])], "id long, tags array<string>"
        )
    )
    renamed = t.alias("k, arr")
    assert renamed.df.columns == ["k", "arr"]

    inner = t.join_lateral("explode(tags) AS tag")
    assert inner.count() == 2  # row with the empty array is dropped

    outer = t.left_outer_join_lateral("explode(tags) AS tag")
    rows = sorted((r.id, r.tag) for r in outer.df.collect())
    assert rows == [(1, "a"), (1, "b"), (2, None)]

    import pytest

    with pytest.raises(ValueError, match="outer lateral"):
        t.join_lateral("my_udtf(tags) AS x", outer=True)
