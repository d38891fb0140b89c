"""DataTypes — the reference's type-factory surface (ref:
flink-python/pyflink/table/types.py:2218 DataTypes) mapped onto
pyspark.sql.types.  Programs written against `DataTypes.BIGINT()` /
`DataTypes.ROW([DataTypes.FIELD(...)])` construct the exact Spark types
the engine's DataFrames carry (SURVEY §1.2 type-system mapping:
TIMESTAMP(p) is local-time → TimestampNTZType, TIMESTAMP_LTZ →
TimestampType, UTC-pinned session).
"""

from __future__ import annotations

from pyspark.sql import types as T


class DataTypes:
    """ref: types.py:2218.  Nullability is carried by the enclosing
    field (Spark attaches it at StructField level); the `nullable`
    parameter is accepted for API compatibility."""

    @staticmethod
    def STRING(nullable: bool = True):
        return T.StringType()

    @staticmethod
    def BOOLEAN(nullable: bool = True):
        return T.BooleanType()

    @staticmethod
    def BYTES(nullable: bool = True):
        return T.BinaryType()

    @staticmethod
    def TINYINT(nullable: bool = True):
        return T.ByteType()

    @staticmethod
    def SMALLINT(nullable: bool = True):
        return T.ShortType()

    @staticmethod
    def INT(nullable: bool = True):
        return T.IntegerType()

    @staticmethod
    def BIGINT(nullable: bool = True):
        return T.LongType()

    @staticmethod
    def FLOAT(nullable: bool = True):
        return T.FloatType()

    @staticmethod
    def DOUBLE(nullable: bool = True):
        return T.DoubleType()

    @staticmethod
    def DECIMAL(precision: int = 10, scale: int = 0, nullable: bool = True):
        return T.DecimalType(precision, scale)

    @staticmethod
    def DATE(nullable: bool = True):
        return T.DateType()

    @staticmethod
    def TIMESTAMP(precision: int = 3, nullable: bool = True):
        # Flink TIMESTAMP(p) is wall-clock local time (SURVEY §1.2)
        return T.TimestampNTZType()

    @staticmethod
    def TIMESTAMP_LTZ(precision: int = 3, nullable: bool = True):
        return T.TimestampType()

    @staticmethod
    def ARRAY(element_type, nullable: bool = True):
        return T.ArrayType(element_type)

    @staticmethod
    def MAP(key_type, value_type, nullable: bool = True):
        return T.MapType(key_type, value_type)

    @staticmethod
    def FIELD(name: str, data_type, description: str | None = None):
        return T.StructField(name, data_type, metadata={"comment": description} if description else None)

    @staticmethod
    def ROW(row_fields=(), nullable: bool = True):
        return T.StructType(list(row_fields))
