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
    def TIME(precision: int = 0, nullable: bool = True):
        """TIME(p) → INT milliseconds-of-day (SURVEY §1.2; ref:
        flink-table-common/.../types/logical/TimeType.java — the
        reference's own internal representation is also millis-of-day
        int).  Spark has no TIME type; the int-millis mapping keeps the
        column orderable/aggregatable, with
        :func:`millis_to_time_string` / :func:`time_string_to_millis`
        for the literal round trip."""
        return T.IntegerType()

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


def millis_to_time_string(col, precision: int = 3):
    """INT millis-of-day → 'HH:MM:SS[.fff]' (the TIME(p) literal form,
    ref: TimeType.java asSummaryString).  Pure native expressions."""
    from pyspark.sql import functions as F

    c = F.col(col) if isinstance(col, str) else col
    h = F.floor(c / 3600000)
    m = F.floor(c / 60000) % 60
    s = F.floor(c / 1000) % 60
    if precision <= 0:
        return F.format_string("%02d:%02d:%02d", h, m, s)
    ms = c % 1000
    return F.format_string("%02d:%02d:%02d.%03d", h, m, s, ms)


def time_string_to_millis(col):
    """'HH:MM:SS[.fff]' → INT millis-of-day (inverse literal mapping)."""
    from pyspark.sql import functions as F

    c = F.col(col) if isinstance(col, str) else col
    parts = F.split(c, ":")
    sec_frac = F.split(parts[2], r"\.")
    ms = F.when(F.size(sec_frac) > 1, F.rpad(sec_frac[1], 3, "0").cast("int")).otherwise(0)
    return (
        parts[0].cast("int") * 3600000
        + parts[1].cast("int") * 60000
        + sec_frac[0].cast("int") * 1000
        + ms
    ).cast("int")
