"""Registry output-shape contract: the driver's canonicalizer hashes
result frames with pandas (sort_values over every column), which cannot
sort array/map/struct cells — round 7's only red row
(`q_embedding_normalize`) was an ARRAY<DOUBLE> output column crashing
that canon with ``TypeError: unhashable type: 'numpy.ndarray'``.

The canon is a fixed contract, so gate it registry-wide on BOTH sides:

- every Spark query's top-level output schema must be atomic-only
  (built lazily at sf0.001 — schema needs analysis, not execution);
- every DuckDB oracle's described output types must be scalar too
  (DESCRIBE plans without scanning, so this is cheap for all ~445).

``tools/exact_sweep.py::canon`` mirrors the same rejection so the
builder's sweep predicts the driver's verdict.
"""

from __future__ import annotations

from pyspark.sql import types as T

from my_flink_1_10_2_spark.queries import all_queries
from tests.conftest import SF_DIR

_NESTED = (T.ArrayType, T.MapType, T.StructType)


def _nested_cols(schema: T.StructType) -> list[str]:
    return [f.name for f in schema.fields if isinstance(f.dataType, _NESTED)]


def test_duckdb_oracle_output_types_scalar_only(duck):
    bad = []
    for name, q in all_queries().items():
        if not q.oracle:
            continue
        try:
            desc = duck.execute(f"DESCRIBE {q.oracle}").fetchall()
        except Exception as exc:  # noqa: BLE001 — collect, report once
            bad.append((name, f"DESCRIBE failed: {str(exc)[:120]}"))
            continue
        for col, typ, *_ in desc:
            u = typ.upper()
            if "[]" in u or u.startswith(("STRUCT", "MAP", "LIST", "UNION")):
                bad.append((name, f"{col}: {typ}"))
    assert not bad, f"oracles with non-scalar output columns: {bad}"


def test_spark_output_schema_scalar_only(spark):
    bad, errors = [], []
    for name, q in all_queries().items():
        try:
            df = q.spark_fn(spark, SF_DIR)
        except Exception as exc:  # noqa: BLE001
            errors.append((name, f"{type(exc).__name__}: {str(exc)[:120]}"))
            continue
        nested = _nested_cols(df.schema)
        if nested:
            bad.append((name, nested))
    assert not errors, f"queries failed to build at sf0.001: {errors}"
    assert not bad, (
        "queries with array/map/struct top-level output columns "
        f"(driver canon cannot hash them): {bad}"
    )


def test_gate_catches_array_output_mutation(spark):
    """Mutation check: an array-typed output column must be flagged."""
    from pyspark.sql import functions as F

    df = spark.range(3).select(F.array(F.col("id"), F.col("id") + 1).alias("a"))
    assert _nested_cols(df.schema) == ["a"]
    df2 = spark.range(3).select(F.col("id").cast("double").alias("x"))
    assert _nested_cols(df2.schema) == []
