"""Schema-evolution union: align by column NAME across snapshots whose
schemas drifted (columns added/dropped, numeric types widened) — the
read-side half of the reference's connector schema evolution story
(ref: flink-formats/flink-avro schema resolution — readers accept
writer schemas with added/removed fields and promoted types; Avro spec
type promotion int→long→float→double).

At 100 TB this is what lets one query span months of parquet snapshots
written under evolving schemas without rewriting history: each input
stays a plain columnar scan, missing columns materialize as NULL
literals (no data movement), and casts are map-side.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Avro-spec numeric promotion lattice, widest last.
_WIDENING = ["tinyint", "smallint", "int", "bigint", "float", "double"]


def _widen(a: str, b: str) -> str:
    if a == b:
        return a
    if a in _WIDENING and b in _WIDENING:
        return _WIDENING[max(_WIDENING.index(a), _WIDENING.index(b))]
    raise ValueError(f"incompatible types for safe_union: {a} vs {b}")


def safe_union(*dfs: DataFrame) -> DataFrame:
    """Union DataFrames by column name with schema evolution: the output
    schema is the NAME-union of all inputs, each column at the widest
    numeric type any input uses (Avro promotion rules); inputs missing a
    column contribute NULLs.  Column order follows first appearance.
    Non-numeric type conflicts raise (no silent stringification).
    """
    if not dfs:
        raise ValueError("safe_union needs at least one DataFrame")
    order: list[str] = []
    types: dict[str, str] = {}
    for df in dfs:
        for f in df.schema.fields:
            t = f.dataType.simpleString()
            if f.name not in types:
                order.append(f.name)
                types[f.name] = t
            else:
                types[f.name] = _widen(types[f.name], t)
    aligned = [
        df.select(
            *[
                (
                    F.col(c).cast(types[c])
                    if c in df.columns
                    else F.lit(None).cast(types[c])
                ).alias(c)
                for c in order
            ]
        )
        for df in dfs
    ]
    return reduce(DataFrame.unionByName, aligned)
