"""Skew mitigation — salting for hot keys (SURVEY §4.2 partitioning).

The reference fights skew with two-phase local/global aggregation
(StreamExecLocalGroupAggregate/StreamExecGlobalGroupAggregate) and the
split-distinct rewrite (SplitAggregateRule.scala). Spark gives two of
those for free (partial/final HashAggregate, AQE skew-join splitting);
this module adds the remaining tool: explicit key salting for the cases
AQE can't fix —

  - a shuffled join where one key holds a disproportionate share of the
    *build* of downstream state (AQE splits map output, but a single
    reducer key still lands on one task);
  - high-cardinality-accumulator aggregations (collect_list/listagg)
    where one group's state exceeds executor memory.

``salted_join`` replicates the small side `salt` ways (size × salt — keep
the small side genuinely small) and scatters the skewed side uniformly,
so a hot key spreads over `salt` reducers. ``salted_agg`` runs any
*algebraic* aggregate in two stages (salt-local partial → final merge).
Results are bit-identical to the unsalted plans; only the partitioning
changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on: list[str],
    how: str = "inner",
    salt: int = 8,
) -> DataFrame:
    """Equi-join with the skewed side salted and the small side
    replicated `salt`× (ref analog: the reference's DataSet JoinHint +
    custom partitioners; at 100 TB this is the manual fallback when a
    hot key defeats hash partitioning).

    `how` covers inner/left joins keyed on the skewed side ('right'/
    'full' would need the salt on both sides and is not supported —
    use AQE skew handling there)."""
    if how not in ("inner", "left", "left_outer"):
        raise ValueError("salted_join supports inner/left joins only")
    # Content-derived scatter: hash of the full row is stable under stage
    # retries and upstream shuffle reorderings (monotonically_increasing_id
    # and rand() are NOT — both depend on partition id / position and can
    # double-count or drop rows on partial recomputation). Duplicate rows
    # share a salt, which costs a little uniformity but never correctness.
    scatter = F.pmod(F.abs(F.hash(*skewed.columns)), F.lit(salt)).cast("int")
    left = skewed.withColumn(_SALT, scatter)
    right = small.withColumn(
        _SALT, F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    return left.join(right, on + [_SALT], how).drop(_SALT)


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    salt: int = 16,
) -> DataFrame:
    """Two-stage aggregation with an explicit salt stage:
    ``aggs`` maps output column → (function, input column) for the
    algebraic functions sum/count/min/max/avg (avg decomposes into
    sum+count; the final stage merges partials).

    Shape: groupBy(keys, salt) partial-agg (hot key split across `salt`
    reducers) → groupBy(keys) merge. This is exactly the reference's
    Local/GlobalGroupAggregate pair made explicit (ref:
    StreamExecLocalGroupAggregate.scala, MiniBatchGlobalGroupAggFunction
    .java:44)."""
    supported = {"sum", "count", "min", "max", "avg"}
    for out, (fn, _col) in aggs.items():
        if fn not in supported:
            raise ValueError(f"{out}: {fn} is not algebraic-decomposable here")

    # content-derived scatter, stable under retries (see salted_join)
    scatter = F.pmod(F.abs(F.hash(*df.columns)), F.lit(salt))
    salted = df.withColumn(_SALT, scatter)

    partials, finals = [], []
    for out, (fn, col) in aggs.items():
        if fn == "count":
            # ("count", "*") is COUNT(*) — rows, not non-NULL values of
            # a column; use it whenever the SQL counterpart is COUNT(*).
            cnt = F.lit(1) if col == "*" else F.col(col)
            partials.append(F.count(cnt).alias(f"{out}__p"))
            finals.append(F.sum(f"{out}__p").alias(out))
        elif fn == "avg":
            partials.append(F.sum(col).alias(f"{out}__s"))
            partials.append(F.count(col).alias(f"{out}__c"))
            finals.append((F.sum(f"{out}__s") / F.sum(f"{out}__c")).alias(out))
        else:
            partials.append(getattr(F, fn)(col).alias(f"{out}__p"))
            finals.append(getattr(F, fn)(f"{out}__p").alias(out))

    partial = salted.groupBy(*keys, _SALT).agg(*partials)
    return partial.groupBy(*keys).agg(*finals)
