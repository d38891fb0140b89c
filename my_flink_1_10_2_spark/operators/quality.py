"""Declarative data-quality verification — the Deequ shape (Schelter et
al., "Automating Large-Scale Data Quality Verification", VLDB 2018).

A ``Check`` collects declarative constraints (completeness, uniqueness,
ranges, set membership, predicates, referential containment, size) and
``run()`` evaluates them against a DataFrame with the paper's core
property: every SCALAR metric computes in ONE aggregate pass over the
data (a single scan + one partial/final aggregation, no per-constraint
jobs), uniqueness adds one keyed aggregation per key set, and
referential containment one anti-join per reference — all distributed,
nothing through the driver but the report itself (O(constraints) rows).

Metrics are reported in integer parts-per-million (``metric_ppm``) so
the report is engine-exact (ratios are exact integer arithmetic
``(count * 1e6) DIV total``), replayable by any ANSI-SQL oracle.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PPM = 1_000_000


@dataclass
class _Constraint:
    name: str
    kind: str
    spec: dict = field(default_factory=dict)


class Check:
    """Builder for a constraint suite over one table."""

    def __init__(self, df: DataFrame, level: str = "error"):
        self.df = df
        self.level = level
        self._constraints: list[_Constraint] = []

    # -- declarative surface (the Deequ verbs) ------------------------------

    def has_size(self, min_rows: int) -> "Check":
        self._constraints.append(
            _Constraint(f"size>={min_rows}", "size", {"min": min_rows})
        )
        return self

    def is_complete(self, col: str) -> "Check":
        self._constraints.append(_Constraint(f"complete({col})", "complete", {"col": col}))
        return self

    def has_completeness(self, col: str, min_ratio_ppm: int) -> "Check":
        self._constraints.append(
            _Constraint(
                f"completeness({col})>={min_ratio_ppm}ppm",
                "complete",
                {"col": col, "min_ppm": min_ratio_ppm},
            )
        )
        return self

    def is_unique(self, *cols: str) -> "Check":
        self._constraints.append(
            _Constraint(f"unique({','.join(cols)})", "unique", {"cols": list(cols)})
        )
        return self

    def has_min(self, col: str, at_least) -> "Check":
        self._constraints.append(
            _Constraint(f"min({col})>={at_least}", "min", {"col": col, "bound": at_least})
        )
        return self

    def has_max(self, col: str, at_most) -> "Check":
        self._constraints.append(
            _Constraint(f"max({col})<={at_most}", "max", {"col": col, "bound": at_most})
        )
        return self

    def is_contained_in(self, col: str, allowed: list) -> "Check":
        self._constraints.append(
            _Constraint(
                f"containedIn({col})", "contained", {"col": col, "allowed": list(allowed)}
            )
        )
        return self

    def satisfies(self, predicate: str, name: str, min_ratio_ppm: int = PPM) -> "Check":
        self._constraints.append(
            _Constraint(name, "satisfies", {"pred": predicate, "min_ppm": min_ratio_ppm})
        )
        return self

    def is_referenced_in(
        self, col: str, other: DataFrame, other_col: str, ref_name: str
    ) -> "Check":
        """Referential containment: every non-null ``col`` value exists
        in ``other.other_col`` (foreign-key shape; one left-anti join)."""
        self._constraints.append(
            _Constraint(
                f"refIn({col}->{ref_name}.{other_col})",
                "referential",
                {"col": col, "other": other, "other_col": other_col},
            )
        )
        return self

    # -- evaluation ----------------------------------------------------------

    def run(self) -> DataFrame:
        """Evaluate → report DataFrame (constraint, metric_ppm, passed)
        ordered by constraint name.  One scan for all scalar metrics;
        one keyed agg per uniqueness key set; one anti-join per
        referential constraint."""
        spark = self.df.sparkSession
        aggs: list = [F.count(F.lit(1)).alias("__total")]
        for i, c in enumerate(self._constraints):
            if c.kind == "complete":
                aggs.append(F.count(c.spec["col"]).alias(f"m{i}"))
            elif c.kind == "min":
                aggs.append(F.min(c.spec["col"]).alias(f"m{i}"))
            elif c.kind == "max":
                aggs.append(F.max(c.spec["col"]).alias(f"m{i}"))
            elif c.kind == "contained":
                col = F.col(c.spec["col"])
                # coalesce: F.sum over ZERO rows is NULL — an empty table
                # must report 0 violations, not crash the int() below
                aggs.append(
                    F.coalesce(
                        F.sum(
                            F.when(col.isNull() | col.isin(c.spec["allowed"]), 0)
                            .otherwise(1)
                        ),
                        F.lit(0),
                    ).alias(f"m{i}")
                )
            elif c.kind == "satisfies":
                aggs.append(
                    F.coalesce(
                        F.sum(F.when(F.expr(c.spec["pred"]), 1).otherwise(0)),
                        F.lit(0),
                    ).alias(f"m{i}")
                )
        scalars = self.df.agg(*aggs).collect()[0]  # O(constraints) scalars
        total = int(scalars["__total"])

        rows: list[tuple[str, int, bool]] = []
        for i, c in enumerate(self._constraints):
            if c.kind == "size":
                rows.append((c.name, total * PPM, total >= c.spec["min"]))
            elif c.kind == "complete":
                n = int(scalars[f"m{i}"])
                ppm = (n * PPM) // total if total else PPM
                rows.append((c.name, ppm, ppm >= c.spec.get("min_ppm", PPM)))
            elif c.kind in ("min", "max"):
                v = scalars[f"m{i}"]
                ok = (
                    v is not None
                    and (v >= c.spec["bound"] if c.kind == "min" else v <= c.spec["bound"])
                )
                metric = int(round(float(v) * PPM)) if v is not None else -1
                rows.append((c.name, metric, bool(ok)))
            elif c.kind == "contained":
                bad = int(scalars[f"m{i}"])
                ppm = ((total - bad) * PPM) // total if total else PPM
                rows.append((c.name, ppm, bad == 0))
            elif c.kind == "satisfies":
                n = int(scalars[f"m{i}"])
                ppm = (n * PPM) // total if total else PPM
                rows.append((c.name, ppm, ppm >= c.spec["min_ppm"]))
            elif c.kind == "unique":
                cols = c.spec["cols"]
                dup = (
                    self.df.groupBy(*cols)
                    .agg(F.count(F.lit(1)).alias("__n"))
                    .where(F.col("__n") > 1)
                    .agg(F.coalesce(F.sum("__n"), F.lit(0)).alias("d"))
                    .collect()[0]["d"]
                )
                ppm = ((total - int(dup)) * PPM) // total if total else PPM
                rows.append((c.name, ppm, int(dup) == 0))
            elif c.kind == "referential":
                col, other, ocol = c.spec["col"], c.spec["other"], c.spec["other_col"]
                orphans = (
                    self.df.select(F.col(col).alias("__k"))
                    .where(F.col("__k").isNotNull())
                    .join(
                        other.select(F.col(ocol).alias("__k")).distinct(),
                        "__k",
                        "left_anti",
                    )
                    .count()
                )
                ppm = ((total - int(orphans)) * PPM) // total if total else PPM
                rows.append((c.name, ppm, int(orphans) == 0))
        return spark.createDataFrame(
            rows, "constraint string, metric_ppm bigint, passed boolean"
        ).orderBy("constraint")
