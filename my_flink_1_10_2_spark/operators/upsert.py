"""Upsert-changelog materialization (ref: flink-table/flink-table-api-
java-bridge/src/main/java/org/apache/flink/table/sinks/
UpsertStreamTableSink.java — a keyed changelog of (upsert, delete)
messages whose final state is "latest message per key wins; a trailing
delete removes the key").

The reference hands `Tuple2<Boolean, Row>` to the sink (true = upsert,
false = delete) with `setKeyFields` defining the unique key.  Here the
changelog is an ordinary DataFrame with explicit key / order / op
columns, and materialization is one window shuffle partitioned by the
key — no per-key state on the driver, so the same plan runs on a
1000-executor cluster: the only data movement is the hash exchange on
the upsert key.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _checked_op(changelog: DataFrame, op_col: str) -> DataFrame:
    """NULL ops would silently vanish through ``op != delete_op`` (NULL
    comparisons are NULL → filtered): fail fast at execution instead,
    fully lazy and distributed — the reference's sink receives a
    non-null boolean, so a NULL here is always an upstream bug."""
    return changelog.withColumn(
        op_col,
        F.when(
            F.col(op_col).isNull(),
            F.raise_error(F.lit(f"upsert changelog: NULL {op_col!r} message")),
        ).otherwise(F.col(op_col)),
    )


def upsert_materialize(
    changelog: DataFrame,
    keys: Sequence[str],
    order_col: str,
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Collapse a keyed upsert/delete changelog to its final snapshot.

    For every distinct ``keys`` tuple, the row with the greatest
    ``order_col`` (version / rowtime / offset) wins; if that winning
    row's ``op_col`` equals ``delete_op`` the key is absent from the
    snapshot.  ``(keys, order_col)`` must be unique — ties would make
    "latest" ambiguous, so they are broken deterministically by the
    remaining columns to keep the operator's output stable, but callers
    should treat duplicates as an upstream bug (the reference requires a
    unique key + monotone version per key as well).

    Returns the snapshot without ``op_col``.
    """
    keys = list(keys)
    changelog = _checked_op(changelog, op_col)
    others = [c for c in changelog.columns if c not in (*keys, order_col, op_col)]
    w = Window.partitionBy(*keys).orderBy(
        F.col(order_col).desc(), *[F.col(c).desc() for c in others]
    )
    return (
        changelog.withColumn("__rn", F.row_number().over(w))
        .where((F.col("__rn") == 1) & (F.col(op_col) != F.lit(delete_op)))
        .drop("__rn", op_col)
    )


def apply_upsert_batch(
    snapshot: DataFrame,
    batch: DataFrame,
    keys: Sequence[str],
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Apply one changelog micro-batch to an existing snapshot (the
    incremental form a ``foreachBatch`` upsert sink uses): rows of
    ``batch`` replace same-key rows of ``snapshot``; delete rows remove
    them.  ``batch`` must contain at most one message per key (collapse
    with :func:`upsert_materialize` first if not).

    One left-anti join (drop replaced/deleted keys) + one union — both
    key-partitioned, nothing driver-side.
    """
    keys = list(keys)
    batch = _checked_op(batch, op_col)
    survivors = snapshot.join(batch.select(*keys), keys, "left_anti")
    additions = batch.where(F.col(op_col) != F.lit(delete_op)).drop(op_col)
    return survivors.unionByName(additions)


def table_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    op_col: str = "op",
) -> DataFrame:
    """Derive the changelog between two snapshot versions of a keyed
    table — the inverse of :func:`upsert_materialize` and the batch
    analog of the reference's retract-stream conversion
    (ref: StreamTableEnvironment.toRetractStream — a snapshot pair
    (v_old, v_new) differs into exactly the +I/-D/+U messages a
    changelog consumer would need to move between them).

    Output = one row per key present in either side whose payload
    changed: ``op_col`` is ``I`` (insert: key only in ``new``), ``D``
    (delete: key only in ``old``) or ``U`` (update: both present,
    any non-key column differs).  Unchanged keys are absent.  Column
    set: keys..., op, old_<payload>..., new_<payload>... .

    One full-outer hash join on the key — the scale-safe snapshot-diff
    shape (no driver-side comparison).
    """
    keys = list(keys)
    payload = [c for c in old.columns if c not in keys]
    if payload != [c for c in new.columns if c not in keys]:
        raise ValueError("old/new payload columns must match")
    # presence flags must not rely on nullable payloads: use a literal
    # marker column per side
    o2 = old.withColumn("__o", F.lit(1)).alias("o")
    n2 = new.withColumn("__n", F.lit(1)).alias("n")
    joined = o2.join(n2, keys, "full_outer")
    changed = F.lit(False)
    for c in payload:
        changed = changed | ~(F.col(f"o.{c}").eqNullSafe(F.col(f"n.{c}")))
    op = (
        F.when(F.col("o.__o").isNull(), F.lit("I"))
        .when(F.col("n.__n").isNull(), F.lit("D"))
        .when(changed, F.lit("U"))
    )
    return (
        joined.withColumn(op_col, op)
        .where(F.col(op_col).isNotNull())
        .select(
            *keys,
            op_col,
            *[F.col(f"o.{c}").alias(f"old_{c}") for c in payload],
            *[F.col(f"n.{c}").alias(f"new_{c}") for c in payload],
        )
    )


def collapse_batch(
    changelog: DataFrame,
    keys: Sequence[str],
    order_col: str,
    op_col: str = "op",
) -> DataFrame:
    """Collapse a changelog slice to its latest message per key,
    KEEPING the op column (unlike :func:`upsert_materialize`, which
    resolves deletes away) — the per-micro-batch pre-step before
    :func:`apply_upsert_batch`, mirroring the reference's per-bundle
    key dedup in MiniBatch upsert sinks."""
    keys = list(keys)
    others = [c for c in changelog.columns if c not in (*keys, order_col, op_col)]
    w = Window.partitionBy(*keys).orderBy(
        F.col(order_col).desc(), *[F.col(c).desc() for c in others]
    )
    return (
        changelog.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
