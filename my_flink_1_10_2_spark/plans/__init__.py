"""Physical-plan introspection — the engine's optimizer feedback loop.

The reference validates its optimizer with 152 golden plan-XML tests
(ref: flink-table/flink-table-planner-blink/src/test/resources/.../plan/).
We trust Catalyst instead, but *assert the plan properties that matter at
100 TB*: filters pushed to the parquet scan, projections pruned to the
read schema, small dimensions broadcast, no redundant shuffles. These
helpers parse `explain("formatted")` output so tests can gate on plan
shape, not just results.
"""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """The plan text of `df` (what `df.explain(mode)` prints)."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def pushed_filters(df: DataFrame) -> list[str]:
    """Filter expressions that reached the data source scan."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters:\s*\[([^\]]*)\]", explain_str(df)):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out


def read_schemas(df: DataFrame) -> list[str]:
    """Per-scan ReadSchema strings — verifies column pruning (a scan
    reading all columns for a 2-column projection is wrong)."""
    return [m.group(1) for m in re.finditer(r"ReadSchema:\s*(\S+)", explain_str(df))]


def scan_columns(df: DataFrame) -> set[str]:
    """Union of column names actually read from all file scans."""
    cols: set[str] = set()
    for schema in read_schemas(df):
        cols.update(re.findall(r"(\w+):", schema))
    return cols


def num_shuffles(df: DataFrame) -> int:
    """Exchange (shuffle) count in the physical plan. Every extra one is
    a full re-materialization of the stream at scale."""
    # simple-mode plan lists each Exchange node exactly once
    plan = explain_str(df, mode="simple")
    return len(re.findall(r"\bExchange (?:hash|range|Single)", plan))


def broadcast_join_count(df: DataFrame) -> int:
    plan = explain_str(df, mode="simple")
    return len(re.findall(r"BroadcastHashJoin|BroadcastNestedLoopJoin", plan))


def sort_merge_join_count(df: DataFrame) -> int:
    return len(re.findall(r"SortMergeJoin", explain_str(df, mode="simple")))


def wholestage_codegen_spans(df: DataFrame) -> int:
    """Number of WholeStageCodegen pipelines — wider is better (fewer
    Python/row-by-row breaks)."""
    # With AQE on, codegen subtrees only materialize at execution; plan
    # once with AQE off to observe them (conf restored afterwards).
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        m = re.search(r"Found (\d+) WholeStageCodegen subtrees",
                      explain_str(df, mode="codegen"))
        return int(m.group(1)) if m else 0
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)


def python_eval_count(df: DataFrame) -> int:
    """Row-at-a-time Python UDF operators in the plan (BatchEvalPython).
    Should be zero on hot paths; ArrowEvalPython (vectorized) is counted
    separately."""
    return len(re.findall(r"BatchEvalPython", explain_str(df)))


def assert_plan(df: DataFrame, *, pushed: list[str] | None = None,
                max_shuffles: int | None = None,
                min_broadcast_joins: int | None = None,
                no_batch_python: bool = False,
                columns_subset: set[str] | None = None) -> None:
    """One-call plan gate used by the test-suite."""
    if pushed is not None:
        got = " ".join(pushed_filters(df))
        for frag in pushed:
            assert frag in got, f"filter not pushed: {frag!r}; got {got!r}"
    if max_shuffles is not None:
        n = num_shuffles(df)
        assert n <= max_shuffles, f"{n} shuffles > budget {max_shuffles}"
    if min_broadcast_joins is not None:
        n = broadcast_join_count(df)
        assert n >= min_broadcast_joins, f"only {n} broadcast joins"
    if no_batch_python:
        assert python_eval_count(df) == 0, "row-at-a-time Python UDF in hot path"
    if columns_subset is not None:
        extra = scan_columns(df) - columns_subset
        assert not extra, f"scan reads unpruned columns: {extra}"


def _tree_nodes(plan: str) -> list[tuple[int, str]]:
    """Parse a physical-plan toString tree into (depth, node_text) pairs.

    Spark draws the tree with 3-char prefix segments: "   " / ":  "
    (continuation) and "+- " / ":- " (the node marker).  Depth = number
    of segments; the root has none.  Codegen stage markers `*(n) ` are
    stripped from the node text.
    """
    nodes: list[tuple[int, str]] = []
    for raw in plan.splitlines():
        line = raw.rstrip()
        if not line or line.startswith("=="):
            continue
        i, depth = 0, 0
        while True:
            seg = line[i : i + 3]
            if seg in ("   ", ":  "):
                depth += 1
                i += 3
                continue
            if seg in ("+- ", ":- "):
                depth += 1
                i += 3
            break
        text = re.sub(r"^\*\(\d+\)\s*", "", line[i:])
        if text:
            nodes.append((depth, text))
    return nodes


# Operators that merely forward their child's partitioning between an
# Exchange and the Window that required it.
_SPW_PASSTHROUGH = {
    "Sort", "Project", "Filter", "ColumnarToRow", "InputAdapter",
    "AQEShuffleRead", "ShuffleQueryStage", "Coalesce", "WindowGroupLimit",
}


def single_partition_windows(df: DataFrame) -> list[str]:
    """Window operators fed by an ``Exchange SinglePartition`` — the
    unpartitioned-OVER shape that funnels the whole relation through ONE
    task (the 100 TB killer; ref: BatchExecRank.scala /
    BatchExecSortRule.scala rank over sample-based range partitions,
    never one task).  Returns the offending Window node strings; gates
    assert this is empty unless the window's input is provably bounded
    (e.g. DDSketch buckets, O(partitions) offset relations).

    Detection: walk each ``Exchange SinglePartition`` node's ancestor
    chain upward through partition-preserving operators (Sort, Project,
    Filter, ...); if the first significant ancestor is a Window (incl.
    WindowInPandas), the plan routes row data through one task.
    """
    nodes = _tree_nodes(explain_str(df, "simple"))
    hits: list[str] = []
    for i, (depth, text) in enumerate(nodes):
        if not text.startswith("Exchange SinglePartition"):
            continue
        cur = depth
        for j in range(i - 1, -1, -1):
            dj, tj = nodes[j]
            if dj >= cur:
                continue
            cur = dj
            m = re.match(r"[A-Za-z]+", tj)
            op = m.group(0) if m else tj
            if op in _SPW_PASSTHROUGH:
                continue
            if op.startswith("Window"):
                hits.append(tj)
            break
    return hits
