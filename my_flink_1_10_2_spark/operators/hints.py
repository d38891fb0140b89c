"""Size-gated join-strategy hints.

The reference picks broadcast-hash joins from catalog statistics at plan
time (ref: flink-table/flink-table-planner-blink/src/main/scala/org/apache/
flink/table/planner/plan/rules/physical/batch/BatchExecHashJoinRule.scala,
gated by `table.optimizer.join.broadcast-threshold`).  A hard-coded
``F.broadcast(dim)`` reproduces the *test-scale* plan but is a scale
hazard: `part`, `customer`, and `supplier` grow linearly with the scale
factor, and at 100 TB a forced broadcast of a multi-GB dimension OOMs the
executors where AQE would correctly have picked a shuffle join.

``dim()`` is the scale-safe spelling: it consults Catalyst's own
plan-time size estimate (`optimizedPlan().stats().sizeInBytes`, the same
statistic the auto-broadcast rule reads) and attaches the hint only when
the estimate is under a configurable threshold.  Over the threshold the
frame is returned unhinted and the strategy is left to CBO/AQE — which
re-plans from *actual* shuffle sizes at runtime and will still broadcast
anything genuinely small.

Threshold resolution order:
  1. explicit ``max_bytes=`` argument,
  2. ``spark.graft.dim.broadcastThreshold`` session conf (bytes, or a
     size string like "256MB"),
  3. default 256 MiB — deliberately above the 64 MiB auto-broadcast
     threshold (session.py) so that at test scale the plan gates see the
     deterministic hinted plan, while anything dimension-shaped at 100×
     scale clears the gate and falls back to AQE.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_THRESHOLD_BYTES = 256 * 1024 * 1024
THRESHOLD_CONF_KEY = "spark.graft.dim.broadcastThreshold"

_SIZE_RE = re.compile(r"^\s*(\d+(?:\.\d+)?)\s*([kmgt]?i?b?)\s*$", re.IGNORECASE)
_UNIT = {
    "": 1,
    "b": 1,
    "k": 1024,
    "kb": 1024,
    "kib": 1024,
    "m": 1024**2,
    "mb": 1024**2,
    "mib": 1024**2,
    "g": 1024**3,
    "gb": 1024**3,
    "gib": 1024**3,
    "t": 1024**4,
    "tb": 1024**4,
    "tib": 1024**4,
}


def parse_size_bytes(s: str) -> int:
    """'256MB' / '64m' / '1073741824' -> bytes."""
    m = _SIZE_RE.match(str(s))
    if not m:
        raise ValueError(f"unparseable size: {s!r}")
    return int(float(m.group(1)) * _UNIT[m.group(2).lower()])


_SIZE_CACHE: dict[tuple[int, int], int] = {}


def plan_size_bytes(df: DataFrame) -> int | None:
    """Catalyst's plan-time size estimate for `df` in bytes, or None if
    the estimate is unavailable.  Driver-side metadata only — analyzes
    and optimizes the sub-plan but executes nothing.

    Estimates are memoized by the plan's semantic hash (~0.3 ms vs
    ~5 ms for an optimizer pass), so re-building the same query — e.g.
    bench's repeated runs — pays the optimizer cost once per distinct
    dimension shape per session.  A cached entry can go stale if the
    files under an identical plan change mid-session; for a broadcast
    hint threshold that imprecision is harmless."""
    try:
        key: tuple[int, int] | None = (id(df.sparkSession), df.semanticHash())
    except Exception:
        key = None
    if key is not None and key in _SIZE_CACHE:
        return _SIZE_CACHE[key]
    try:
        est = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:
        return None
    if key is not None:
        if len(_SIZE_CACHE) > 4096:
            _SIZE_CACHE.clear()
        _SIZE_CACHE[key] = est
    return est


def _threshold(df: DataFrame, max_bytes: int | None) -> int:
    if max_bytes is not None:
        return max_bytes
    try:
        conf = df.sparkSession.conf.get(THRESHOLD_CONF_KEY, None)
    except Exception:
        conf = None
    if conf is not None:
        return parse_size_bytes(conf)
    return DEFAULT_THRESHOLD_BYTES


def dim(df: DataFrame, max_bytes: int | None = None) -> DataFrame:
    """Broadcast-hint `df` only if Catalyst estimates it small enough.

    Use on the dimension side of every star join instead of a raw
    ``F.broadcast``.  Under the threshold the hint makes the test-scale
    plan deterministic (plan gates assert BroadcastHashJoin); over it —
    i.e. at production scale factors — no hint is attached and AQE/CBO
    pick the strategy from real sizes.  When no estimate is available
    the frame is returned unhinted (defer to AQE rather than force a
    possibly-huge broadcast).
    """
    est = plan_size_bytes(df)
    if est is not None and est <= _threshold(df, max_bytes):
        return F.broadcast(df)
    return df
