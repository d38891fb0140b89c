"""Bounded-iteration operator tests (ref: DataSet.iterate DataSet.java:1156,
flink-gelly library/ConnectedComponents.java)."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

import my_flink_1_10_2_spark.operators.iterate as mod


def _count_steps(monkeypatch):
    calls = {"n": 0}
    real = mod.iterate

    def spy(initial, step, max_iterations, converged=None):
        def wrapped(lbl, i):
            calls["n"] += 1
            return step(lbl, i)

        return real(initial, wrapped, max_iterations, converged)

    monkeypatch.setattr(mod, "iterate", spy)
    return calls


def test_iterate_early_stop(spark):
    """`converged` stops the loop before max_iterations."""
    init = spark.range(1).withColumn("x", F.lit(0))
    seen = []

    def step(df, i):
        seen.append(i)
        return df.withColumn("x", F.least(df.x + 1, F.lit(3)))

    out = mod.iterate(init, step, 10, lambda p, n: p.first().x == n.first().x)
    assert out.first().x == 3
    assert len(seen) == 4  # 0→1→2→3→3(detected fixed point)


def test_connected_components_two_clusters(spark):
    edges = spark.createDataFrame(
        [Row(src=1, dst=2), Row(src=2, dst=3), Row(src=10, dst=11)]
    )
    out = {r.node: r.component for r in mod.connected_components(edges).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_connected_components_chain_converges_logarithmically(spark, monkeypatch):
    """Pointer jumping must keep supersteps at O(log diameter): a
    64-node path graph has diameter 63 — plain min-propagation needs 63
    rounds; with alternate-round path compression it must finish in
    far fewer."""
    calls = _count_steps(monkeypatch)
    chain = spark.createDataFrame([Row(src=i, dst=i + 1) for i in range(63)])
    cc = mod.connected_components(chain, max_iterations=64)
    comps = cc.select("component").distinct().collect()
    assert [r.component for r in comps] == [0]
    assert calls["n"] <= 16, f"expected O(log d) supersteps, got {calls['n']}"
