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


def test_delta_iteration_matches_bulk_and_workset_shrinks(spark):
    """iterateDelta (ref: DataSet.java:1206): same fixpoint as the bulk
    iteration, with the workset — only vertices whose label improved —
    monotonically shrinking to empty (converged elements drop out of the
    per-superstep shuffle, the whole point of delta iterations)."""
    from my_flink_1_10_2_spark.operators.iterate import (
        connected_components,
        connected_components_delta,
    )

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (10, 11), (20, 21), (21, 22)],
        "src long, dst long",
    )
    sizes: list[int] = []
    delta = connected_components_delta(
        edges, max_iterations=20, superstep_sizes=sizes
    )
    bulk = connected_components(edges, max_iterations=20)
    assert sorted(map(tuple, delta.collect())) == sorted(map(tuple, bulk.collect()))
    assert sizes[-1] == 0  # reached the empty-workset fixpoint
    assert sizes == sorted(sizes, reverse=True)  # monotone shrink
    assert len(sizes) > 2 and sizes[1] < sizes[0]  # genuinely shrinking


def test_pagerank_sums_to_less_than_one_and_is_deterministic(spark):
    """PageRank on a 3-cycle: symmetric graph ⇒ uniform ranks; total
    mass = 1 (no dangling nodes in a cycle)."""
    from my_flink_1_10_2_spark.operators.gelly import pagerank

    edges = spark.createDataFrame([(1, 2), (2, 3), (3, 1)], "src long, dst long")
    out = {r.node: r.rank for r in pagerank(edges, iterations=10).collect()}
    assert len(out) == 3
    for v in out.values():
        assert abs(v - 1.0 / 3) < 1e-9
    assert abs(sum(out.values()) - 1.0) < 1e-9


def test_label_propagation_two_cliques(spark):
    """Two triangles joined by nothing: each converges to its min id."""
    from my_flink_1_10_2_spark.operators.gelly import label_propagation

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (10, 12)],
        "src long, dst long",
    )
    out = {r.node: r.label for r in label_propagation(edges, iterations=4).collect()}
    assert {out[1], out[2], out[3]} == {1}
    assert {out[10], out[11], out[12]} == {10}


def test_triangle_enumeration_exact(spark):
    """K4 has exactly 4 triangles, each enumerated once, v1<v2<v3."""
    from my_flink_1_10_2_spark.operators.gelly import triangle_enumerate

    k4 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    edges = spark.createDataFrame(k4, "src long, dst long")
    tris = sorted(map(tuple, triangle_enumerate(edges).collect()))
    assert tris == [(1, 2, 3), (1, 2, 4), (1, 3, 4), (2, 3, 4)]


def test_steps_per_checkpoint_fusion_identical_and_exact_step_count(spark):
    """steps_per_checkpoint fuses supersteps into one checkpoint but must
    run EXACTLY max_iterations steps (tail chunk shorter) and produce
    bit-identical state to the unfused loop."""
    init = spark.range(4).withColumn("x", F.col("id"))

    def make_step(log):
        def step(df, i):
            log.append(i)
            return df.withColumn("x", df.x + 1)

        return step

    log1: list[int] = []
    log3: list[int] = []
    out1 = mod.iterate(init, make_step(log1), 5, steps_per_checkpoint=1)
    out3 = mod.iterate(init, make_step(log3), 5, steps_per_checkpoint=3)
    assert log1 == list(range(5)) and log3 == list(range(5))
    assert sorted(map(tuple, out1.collect())) == sorted(map(tuple, out3.collect()))


def test_converged_that_never_touches_new_state_is_safe(spark):
    """The lazy-checkpoint fusion relies on `converged` materializing the
    new state; a custom criterion that never runs an action on it must
    still be safe (the guard forces the blocks before the previous
    checkpoint is freed)."""
    init = spark.range(3).withColumn("x", F.lit(0))
    rounds = {"n": 0}

    def step(df, i):
        return df.withColumn("x", df.x + 1)

    def lazy_converged(prev, new):
        rounds["n"] += 1
        return rounds["n"] >= 4  # never touches prev/new

    out = mod.iterate(init, step, 10, converged=lazy_converged)
    assert [r.x for r in out.collect()] == [4, 4, 4]


def test_iterate_delta_frees_superseded_checkpoints(spark):
    """The two-jobs-per-round rewrite defers block frees by one round;
    at loop exit only the result (and caller-owned) checkpoints may stay
    resident — superseded per-round state must not leak."""
    sc = spark.sparkContext
    for r in list(sc._jsc.getPersistentRDDs().values()):
        r.unpersist()
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "src long, dst long"
    )
    out = mod.connected_components_delta(edges, max_iterations=20)
    assert {r.node: r.component for r in out.collect()} == {
        1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10,
    }
    resident = len(sc._jsc.getPersistentRDDs())
    assert resident <= 2, f"{resident} persisted RDDs leaked past iterate_delta"


def test_partial_action_criterion_forces_full_materialization(spark):
    """Round-11 verdict item 6: a convergence criterion that runs only a
    PARTIAL action (take(1) computes a prefix of partitions) must not
    let the guard count the lazy checkpoint as materialized — otherwise
    the previous superstep's blocks are freed while unmaterialized
    partitions still reference them.  The hardened guard requires every
    partition cached, so the loop must force the rest and stay correct."""
    init = spark.range(64).repartition(8).withColumn("x", F.lit(0))

    def step(df, i):
        return df.withColumn("x", df.x + 1)

    rounds = {"n": 0}

    def partial_converged(prev, new):
        rounds["n"] += 1
        new.take(1)  # partial action: materializes only some partitions
        return rounds["n"] >= 5

    out = mod.iterate(init, step, 10, converged=partial_converged)
    assert [r.x for r in out.collect()] == [5] * 64


def test_iterate_delta_frees_blocks_on_step_exception(spark):
    """A step that raises mid-loop must not leak this call's checkpoint
    blocks (round-11 advice: the deferred frees were skipped on the
    exception path)."""
    sc = spark.sparkContext
    for r in list(sc._jsc.getPersistentRDDs().values()):
        r.unpersist()
    sol = spark.createDataFrame([(1, 10), (2, 20)], "k long, v long")

    def bad_step(solution, workset, i):
        if i >= 1:
            raise RuntimeError("boom")
        delta = solution.limit(1).select("k", (F.col("v") + 1).alias("v"))
        return delta, delta

    try:
        mod.iterate_delta(sol, sol, bad_step, 5, key="k")
    except RuntimeError:
        pass
    else:
        raise AssertionError("step exception must propagate")
    resident = len(sc._jsc.getPersistentRDDs())
    assert resident == 0, f"{resident} persisted RDDs leaked on the exception path"
