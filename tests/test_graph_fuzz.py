"""Random-graph differentials for the graph library (operators/gelly.py,
operators/iterate.py).  The graded queries run each algorithm on ONE
fixture graph; these trials run them on seeded Erdos-Renyi-ish random
graphs against independent plain-Python references (union-find for
components, brute-force triple scan for triangles, naive peeling for
k-core/k-truss, Dijkstra for SSSP) — different algorithms, so agreement
is meaningful.
"""

from __future__ import annotations

import heapq
import itertools
import random

import pytest

from my_flink_1_10_2_spark.operators.gelly import (
    k_core,
    k_truss,
    sssp,
    triangle_enumerate,
)
from my_flink_1_10_2_spark.operators.iterate import (
    connected_components,
    connected_components_delta,
)


def _random_graph(rng: random.Random, n: int, p: float):
    """Undirected simple graph as a canonical (a < b) edge list."""
    return [
        (a, b)
        for a in range(n)
        for b in range(a + 1, n)
        if rng.random() < p
    ]


# ------------------------------------------------------- plain references


def _uf_components(n: int, edges):
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {v: find(v) for v in range(n)}


def _brute_triangles(edges):
    es = set(edges)
    verts = sorted({v for e in edges for v in e})
    return {
        (a, b, c)
        for a, b, c in itertools.combinations(verts, 3)
        if (a, b) in es and (b, c) in es and (a, c) in es
    }


def _peel_k_core(edges, k):
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    changed = True
    while changed:
        changed = False
        for v in list(adj):
            if len(adj[v]) < k:
                for u in adj.pop(v):
                    adj[u].discard(v)
                changed = True
    return {v: len(ns) for v, ns in adj.items()}


def _peel_k_truss(edges, k):
    es = set(edges)
    while True:
        support = {}
        for a, b in es:
            support[(a, b)] = sum(
                1
                for c in {v for e in es for v in e}
                if (min(a, c), max(a, c)) in es
                and (min(b, c), max(b, c)) in es
                and c not in (a, b)
            )
        drop = {e for e, s in support.items() if s < k - 2}
        if not drop:
            return support
        es -= drop


def _dijkstra(n, edges, source):
    adj: dict[int, list[tuple[int, float]]] = {}
    for a, b, w in edges:
        adj.setdefault(a, []).append((b, w))
    dist = {source: 0.0}
    heap = [(0.0, source)]
    while heap:
        d, v = heapq.heappop(heap)
        if d > dist.get(v, float("inf")):
            continue
        for u, w in adj.get(v, []):
            nd = d + w
            if nd < dist.get(u, float("inf")):
                dist[u] = nd
                heapq.heappush(heap, (nd, u))
    return dist


# ------------------------------------------------------------------ tests


@pytest.mark.parametrize("trial", range(3))
def test_connected_components_both_variants_random_graphs(spark, trial):
    rng = random.Random(880 + trial)
    n = rng.randint(8, 24)
    edges = _random_graph(rng, n, rng.choice([0.05, 0.15, 0.4]))
    truth = _uf_components(n, edges)
    edf = spark.createDataFrame(edges or [(0, 0)], "src long, dst long")
    if not edges:
        edf = edf.limit(0)
    vdf = spark.createDataFrame([(v,) for v in range(n)], "vec_id long")
    for fn in (connected_components, connected_components_delta):
        got = {
            r["node"]: r["component"]
            for r in fn(edf, vertices=vdf, max_iterations=30).collect()
        }
        assert got == truth, f"trial {trial} {fn.__name__} edges={edges}"


@pytest.mark.parametrize("trial", range(2))
def test_triangle_enumeration_random_graphs(spark, trial):
    rng = random.Random(885 + trial)
    edges = _random_graph(rng, rng.randint(6, 16), 0.4)
    edf = spark.createDataFrame(edges or [(0, 1)], "src long, dst long")
    got = {
        (r["v1"], r["v2"], r["v3"]) for r in triangle_enumerate(edf).collect()
    }
    assert got == _brute_triangles(edges or [(0, 1)]), f"trial {trial}"


@pytest.mark.parametrize("trial", range(2))
def test_k_core_random_graphs(spark, trial):
    rng = random.Random(890 + trial)
    edges = _random_graph(rng, rng.randint(8, 18), 0.35)
    k = rng.choice([2, 3])
    edf = spark.createDataFrame(edges or [(0, 1)], "src long, dst long")
    got = {r["node"]: r["degree"] for r in k_core(edf, k).collect()}
    assert got == _peel_k_core(edges or [(0, 1)], k), f"trial {trial} k={k}"


@pytest.mark.parametrize("trial", range(2))
def test_k_truss_random_graphs(spark, trial):
    rng = random.Random(895 + trial)
    edges = _random_graph(rng, rng.randint(7, 14), 0.5)
    k = rng.choice([3, 4])
    edf = spark.createDataFrame(edges or [(0, 1)], "src long, dst long")
    got = {
        (r["a"], r["b"]): r["support"] for r in k_truss(edf, k).collect()
    }
    assert got == _peel_k_truss(edges or [(0, 1)], k), f"trial {trial} k={k}"


@pytest.mark.parametrize("trial", range(2))
def test_sssp_random_weighted_graphs(spark, trial):
    """Directed random weights vs Dijkstra; Bellman-Ford rounds capped
    at n so every shortest path settles."""
    rng = random.Random(898 + trial)
    n = rng.randint(6, 14)
    edges = [
        (a, b, round(rng.uniform(0.5, 5.0), 3))
        for a in range(n)
        for b in range(n)
        if a != b and rng.random() < 0.25
    ]
    if not edges:
        edges = [(0, 1, 1.0)]
    truth = _dijkstra(n, edges, 0)
    edf = spark.createDataFrame(edges, "src long, dst long, w double")
    got = {
        r["node"]: r["dist"]
        for r in sssp(edf, 0, iterations=n + 1, weight="w").collect()
    }
    assert set(got) == set(truth), f"trial {trial}"
    for v, d in truth.items():
        assert got[v] == pytest.approx(d, abs=1e-9), f"trial {trial} v={v}"
