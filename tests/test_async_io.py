"""AsyncDataStream analog tests (ref: AsyncDataStream.java:103,148):
overlapped lookups, ordered vs unordered emission, timeout nulls."""

from __future__ import annotations

import time

from my_flink_1_10_2_spark.operators.async_io import async_enrich
from my_flink_1_10_2_spark.queries import read
from tests.conftest import SF_DIR


def test_async_enrich_values_and_order(spark):
    import asyncio

    async def lookup(row):
        await asyncio.sleep(0.001)
        return {"n_name_len": len(row["n_name"]), "double_key": row["n_nationkey"] * 2}

    nation = read(spark, SF_DIR, "nation")
    out = async_enrich(
        nation,
        lookup,
        "n_nationkey int, n_name string, n_regionkey int, n_name_len int, double_key int",
    )
    rows = out.collect()
    assert len(rows) == nation.count()
    for r in rows:
        assert r.n_name_len == len(r.n_name)
        assert r.double_key == r.n_nationkey * 2


def test_async_overlap_beats_serial(spark):
    """100 lookups of 30 ms each must take far less than 3 s — proof the
    requests actually overlap (the whole point of the operator)."""
    import asyncio

    async def slow(row):
        await asyncio.sleep(0.03)
        return {"tag": 1}

    df = spark.range(100).coalesce(1)  # one partition → one event loop
    t0 = time.perf_counter()
    n = async_enrich(df, slow, "id long, tag int", capacity=100).count()
    wall = time.perf_counter() - t0
    assert n == 100
    assert wall < 2.5, f"async requests did not overlap: {wall:.1f}s"


def test_async_timeout_yields_nulls(spark):
    import asyncio

    async def sometimes_slow(row):
        if row["id"] % 2 == 0:
            await asyncio.sleep(10)
        return {"ok": 1}

    df = spark.range(6).coalesce(1)
    rows = async_enrich(
        df, sometimes_slow, "id long, ok int", timeout=0.2
    ).collect()
    got = {r.id: r.ok for r in rows}
    assert all(got[i] is None for i in range(0, 6, 2))
    assert all(got[i] == 1 for i in range(1, 6, 2))


def test_unordered_returns_all(spark):
    import asyncio

    async def jitter(row):
        await asyncio.sleep(0.001 * (row["id"] % 5))
        return {"seen": 1}

    df = spark.range(50).coalesce(1)
    rows = async_enrich(df, jitter, "id long, seen int", ordered=False).collect()
    assert sorted(r.id for r in rows) == list(range(50))
