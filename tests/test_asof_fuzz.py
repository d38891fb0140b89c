"""Randomized differential for the as-of (temporal) join — the
union+window carry-forward implementation has the subtle corners
(inclusive ties at probe time, whole-row version integrity, staleness
tolerance at the exact boundary), so it gets seeded-random probe/version
streams against a plain-Python latest-prior reference.
"""

from __future__ import annotations

import datetime
import random

import pytest

from my_flink_1_10_2_spark.operators.joins import asof_join

_BASE = datetime.datetime(2024, 1, 1)


def _ts(minutes: int) -> datetime.datetime:
    return _BASE + datetime.timedelta(minutes=minutes)


def _gen(rng: random.Random):
    keys = ["a", "b", "c"]
    versions = []
    used = set()
    for _ in range(rng.randint(0, 25)):
        k = rng.choice(keys)
        m = rng.randint(0, 120)
        if (k, m) in used:  # duplicate (key, ts) versions are ambiguous
            continue
        used.add((k, m))
        # None values must stay None (no leak from older versions)
        v = None if rng.random() < 0.2 else rng.randint(1, 999)
        versions.append((k, _ts(m), v, f"tag{m}"))
    probes = [
        (i, rng.choice(keys + ["zz"]), _ts(rng.randint(0, 120)))
        for i in range(rng.randint(1, 25))
    ]
    # force exact-tie probes onto some version timestamps
    for k, m in list(used)[: len(used) // 3]:
        probes.append((len(probes), k, _ts(m)))
    return versions, probes


def _reference(versions, probes, tol_minutes=None):
    by_key: dict[str, list] = {}
    for k, vt, v, tag in versions:
        by_key.setdefault(k, []).append((vt, v, tag))
    out = {}
    for pid, k, pt in probes:
        prior = [x for x in by_key.get(k, []) if x[0] <= pt]
        if not prior:
            out[pid] = (None, None)
            continue
        vt, v, tag = max(prior, key=lambda x: x[0])
        if tol_minutes is not None and vt < pt - datetime.timedelta(
            minutes=tol_minutes
        ):
            out[pid] = (None, None)
        else:
            out[pid] = (v, tag)
    return out


@pytest.mark.parametrize("trial", range(4))
def test_asof_join_randomized_vs_latest_prior(spark, trial):
    rng = random.Random(920 + trial)
    versions, probes = _gen(rng)
    tol = rng.choice([None, 15, 45])
    vdf = spark.createDataFrame(
        versions or [("x", _ts(0), 1, "t")],
        "ccy string, rtime timestamp, rate long, tag string",
    )
    if not versions:
        vdf = vdf.limit(0)
    pdf = spark.createDataFrame(probes, "pid long, ccy string, ptime timestamp")
    got_rows = asof_join(
        pdf.withColumnRenamed("ccy", "pccy"),
        vdf,
        key=("pccy", "ccy"),
        time=("ptime", "rtime"),
        tolerance=f"'{tol}' MINUTE" if tol else None,
    ).collect()
    got = {r["pid"]: (r["rate"], r["tag"]) for r in got_rows}
    want = _reference(versions, probes, tol)
    assert got == want, (
        f"trial {trial} tol={tol}\nversions={versions}\nprobes={probes}"
    )


def test_asof_tolerance_exact_boundary_is_kept(spark):
    """A version aged EXACTLY tolerance is still fresh (vt >= pt - tol)."""
    vdf = spark.createDataFrame(
        [("a", _ts(0), 5, "t0")], "ccy string, rtime timestamp, rate long, tag string"
    )
    pdf = spark.createDataFrame(
        [(1, "a", _ts(30))], "pid long, pccy string, ptime timestamp"
    )
    row = asof_join(
        pdf, vdf, key=("pccy", "ccy"), time=("ptime", "rtime"),
        tolerance="'30' MINUTE",
    ).first()
    assert (row["rate"], row["tag"]) == (5, "t0")
    row2 = asof_join(
        pdf, vdf, key=("pccy", "ccy"), time=("ptime", "rtime"),
        tolerance="'29' MINUTE",
    ).first()
    assert row2["rate"] is None and row2["tag"] is None
