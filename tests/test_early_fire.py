"""Early-fire emission SEQUENCE on a live micro-batch stream: scripted
watermark advances, hand-computed expected (early, final) pane log
(ref contract: ContinuousEventTimeTrigger.java onElement/onEventTime)."""

from __future__ import annotations

import shutil
import tempfile

import pytest

from my_flink_1_10_2_spark.streaming.early_fire import continuous_early_fire_log

S = 1_000_000  # 1 second in micros


@pytest.fixture(scope="module")
def emission_log(spark):
    rows = [
        # (k, te, batch, v)
        ("a", 5 * S, 0, 1),
        ("a", 25 * S, 0, 2),
        ("a", 55 * S, 1, 4),
        ("b", 10 * S, 1, 10),
        ("a", 130 * S, 2, 8),
    ]
    src = spark.createDataFrame(rows, "k string, te long, batch long, v long")
    work = tempfile.mkdtemp(prefix="fl_earlyfire_")
    try:
        log = continuous_early_fire_log(
            spark,
            src,
            work,
            ts_col="te",
            batch_col="batch",
            keys=["k"],
            value_col="v",
            size_us=60 * S,
            interval_us=20 * S,
            delay_us=10 * S,
        )
        yield sorted(
            (r.k, r.window_start // S, r.fire_ts // S, r.fire_batch, r.fire_seq,
             r.cnt, r.v_sum)
            for r in log.collect()
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_early_fire_sequence_cascade_and_finals(emission_log):
    """Batch 0 (wm=15s): no boundary reached — nothing fires.
    Batch 1 (wm=45s): the watermark jumps two boundaries of window
    [0,60) → BOTH fire, same pane contents (the reference's timer
    re-registration cascade); key b's fresh window fires its past+current
    boundaries on arrival.  Batch 2 (end of input, wm=+inf): every
    remaining boundary up to each window end fires — the final panes."""
    assert emission_log == sorted(
        [
            # key a, window [0, 60): early fires at 20/40 with 3 elements
            ("a", 0, 20, 1, 1, 3, 7),
            ("a", 0, 40, 1, 2, 3, 7),
            ("a", 0, 60, 2, 3, 3, 7),  # final pane at window end
            # key a, window [120, 180): all boundaries after first
            # element's timestamp (130 → 140) fire at end-of-input
            ("a", 120, 140, 2, 1, 1, 8),
            ("a", 120, 160, 2, 2, 1, 8),
            ("a", 120, 180, 2, 3, 1, 8),
            # key b, window [0, 60): first element at batch 1 registers
            # 20s; 20/40 already behind wm=45 → fire on arrival batch
            ("b", 0, 20, 1, 1, 1, 10),
            ("b", 0, 40, 1, 2, 1, 10),
            ("b", 0, 60, 2, 3, 1, 10),
        ]
    )


def test_early_fire_rejects_misaligned_interval(spark):
    src = spark.createDataFrame([("a", 0, 0, 0)], "k string, te long, batch long, v long")
    with pytest.raises(ValueError, match="divide"):
        continuous_early_fire_log(
            spark, src, "/tmp/x", keys=["k"], size_us=60 * S,
            interval_us=7 * S, delay_us=0,
        )


def test_early_fire_boundary_exact_semantics(spark):
    """Adversarial edges: an element exactly ON a boundary registers the
    NEXT boundary (ref ContinuousEventTimeTrigger: ts - ts%ivl + ivl);
    a watermark exactly equal to a boundary FIRES it (timers fire at
    wm >= t)."""
    import shutil
    import tempfile

    rows = [
        # first element exactly on boundary 20s → registers 40s, so the
        # 20s boundary never fires for this window
        ("a", 20 * S, 0, 1),
        # batch 1's max te = 50s, delay 10s → wm = 40s EXACTLY: the 40s
        # boundary must fire (>=, not >)
        ("a", 50 * S, 1, 2),
        # final batch far away so finals drain
        ("b", 200 * S, 2, 4),
    ]
    src = spark.createDataFrame(rows, "k string, te long, batch long, v long")
    work = tempfile.mkdtemp(prefix="fl_earlyfire_edge_")
    try:
        log = continuous_early_fire_log(
            spark, src, work,
            ts_col="te", batch_col="batch", keys=["k"], value_col="v",
            size_us=60 * S, interval_us=20 * S, delay_us=10 * S,
        )
        got = sorted(
            (r.k, r.window_start // S, r.fire_ts // S, r.fire_batch, r.cnt)
            for r in log.collect()
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
    assert got == sorted(
        [
            ("a", 0, 40, 1, 2),   # fired at wm == 40 exactly
            ("a", 0, 60, 2, 2),   # final (end-of-input)
            ("b", 180, 220, 2, 1),
            ("b", 180, 240, 2, 1),
        ]
    ), got


def test_early_fire_long_replay_compaction_equivalence(spark):
    """20-batch replay with an aggressive compaction window (every 4
    batches): the emission log must be IDENTICAL to a run whose state
    never compacts, and the accumulated state dir must stay bounded —
    the long-replay half of the state-growth policy (the retraction
    join half lives in tests/test_state_dir.py)."""
    import os

    rows = []
    for b in range(20):
        # two keys, event times advance ~15s per batch with jitter
        rows.append(("a", (b * 15 + 3) * S, b, b + 1))
        rows.append(("b", (b * 15 + 7) * S, b, 2 * b + 1))
    src = spark.createDataFrame(rows, "k string, te long, batch long, v long")

    def run(compact_every):
        work = tempfile.mkdtemp(prefix="fl_ef_long_")
        try:
            log = continuous_early_fire_log(
                spark, src, work,
                ts_col="te", batch_col="batch", keys=["k"], value_col="v",
                size_us=60 * S, interval_us=20 * S, delay_us=10 * S,
                compact_every=compact_every,
            )
            out = sorted(
                (r.k, r.window_start, r.fire_ts, r.fire_batch, r.fire_seq,
                 r.cnt, r.v_sum)
                for r in log.collect()
            )
            n_dirs = len(
                [d for d in os.listdir(f"{work}/acc") if d[0] in "bc"]
            )
            return out, n_dirs
        finally:
            shutil.rmtree(work, ignore_errors=True)

    compacted, dirs_compacted = run(compact_every=4)
    plain, dirs_plain = run(compact_every=1000)
    assert compacted == plain and len(plain) > 20
    assert dirs_plain == 20  # un-compacted: one dir per batch
    assert dirs_compacted <= 4  # bounded by the compaction window
