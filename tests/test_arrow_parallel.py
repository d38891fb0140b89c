"""Batch-parallel reads of a single Arrow IPC file
(sources/arrow_ipc.py::read_arrow_file_parallel): footer-exact splits —
no scanning, no false-positive hazard — so the invariants are parity
with the sequential read, partition fan-out, and the validate-before-
pandas segfault guard on corrupt batch bytes.
"""

from __future__ import annotations

import pytest


def _big_arrow_file(tmp_path, n=5000, chunk=100) -> str:
    import pyarrow as pa
    import pyarrow.ipc as ipc

    table = pa.table(
        {
            "id": pa.array(range(n), pa.int64()),
            "name": pa.array([f"n{i}" for i in range(n)]),
            "score": pa.array([i * 0.25 for i in range(n)], pa.float64()),
        }
    )
    path = str(tmp_path / "one_big.arrow")
    with pa.OSFile(path, "wb") as fh:
        with ipc.new_file(fh, table.schema) as w:
            w.write_table(table, max_chunksize=chunk)
    return path


def test_parallel_read_matches_sequential(spark, tmp_path):
    from my_flink_1_10_2_spark.sources.arrow_ipc import (
        decode_arrow_file,
        read_arrow_file_parallel,
    )

    path = _big_arrow_file(tmp_path)
    df = read_arrow_file_parallel(spark, path, batches_per_task=7)
    assert df.rdd.getNumPartitions() >= 7  # 50 batches / 7 -> 8 ranges
    got = sorted((r.id, r.name, r.score) for r in df.collect())
    seq = decode_arrow_file(path)
    want = sorted(zip(seq["id"], seq["name"], seq["score"]))
    assert got == want and len(got) == 5000


def test_parallel_read_empty_file(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.ipc as ipc

    from my_flink_1_10_2_spark.sources.arrow_ipc import read_arrow_file_parallel

    schema = pa.schema([("id", pa.int64())])
    path = str(tmp_path / "empty.arrow")
    with pa.OSFile(path, "wb") as fh:
        with ipc.new_file(fh, schema):
            pass
    df = read_arrow_file_parallel(spark, path)
    assert df.count() == 0 and df.columns == ["id"]


def test_parallel_read_rejects_corrupt_batch(spark, tmp_path):
    """A mutation the VALIDATED sequential decode rejects must also be
    rejected by the parallel path — a clean error either driver-side
    (footer damage) or task-side (batch-body damage through the
    validate-before-pandas guard), never a segfault or silent rows."""
    import random

    from my_flink_1_10_2_spark.sources.arrow_ipc import (
        decode_arrow_file,
        read_arrow_file_parallel,
    )

    path = _big_arrow_file(tmp_path, n=400, chunk=50)
    orig = open(path, "rb").read()
    rng = random.Random(9)
    found = None
    for _ in range(300):
        data = bytearray(orig)
        for _f in range(8):
            data[rng.randrange(64, len(data) - 8)] ^= 0xFF
        try:
            decode_arrow_file(bytes(data))
        except ValueError:
            found = bytes(data)
            break
    assert found is not None, "mutation search never produced a rejection"
    bad = str(tmp_path / "bad.arrow")
    open(bad, "wb").write(found)
    with pytest.raises(Exception) as exc_info:
        read_arrow_file_parallel(spark, bad, batches_per_task=2).collect()
    # PythonException (task-side ValueError) or a driver-side ValueError /
    # ArrowInvalid — all clean; the segfault path would kill pytest itself
    assert exc_info.value is not None
