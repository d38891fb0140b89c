"""Corruption fuzz for the training-export container READERS not covered
by tests/test_codec_corruption_fuzz.py: Arrow IPC, .npy, WebDataset tar
framing, .jsonl.zst.  Same contract as the codec program: fed
truncations, bit flips, and spliced garbage, the per-shard decode must
either raise a clean ValueError-family error or return a WELL-FORMED
result — never hang, never crash the interpreter, never return silently
malformed shapes.  At 100 TB scan volumes corrupted shards are a
certainty.

Each reader's per-shard unit is a module-level pure function
(decode_arrow_file / read_npy / parse_tar_samples / decode_jsonl_zst)
used verbatim by the distributed mapInPandas path, so this fuzz covers
the exact production code.
"""

from __future__ import annotations

import io
import random
import struct
import tarfile

import pytest

from my_flink_1_10_2_spark.sources.arrow_ipc import decode_arrow_file
from my_flink_1_10_2_spark.sources.jsonl_zst import decode_jsonl_zst
from my_flink_1_10_2_spark.sources.npy_shards import read_npy, write_npy
from my_flink_1_10_2_spark.sources.webdataset import parse_tar_samples

OK_ERRORS = (ValueError, NotImplementedError, KeyError, IndexError,
             EOFError, OverflowError, struct.error)

N_MUTATIONS = 150


def _mutations(rng: random.Random, payload: bytes, n: int):
    for _ in range(n):
        mode = rng.random()
        if mode < 0.4 and len(payload) > 1:  # truncate
            yield payload[: rng.randrange(len(payload))]
        elif mode < 0.8:  # flip a byte
            b = bytearray(payload)
            b[rng.randrange(len(b))] ^= 1 << rng.randrange(8)
            yield bytes(b)
        else:  # splice garbage into the middle
            at = rng.randrange(len(payload))
            junk = bytes(rng.randrange(256) for _ in range(rng.randint(1, 9)))
            yield payload[:at] + junk + payload[at:]


def _check(decode, payload, validate):
    try:
        out = decode(payload)
    except OK_ERRORS:
        return
    validate(out)


# ---------------------------------------------------------------------------
# fixtures: one small VALID shard per format


def _arrow_payload() -> bytes:
    import pyarrow as pa
    import pyarrow.ipc as ipc

    table = pa.table(
        {
            "id": pa.array(range(40), pa.int64()),
            "name": pa.array([f"n{i}" for i in range(40)]),
            "score": pa.array([i * 0.5 for i in range(40)], pa.float64()),
        }
    )
    sink = pa.BufferOutputStream()
    with ipc.new_file(sink, table.schema) as w:
        w.write_table(table, max_chunksize=16)
    return sink.getvalue().to_pybytes()


def _npy_payload(rng: random.Random) -> bytes:
    import numpy as np

    arr = np.arange(60, dtype=np.float32).reshape(12, 5)
    arr += rng.random()
    fh = io.BytesIO()
    write_npy(fh, arr)
    return fh.getvalue()


def _tar_payload() -> bytes:
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tar:
        for i in range(12):
            for ext, data in (
                ("txt", f"document body {i}".encode()),
                ("cls", str(i % 3).encode()),
            ):
                ti = tarfile.TarInfo(name=f"{i:06d}.{ext}")
                ti.size = len(data)
                ti.mtime = 0
                tar.addfile(ti, io.BytesIO(data))
    return buf.getvalue()


def _jsonl_zst_payload() -> bytes:
    import pyarrow as pa

    lines = "".join(
        f'{{"doc_id": {i}, "score": {i * 0.25}, "lang": "l{i % 4}"}}\n'
        for i in range(50)
    ).encode("utf-8")
    sink = pa.BufferOutputStream()
    with pa.output_stream(sink, compression="zstd") as z:
        z.write(lines)
    return sink.getvalue().to_pybytes()


# ---------------------------------------------------------------------------
# fuzz legs


def test_arrow_ipc_corruption():
    rng = random.Random(2200)
    payload = _arrow_payload()
    want_cols = {"id", "name", "score"}

    def validate(out):
        assert set(out.columns) == want_cols
        assert out.shape[0] >= 0  # pandas guarantees rectangular

    for mut in _mutations(rng, payload, N_MUTATIONS):
        _check(lambda b: decode_arrow_file(b), mut, validate)


def test_npy_corruption():
    import numpy as np

    rng = random.Random(2201)
    payload = _npy_payload(rng)

    def decode(b):
        return read_npy(io.BytesIO(b))

    def validate(out):
        # whatever decodes must be internally consistent: a real ndarray
        # whose buffer length matches its claimed shape x itemsize
        assert isinstance(out, np.ndarray)
        assert out.nbytes == out.size * out.itemsize

    for mut in _mutations(rng, payload, N_MUTATIONS):
        _check(decode, mut, validate)


def test_webdataset_tar_corruption():
    rng = random.Random(2202)
    payload = _tar_payload()
    exts = ["txt", "cls"]

    def decode(b):
        return parse_tar_samples(b, exts)

    def validate(out):
        assert isinstance(out, dict)
        for stem, members in out.items():
            assert isinstance(stem, str)
            for ext, data in members.items():
                assert ext in exts
                assert isinstance(data, bytes)

    for mut in _mutations(rng, payload, N_MUTATIONS):
        _check(decode, mut, validate)


def test_jsonl_zst_corruption():
    rng = random.Random(2203)
    payload = _jsonl_zst_payload()
    spec = {"doc_id": "long", "score": "double", "lang": "string"}

    def decode(b):
        return decode_jsonl_zst(b, spec)

    def validate(out):
        assert set(out) == set(spec)
        lens = {len(v) for v in out.values()}
        assert len(lens) == 1  # rectangular columns

    for mut in _mutations(rng, payload, N_MUTATIONS):
        _check(decode, mut, validate)


# ---------------------------------------------------------------------------
# the clean shards must still decode exactly (fixture sanity)


def test_fixtures_decode_clean():
    import numpy as np

    rng = random.Random(2204)
    out = decode_arrow_file(_arrow_payload())
    assert out.shape == (40, 3) and list(out["id"])[:3] == [0, 1, 2]

    arr = read_npy(io.BytesIO(_npy_payload(rng)))
    assert arr.shape == (12, 5) and arr.dtype == np.float32

    samples = parse_tar_samples(_tar_payload(), ["txt", "cls"])
    assert len(samples) == 12
    assert samples["000003"]["cls"] == b"0"

    cols = decode_jsonl_zst(
        _jsonl_zst_payload(), {"doc_id": "long", "score": "double", "lang": "string"}
    )
    assert len(cols["doc_id"]) == 50 and cols["lang"][5] == "l1"


def test_warc_gz_split_corruption(tmp_path):
    """The splittable .warc.gz reader under mutation: the authoritative
    chained path (split starting at 0) must raise cleanly on damage;
    scanning splits may skip damaged regions (heuristic by design) but
    must never hang, crash, or yield malformed records."""
    import os

    from my_flink_1_10_2_spark.sources.warc import (
        _gzip_member,
        encode_warc_record,
        read_warc_gz_split,
    )

    rng = random.Random(2205)
    recs = [
        encode_warc_record(
            "conversion",
            f"{i:08d}-0000-0000-0000-000000000000",
            "2026-01-01T00:00:00Z",
            bytes(rng.randrange(256) for _ in range(rng.randint(5, 80))),
        )
        for i in range(25)
    ]
    payload = b"".join(_gzip_member(r) for r in recs)

    def validate(out):
        assert isinstance(out, list)
        for headers, body in out:
            assert isinstance(headers, dict) and isinstance(body, bytes)
            assert int(headers["Content-Length"]) == len(body)

    k = 0
    for mut in _mutations(rng, payload, N_MUTATIONS):
        p = str(tmp_path / f"m{k}.warc.gz")
        k += 1
        open(p, "wb").write(mut)
        size = os.path.getsize(p)
        _check(lambda _b: read_warc_gz_split(p, 0, size), mut, validate)
        cut = rng.randrange(1, max(size, 2))
        _check(lambda _b: read_warc_gz_split(p, cut, size), mut, validate)
