"""zstd SEEKABLE format for .jsonl.zst (public spec: facebook/zstd
contrib/seekable_format): independent frames + trailing skippable-frame
seek table.  Invariants: the seek table is exact (offsets/sizes cover
the data region); frame-range parallel reads equal the sequential read;
a seekable file is STILL a valid plain .jsonl.zst (skippable frames are
ignored by conforming decoders — interop pinned against pyarrow);
corrupt frames and mangled tables raise cleanly.
"""

from __future__ import annotations

import json
import os
import random
import struct

import pytest

from my_flink_1_10_2_spark.sources.jsonl_zst import (
    _SEEK_FOOT_MAGIC,
    decode_jsonl_zst,
    read_jsonl_zst_seekable,
    read_zstd_seek_table,
    write_jsonl_zst_seekable,
)


def _lines(n):
    for i in range(n):
        yield (
            json.dumps(
                {"doc_id": i, "score": i * 0.25, "lang": f"l{i % 5}"},
                sort_keys=True,
                separators=(",", ":"),
            ).encode() + b"\n"
        )


SPEC = {"doc_id": "long", "score": "double", "lang": "string"}


def test_seek_table_roundtrip_and_exactness(tmp_path):
    p = str(tmp_path / "seek.jsonl.zst")
    n_frames, raw = write_jsonl_zst_seekable(_lines(1000), p, lines_per_frame=64)
    assert n_frames == -(-1000 // 64)
    table = read_zstd_seek_table(p)
    assert len(table) == n_frames
    # offsets contiguous from 0; decompressed sizes sum to raw bytes
    off = 0
    for o, c, d in table:
        assert o == off
        off += c
    assert sum(d for _, _, d in table) == raw


def test_plain_reader_interop(tmp_path):
    """A seekable file must parse with the ORDINARY whole-file reader —
    skippable frames are transparent to conforming zstd decoders."""
    p = str(tmp_path / "interop.jsonl.zst")
    write_jsonl_zst_seekable(_lines(300), p, lines_per_frame=50)
    cols = decode_jsonl_zst(p, SPEC)
    assert cols["doc_id"] == list(range(300))
    assert cols["lang"][7] == "l2"


def test_parallel_read_matches_sequential(spark, tmp_path):
    p = str(tmp_path / "par.jsonl.zst")
    write_jsonl_zst_seekable(_lines(1200), p, lines_per_frame=48)
    df = read_jsonl_zst_seekable(spark, p, SPEC, frames_per_task=3)
    assert df.rdd.getNumPartitions() >= 8
    rows = sorted((r.doc_id, r.score, r.lang) for r in df.collect())
    want = sorted((i, i * 0.25, f"l{i % 5}") for i in range(1200))
    assert rows == want


def test_frames_break_on_line_boundaries(tmp_path):
    """Each frame must decode to whole JSON lines (no line straddles a
    frame boundary), so any frame subset is independently parseable."""
    import pyarrow as pa

    p = str(tmp_path / "bound.jsonl.zst")
    write_jsonl_zst_seekable(_lines(500), p, lines_per_frame=37)
    codec = pa.Codec("zstd")
    with open(p, "rb") as fh:
        for off, csize, dsize in read_zstd_seek_table(p):
            fh.seek(off)
            text = codec.decompress(fh.read(csize), decompressed_size=dsize,
                                    asbytes=True)
            assert text.endswith(b"\n")
            for line in text.splitlines():
                json.loads(line)


def test_corruption_raises_cleanly(tmp_path):
    rng = random.Random(88)
    p = str(tmp_path / "ok.jsonl.zst")
    write_jsonl_zst_seekable(_lines(200), p, lines_per_frame=40)
    orig = open(p, "rb").read()
    table = read_zstd_seek_table(p)
    # (a) corrupt a frame body: parallel read must raise, not segfault
    bad = bytearray(orig)
    off, csize, _ = table[2]
    bad[off + csize // 2] ^= 0xFF
    pb = str(tmp_path / "badframe.jsonl.zst")
    open(pb, "wb").write(bytes(bad))
    with pytest.raises(Exception):
        import pyarrow as pa

        codec = pa.Codec("zstd")
        with open(pb, "rb") as fh:
            for o, c, d in read_zstd_seek_table(pb):
                fh.seek(o)
                codec.decompress(fh.read(c), decompressed_size=d, asbytes=True)
    # (b) mangled footer magic: ValueError, and random tail mutations
    bad2 = bytearray(orig)
    bad2[-1] ^= 0x01
    pt = str(tmp_path / "badtable.jsonl.zst")
    open(pt, "wb").write(bytes(bad2))
    with pytest.raises(ValueError):
        read_zstd_seek_table(pt)
    for _ in range(60):
        m = bytearray(orig)
        i = rng.randrange(max(len(m) - 60, 0), len(m))
        m[i] ^= 1 << rng.randrange(8)
        pm = str(tmp_path / "mut.jsonl.zst")
        open(pm, "wb").write(bytes(m))
        try:
            t = read_zstd_seek_table(pm)
            # parsed despite mutation: table must still be self-consistent
            assert all(c >= 0 and d >= 0 for _, c, d in t)
        except (ValueError, struct.error):
            pass


def test_no_seek_table_raises(tmp_path):
    import pyarrow as pa

    p = str(tmp_path / "plain.jsonl.zst")
    with pa.output_stream(p, compression="zstd") as fh:
        for line in _lines(10):
            fh.write(line)
    with pytest.raises(ValueError):
        read_zstd_seek_table(p)


def test_empty_input(spark, tmp_path):
    p = str(tmp_path / "empty.jsonl.zst")
    n_frames, raw = write_jsonl_zst_seekable(iter([]), p)
    assert (n_frames, raw) == (0, 0)
    assert read_zstd_seek_table(p) == []
    assert read_jsonl_zst_seekable(spark, p, SPEC).count() == 0


def test_byte_budget_flush_and_oversized_lines(tmp_path):
    """A frame flushes once its raw size reaches max_frame_bytes even
    before the line count does; a single line over the budget becomes
    one oversized frame (still valid); every frame stays line-aligned."""
    p = str(tmp_path / "budget.jsonl.zst")

    def lines():
        for i in range(30):
            body = "x" * (4000 if i % 7 else 50_000)
            yield (json.dumps({"doc_id": i, "t": body}).encode() + b"\n")

    n_frames, raw = write_jsonl_zst_seekable(
        lines(), p, lines_per_frame=1000, max_frame_bytes=60_000
    )
    table = read_zstd_seek_table(p)
    assert len(table) == n_frames > 1
    assert sum(d for _, _, d in table) == raw
    # no decompressed frame is wildly past budget + one max line
    assert max(d for _, _, d in table) <= 60_000 + 55_000
    cols = decode_jsonl_zst(p, {"doc_id": "long"})
    assert cols["doc_id"] == list(range(30))


def test_type_impossible_value_raises_valueerror_both_paths(spark, tmp_path):
    """Both readers share one line-decode helper, so a type-impossible
    field (a list in a 'long' column) must raise ValueError — not a raw
    TypeError — in the seekable path exactly as in the shard path."""
    import pyarrow as pa

    from my_flink_1_10_2_spark.sources.jsonl_zst import decode_jsonl_zst

    p = str(tmp_path / "bad.jsonl.zst")
    lines = [json.dumps({"i": [1, 2], "s": "x"})]
    write_jsonl_zst_seekable(
        (ln.encode() + b"\n" for ln in lines), p, lines_per_frame=8
    )
    # executor-side ValueError surfaces wrapped in PythonException; the
    # contract is the normalized "not coercible" ValueError message
    with pytest.raises(Exception, match="not coercible"):
        read_jsonl_zst_seekable(spark, p, {"i": "long", "s": "string"}).collect()
    # shard path: same contract on the same payload
    buf = pa.BufferOutputStream()
    with pa.output_stream(buf, compression="zstd") as z:
        z.write(("\n".join(lines) + "\n").encode())
    with pytest.raises(ValueError, match="not coercible"):
        decode_jsonl_zst(buf.getvalue().to_pybytes(), {"i": "long", "s": "string"})
