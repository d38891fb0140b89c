"""Adversarial fuzz for the splittable Avro container reader.

Two hazards of marker-scanned split protocols (ref: flink-formats/
flink-avro/AvroInputFormat.java + Avro DataFileReader sync/pastSync):

1. FALSE SYNC — the 16 sync-marker bytes occur INSIDE block payload, so
   a split's boundary scan latches onto a non-boundary.  The writer's
   marker is content-derived (md5 of schema+path), so a test can embed
   the exact marker bytes in a row's data field.  Our reader validates
   scanned candidates structurally (`_plausible_block_at`) and skips
   false hits; vanilla Avro mis-parses here.  The invariant fuzzed:
   for ANY split layout, union(split reads) == sequential read, exactly.

2. MARKER STRADDLE — a split boundary landing on every single byte of a
   sync marker (and of the block header after it) in a multi-hundred-
   block file.  Ownership is by the marker's START offset, so each block
   must land in exactly one split for all 16+ cut positions.

Memory shape: the seek-based reader must NOT load the whole file per
split — checked by capping the window chunk and asserting the window
never grows past (largest block + chunk).
"""

from __future__ import annotations

import hashlib
import json
import os
import random

from my_flink_1_10_2_spark.sources import avro_py


SCHEMA = {
    "type": "record",
    "name": "fz",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "blob", "type": "bytes"},
    ],
}


def _expected_sync(schema: dict, path: str) -> bytes:
    schema_json = json.dumps(schema).encode("utf-8")
    return hashlib.md5(schema_json + path.encode("utf-8")).digest()


def _union_of_splits(path: str, bounds):
    got = []
    for lo, hi in zip(bounds, bounds[1:]):
        _, part = avro_py.read_container_split(path, lo, hi)
        got.extend(part)
    return got


def _payload_regions(path: str):
    """[(payload_start, payload_end)] absolute byte ranges of block data."""
    schema, codec, sync, header_len = avro_py.read_header(path)
    size = os.path.getsize(path)
    with open(path, "rb") as fh:
        data = fh.read()
    regions = []
    s = header_len - 16
    while s + 16 < size:
        pos = s + 16
        count, off = avro_py._read_long_at(data, pos)
        blen, off = avro_py._read_long_at(data, off)
        regions.append((off, off + blen))
        s = off + blen
        assert data[s : s + 16] == sync, "fixture walk broke"
    return regions


def _false_sync_positions(path: str) -> list:
    """Sync-marker byte occurrences strictly inside block payload."""
    _, _, sync, header_len = avro_py.read_header(path)
    with open(path, "rb") as fh:
        data = fh.read()
    regions = _payload_regions(path)
    hits = []
    i = data.find(sync)
    while i >= 0:
        if any(lo <= i and i + 16 <= hi for lo, hi in regions):
            hits.append(i)
        i = data.find(sync, i + 1)
    return hits


def test_false_sync_inside_payload_all_codecs(tmp_path):
    """Embed the file's own sync marker inside row data for every codec
    and fuzz split layouts: the union must stay exact.  Incompressible
    random bytes around the marker make snappy/deflate/zstd emit it as a
    literal run; for codecs whose transform destroys it (bzip2/xz may),
    the trial still fuzzes marker-adjacent layouts — we assert at least
    the null-codec trials actually contain a false sync."""
    rng = random.Random(1010)
    confirmed_false_sync = 0
    for codec in avro_py.CODECS:
        p = str(tmp_path / f"fs_{codec}.avro")
        sync = _expected_sync(SCHEMA, p)
        rows = []
        for i in range(403):
            if i % 7 == 3:
                # marker embedded mid-blob, flanked by incompressible noise
                blob = rng.randbytes(11) + sync + rng.randbytes(13)
            else:
                blob = rng.randbytes(rng.randint(0, 40))
            rows.append({"id": i, "blob": blob})
        avro_py.write_container(p, SCHEMA, rows, codec=codec, sync_interval=17)
        hits = _false_sync_positions(p)
        if codec == "null":
            assert hits, "null codec must carry the embedded marker verbatim"
        if hits:
            confirmed_false_sync += 1
        size = os.path.getsize(p)
        # sequential read is the ground truth
        _, seq = avro_py.read_container(p)
        assert seq == rows
        # fuzz random split layouts + layouts cutting AT each false sync
        for trial in range(25):
            n_cuts = rng.randint(1, 10)
            cuts = sorted(rng.sample(range(1, size), min(n_cuts, size - 1)))
            bounds = [0, *cuts, size]
            assert _union_of_splits(p, bounds) == rows, (codec, trial, cuts)
        for fpos in hits[:8]:
            for delta in (-1, 0, 1, 8, 15, 16):
                cut = min(max(fpos + delta, 1), size - 1)
                assert _union_of_splits(p, [0, cut, size]) == rows, (codec, fpos, delta)
    # the hazard must actually have been exercised beyond the null codec
    assert confirmed_false_sync >= 2, "fuzz never produced a payload collision"


def test_splits_on_every_byte_of_marker_straddle(tmp_path):
    """Multi-hundred-block file; a two-way split whose boundary lands on
    EVERY byte offset across a sync marker and the block header after it
    must still union exactly (ownership by marker START offset)."""
    p = str(tmp_path / "straddle.avro")
    rows = [{"id": i, "blob": bytes([i % 251]) * (i % 23)} for i in range(1201)]
    avro_py.write_container(p, SCHEMA, rows, codec="deflate", sync_interval=4)
    size = os.path.getsize(p)
    schema, codec, sync, header_len = avro_py.read_header(p)
    with open(p, "rb") as fh:
        data = fh.read()
    # exact sync positions via block-length walk (not byte scan)
    syncs = []
    s = header_len - 16
    while s + 16 < size:
        syncs.append(s)
        pos = s + 16
        count, off = avro_py._read_long_at(data, pos)
        blen, off = avro_py._read_long_at(data, off)
        s = off + blen
    syncs.append(s)
    assert len(syncs) > 300, "fixture must be multi-hundred-block"
    # every byte of a sample of markers (incl. first, last, middles)
    sample = [syncs[0], syncs[1], syncs[len(syncs) // 2], syncs[-2], syncs[-1]]
    for sp in sample:
        for cut in range(max(sp - 2, 1), min(sp + 22, size - 1) + 1):
            got = _union_of_splits(p, [0, cut, size])
            assert got == rows, (sp, cut)


def test_split_window_memory_is_bounded(tmp_path, monkeypatch):
    """The seek-based reader must stream, not slurp: with a tiny chunk
    size, the window never grows past (largest block + one chunk), and
    a tail split never reads bytes before its first owned sync."""
    p = str(tmp_path / "mem.avro")
    rows = [{"id": i, "blob": bytes(range(256)) * 4} for i in range(2000)]
    avro_py.write_container(p, SCHEMA, rows, codec="null", sync_interval=100)
    size = os.path.getsize(p)

    max_window = 0
    orig_ensure = avro_py._SplitWindow.ensure

    def spy_ensure(self, upto_abs):
        nonlocal max_window
        out = orig_ensure(self, upto_abs)
        max_window = max(max_window, len(self.buf))
        return out

    monkeypatch.setattr(avro_py._SplitWindow, "ensure", spy_ensure)
    monkeypatch.setattr(avro_py._SplitWindow, "CHUNK", 1 << 16)

    bounds = list(range(0, size, size // 7)) + [size]
    bounds = sorted(set(bounds))
    got = _union_of_splits(p, bounds)
    assert got == rows
    # largest block ≈ 100 rows × ~1 KiB ≈ 103 KiB; chunk 64 KiB; window
    # must stay well under the ~1.2 MiB whole file
    assert max_window < (300 << 10), f"window grew to {max_window} bytes"


def test_scan_rejects_candidate_then_finds_real_sync(tmp_path):
    """Directed case: a split that starts just before a false sync must
    skip it and decode from the next REAL marker — no crash, no dupes."""
    rng = random.Random(77)
    p = str(tmp_path / "directed.avro")
    sync = _expected_sync(SCHEMA, p)
    rows = [
        {"id": i, "blob": (rng.randbytes(9) + sync + rng.randbytes(9)) if i == 5 else b"x" * 6}
        for i in range(60)
    ]
    avro_py.write_container(p, SCHEMA, rows, codec="null", sync_interval=10)
    hits = _false_sync_positions(p)
    assert hits, "null-codec container must contain the embedded marker"
    size = os.path.getsize(p)
    for fpos in hits:
        a = avro_py.read_container_split(p, 0, fpos - 3)[1]
        b = avro_py.read_container_split(p, fpos - 3, size)[1]
        assert a + b == rows
