"""Splittable multi-member .warc.gz reads (sources/warc.py::
read_warc_gz_split / read_warc_gz) — the Common Crawl single-huge-file
layout.  Same invariants as the splittable Avro fuzz
(tests/test_avro_split_fuzz.py): for ANY split layout the union of
split reads equals the sequential read exactly; gzip-magic bytes
colliding with compressed payload (the false-sync hazard) are skipped
by structural validation; chained member offsets are authoritative, so
corruption there raises instead of silently dropping records.
"""

from __future__ import annotations

import gzip
import io
import os
import random

import pytest

from my_flink_1_10_2_spark.sources.warc import (
    _GZ_MAGIC,
    _gzip_member,
    decode_warc_records,
    encode_warc_record,
    read_warc_gz,
    read_warc_gz_split,
)


def _make_warc_gz(tmp_path, records, name="crawl.warc.gz") -> str:
    p = str(tmp_path / name)
    with open(p, "wb") as fh:
        for rec in records:
            fh.write(_gzip_member(rec))
    return p


def _records(rng: random.Random, n: int, payload=None):
    out = []
    for i in range(n):
        body = payload(i) if payload else f"text of record {i} ".encode() * (
            1 + i % 7
        )
        out.append(
            encode_warc_record(
                "conversion",
                f"{i:08d}-0000-0000-0000-000000000000",
                "2026-01-01T00:00:00Z",
                body,
                {"WARC-Target-URI": f"https://example.com/{i}"},
            )
        )
    return out


def _union(path, bounds):
    got = []
    for lo, hi in zip(bounds, bounds[1:]):
        got.extend(read_warc_gz_split(path, lo, hi))
    return got


def test_split_union_matches_sequential(tmp_path):
    rng = random.Random(3300)
    recs = _records(rng, 120)
    p = _make_warc_gz(tmp_path, recs)
    size = os.path.getsize(p)
    full = read_warc_gz_split(p, 0, size)
    assert len(full) == 120
    assert [h["WARC-Record-ID"] for h, _ in full] == [
        f"<urn:uuid:{i:08d}-0000-0000-0000-000000000000>" for i in range(120)
    ]
    for trial in range(40):
        n_cuts = rng.randint(1, 10)
        cuts = sorted(rng.sample(range(1, size), min(n_cuts, size - 1)))
        got = _union(p, [0, *cuts, size])
        assert got == full, f"trial {trial}: cuts {cuts}"


def test_splits_on_every_byte_of_member_boundaries(tmp_path):
    rng = random.Random(3301)
    recs = _records(rng, 30)
    p = _make_warc_gz(tmp_path, recs)
    size = os.path.getsize(p)
    full = read_warc_gz_split(p, 0, size)
    # exact member offsets from the writer
    offs, pos = [], 0
    for rec in recs:
        offs.append(pos)
        pos += len(_gzip_member(rec))
    for boundary in (offs[1], offs[len(offs) // 2], offs[-1]):
        for cut in range(max(boundary - 4, 1), min(boundary + 5, size - 1) + 1):
            got = _union(p, [0, cut, size])
            assert got == full, (boundary, cut)


def _gzip_member_stored(data: bytes) -> bytes:
    """Level-0 gzip member: DEFLATE stored blocks copy the payload
    VERBATIM, so magic bytes inside it land in the compressed stream —
    the guaranteed-collision fixture (default-level members entropy-code
    literals, which usually destroys the pattern)."""
    buf = io.BytesIO()
    with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0, compresslevel=0) as gz:
        gz.write(data)
    return buf.getvalue()


def test_false_magic_inside_compressed_payload(tmp_path):
    """Payloads carrying the gzip magic, stored verbatim by level-0
    members: scanning splits must validate-and-skip those hits."""
    rng = random.Random(3302)

    def payload(i):
        return (
            rng.randbytes(40) + _GZ_MAGIC + rng.randbytes(8)
            + _GZ_MAGIC + rng.randbytes(40)
        )

    recs = _records(rng, 60, payload=payload)
    p = str(tmp_path / "stored.warc.gz")
    with open(p, "wb") as fh:
        for rec in recs:
            fh.write(_gzip_member_stored(rec))
    size = os.path.getsize(p)
    data = open(p, "rb").read()
    # member offsets (truth from the writer)
    offs, pos = set(), 0
    for rec in recs:
        offs.add(pos)
        pos += len(_gzip_member_stored(rec))
    false_hits = []
    i = data.find(_GZ_MAGIC)
    while i >= 0:
        if i not in offs:
            false_hits.append(i)
        i = data.find(_GZ_MAGIC, i + 1)
    assert false_hits, "fixture must contain magic collisions"
    full = read_warc_gz_split(p, 0, size)
    assert len(full) == 60
    # cuts right at / around each false hit
    for fpos in false_hits[:10]:
        for delta in (-1, 0, 1, 2):
            cut = min(max(fpos + delta, 1), size - 1)
            assert _union(p, [0, cut, size]) == full, (fpos, delta)
    # and random layouts
    for trial in range(20):
        cuts = sorted(rng.sample(range(1, size), rng.randint(1, 8)))
        assert _union(p, [0, *cuts, size]) == full, trial


def test_corrupt_chained_member_raises(tmp_path):
    rng = random.Random(3303)
    recs = _records(rng, 10)
    p = _make_warc_gz(tmp_path, recs)
    data = bytearray(open(p, "rb").read())
    # flip a byte mid-file, well inside a member body (not at offset 0)
    data[len(data) // 2] ^= 0x40
    bad = str(tmp_path / "bad.warc.gz")
    open(bad, "wb").write(bytes(data))
    with pytest.raises(ValueError):
        read_warc_gz_split(bad, 0, len(data))


def test_not_gzip_raises(tmp_path):
    p = str(tmp_path / "nope.warc.gz")
    open(p, "wb").write(b"plainly not gzip")
    with pytest.raises(ValueError):
        read_warc_gz_split(p, 0, 16)


def test_spark_read_warc_gz_is_splittable(spark, tmp_path):
    rng = random.Random(3304)
    recs = _records(rng, 200)
    p = _make_warc_gz(tmp_path, recs)
    size = os.path.getsize(p)
    df = read_warc_gz(spark, p, split_bytes=max(size // 9, 1))
    assert df.rdd.getNumPartitions() >= 8
    rows = df.collect()
    assert len(rows) == 200
    assert sorted(r.target_uri for r in rows) == sorted(
        f"https://example.com/{i}" for i in range(200)
    )
    assert all(r.warc_type == "conversion" for r in rows)
    # type filter drops everything when no record matches
    assert read_warc_gz(
        spark, p, split_bytes=size, warc_types=("response",)
    ).count() == 0


def test_tiny_chunk_carry_at_member_boundaries(tmp_path, monkeypatch):
    """With a tiny decompress chunk the carried tail at a member
    boundary is often 1-2 bytes — shorter than the gzip magic — which
    must fall back to a file peek, not false-reject the boundary; and
    chained decodes must stay exact for every cut."""
    import functools

    from my_flink_1_10_2_spark.sources import warc as W

    rng = random.Random(5)
    recs = _records(rng, 50, payload=lambda i: rng.randbytes(rng.randint(10, 200)))
    p = _make_warc_gz(tmp_path, recs)
    size = os.path.getsize(p)
    full = read_warc_gz_split(p, 0, size)
    assert len(full) == 50
    monkeypatch.setattr(
        W, "_try_member_at", functools.partial(W._try_member_at, chunk=37)
    )
    for cut in range(1, size, 211):
        got = W.read_warc_gz_split(p, 0, cut) + W.read_warc_gz_split(p, cut, size)
        assert got == full, cut
