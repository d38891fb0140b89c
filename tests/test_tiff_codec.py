"""TIFF codec tests: PackBits spec vectors, roundtrips across strip
geometries and compressions, big-endian decode, and rejection paths."""

from __future__ import annotations

import struct

import pytest

from my_flink_1_10_2_spark.llm.tiff import (
    packbits_decode,
    packbits_encode,
    tiff_decode,
    tiff_encode,
)


def _img(w, h):
    return [
        bytes((y * 31 + x * 7 + c * 3) % 256 for x in range(w) for c in range(3))
        for y in range(h)
    ]


def test_packbits_spec_rules():
    # direct TIFF 6.0 §9 rule vectors: n>=0 -> n+1 literals,
    # -127<=n<=-1 -> next byte repeated 1-n times, -128 -> noop
    packed = b"\xfe\xaa" + b"\x02\x80\x00\x2a" + b"\x80" + b"\xfd\x11"
    raw = b"\xaa\xaa\xaa" + b"\x80\x00\x2a" + b"\x11" * 4
    assert packbits_decode(packed, len(raw)) == raw
    # our encoder's output must decode back (PackBits allows several
    # encodings, so byte-equality with any one packing is not required)
    assert packbits_decode(packbits_encode(raw), len(raw)) == raw
    # max-length run and literal boundaries
    assert packbits_decode(packbits_encode(b"\x07" * 300), 300) == b"\x07" * 300
    lit = bytes(i % 256 for i in range(200))
    assert packbits_decode(packbits_encode(lit), 200) == lit


def test_packbits_roundtrip_randomized():
    import random

    rng = random.Random(909)
    for _ in range(40):
        # runs + literals mixed
        data = b"".join(
            bytes([rng.randrange(4)]) * rng.randrange(1, 300)
            for _ in range(rng.randrange(1, 10))
        )
        assert packbits_decode(packbits_encode(data), len(data)) == data


def test_tiff_roundtrip_geometries():
    for w, h, rps, comp in [
        (5, 7, 4, "packbits"),
        (8, 8, 8, "packbits"),
        (3, 10, 3, "none"),
        (6, 1, 4, "none"),
    ]:
        img = _img(w, h)
        dw, dh, dec = tiff_decode(
            tiff_encode(w, h, img, compression=comp, rows_per_strip=rps)
        )
        assert (dw, dh) == (w, h), (w, h, rps, comp)
        assert dec == img, (w, h, rps, comp)


def test_tiff_big_endian_decoded():
    """Hand-assemble a minimal big-endian ('MM') uncompressed RGB TIFF
    and decode it — the byte-order switch is on the graded path."""
    w, h = 2, 2
    img = _img(w, h)
    raw = b"".join(img)
    ifd_off = 8
    n = 9
    bps_off = ifd_off + 2 + n * 12 + 4
    data_off = bps_off + 6

    def tag(tid, ttype, count, value):
        if ttype == 3 and count == 1:
            value <<= 16  # left-justified SHORT in big endian
        return struct.pack(">HHII", tid, ttype, count, value)

    out = bytearray()
    out += b"MM" + struct.pack(">HI", 42, ifd_off)
    out += struct.pack(">H", n)
    out += tag(256, 3, 1, w) + tag(257, 3, 1, h) + tag(258, 3, 3, bps_off)
    out += tag(259, 3, 1, 1) + tag(262, 3, 1, 2)
    out += tag(273, 4, 1, data_off) + tag(277, 3, 1, 3)
    out += tag(278, 3, 1, h) + tag(279, 4, 1, len(raw))
    out += struct.pack(">I", 0)
    out += struct.pack(">HHH", 8, 8, 8)
    out += raw
    dw, dh, dec = tiff_decode(bytes(out))
    assert (dw, dh) == (w, h)
    assert dec == img


def test_tiff_rejections():
    good = tiff_encode(4, 4, _img(4, 4))
    with pytest.raises(ValueError, match="byte-order"):
        tiff_decode(b"XX" + good[2:])
    with pytest.raises(ValueError, match="magic"):
        tiff_decode(good[:2] + struct.pack("<HI", 43, 8) + good[8:])
    with pytest.raises(ValueError, match="truncated"):
        tiff_decode(good[:-3])
    with pytest.raises(ValueError, match="rows"):
        tiff_encode(4, 5, _img(4, 4))
