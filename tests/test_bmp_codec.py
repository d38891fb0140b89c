"""BMP codec tests: roundtrips across padding widths, top-down vs
bottom-up storage, and malformed-stream rejection."""

from __future__ import annotations

import struct

import pytest

from my_flink_1_10_2_spark.llm.bmp import bmp_decode, bmp_encode


def _img(w, h):
    return [
        bytes((y * w + x + c) % 256 for x in range(w) for c in (0, 85, 170))
        for y in range(h)
    ]


def test_roundtrip_all_padding_widths():
    # width % 4 in {0..3} exercises every row-padding case
    for w in (4, 5, 6, 7):
        img = _img(w, 3)
        dw, dh, dec = bmp_decode(bmp_encode(w, 3, img))
        assert (dw, dh) == (w, 3)
        assert dec == img


def test_topdown_negative_height_decoded():
    w, h = 5, 4
    img = _img(w, h)
    payload = bytearray(bmp_encode(w, h, img))
    # rewrite as top-down: negate height, reverse the stored row order
    stride = (w * 3 + 3) // 4 * 4
    off = 54
    rows = [payload[off + i * stride : off + (i + 1) * stride] for i in range(h)]
    struct.pack_into("<i", payload, 22, -h)
    payload[off:] = b"".join(reversed(rows))
    dw, dh, dec = bmp_decode(bytes(payload))
    assert (dw, dh) == (w, h)
    assert dec == img


def test_rejects_malformed():
    good = bmp_encode(4, 2, _img(4, 2))
    with pytest.raises(ValueError, match="magic"):
        bmp_decode(b"XX" + good[2:])
    with pytest.raises(ValueError, match="truncated"):
        bmp_decode(good[:-4])
    with pytest.raises(ValueError, match="rows"):
        bmp_encode(4, 3, _img(4, 2))
    with pytest.raises(ValueError, match="row has"):
        bmp_encode(4, 2, [b"\x00" * 12, b"\x00" * 11])
    bad = bytearray(good)
    struct.pack_into("<H", bad, 28, 8)  # bpp=8
    with pytest.raises(NotImplementedError, match="24-bit"):
        bmp_decode(bytes(bad))
