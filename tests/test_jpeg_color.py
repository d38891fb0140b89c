"""Baseline color JPEG (llm/jpeg_color.py): YCbCr 4:4:4 / 4:2:0 MCU
interleave, per-component predictors and tables, chroma resampling, and
the quant-exact color-tile contract."""

from __future__ import annotations

import numpy as np
import pytest

from my_flink_1_10_2_spark.llm.jpeg_color import (
    jpeg_decode_color,
    jpeg_encode_color,
    rgb_to_ycbcr,
    ycbcr_to_rgb,
)


def _const_tiles(width, height, tile, levels):
    """Plane of constant `tile`x`tile` squares cycling over `levels`."""
    tw = -(-width // tile)
    return bytes(
        levels[((yy // tile) * tw + (xx // tile)) % len(levels)]
        for yy in range(height)
        for xx in range(width)
    )


def test_color_420_quant_exact_tiles_roundtrip_bit_exact():
    """Constant 16x16 tiles with per-channel quant-exact levels: Y even
    multiples (DC step 16 after x8 scaling needs 8*(v-128) % 16 == 0 →
    even v), chroma multiples where 8*(v-128) % 17 == 0 (v = 128 ± 17k
    since gcd(8,17)=1).  Bit-exact through 4:2:0 because every 2x2 box
    average of a constant is the constant."""
    w, h = 48, 32
    y_levels = [2 * ((11 * t) % 128) for t in range(6)]
    c_levels = [128 + 17 * k for k in (-6, -3, 0, 2, 5, 7)]
    y = _const_tiles(w, h, 16, y_levels)
    cb = _const_tiles(w, h, 16, c_levels)
    cr = _const_tiles(w, h, 16, list(reversed(c_levels)))
    payload = jpeg_encode_color(w, h, y, cb, cr, subsampling="4:2:0")
    dw, dh, dy, dcb, dcr = jpeg_decode_color(payload)
    assert (dw, dh) == (w, h)
    assert dy == y and dcb == cb and dcr == cr


def test_color_444_quant_exact_tiles_roundtrip_bit_exact():
    w, h = 24, 16
    y = _const_tiles(w, h, 8, [2 * ((7 * t) % 128) for t in range(5)])
    cb = _const_tiles(w, h, 8, [128 + 17 * k for k in (-4, -1, 0, 3, 6)])
    cr = _const_tiles(w, h, 8, [128 + 17 * k for k in (5, 2, 0, -2, -5)])
    payload = jpeg_encode_color(w, h, y, cb, cr, subsampling="4:4:4")
    assert jpeg_decode_color(payload) == (w, h, y, cb, cr)


def test_color_natural_image_error_bounded_and_chroma_smoothed():
    import math

    w, h = 32, 24
    y = bytes(
        int(128 + 90 * math.sin(x / 4.0) * math.cos(yy / 6.0))
        for yy in range(h) for x in range(w)
    )
    cb = bytes(int(128 + 60 * math.sin((x + yy) / 9.0))
               for yy in range(h) for x in range(w))
    cr = bytes(int(128 - 60 * math.cos((x - yy) / 8.0))
               for yy in range(h) for x in range(w))
    dw, dh, dy, dcb, dcr = jpeg_decode_color(
        jpeg_encode_color(w, h, y, cb, cr)
    )
    assert (dw, dh) == (w, h)
    for src, out, bound in ((y, dy, 14), (cb, dcb, 22), (cr, dcr, 22)):
        err = sum(abs(a - b) for a, b in zip(src, out)) / len(src)
        assert err < bound


def test_odd_dimensions_pad_and_crop():
    w, h = 19, 13  # not multiples of the 16px MCU
    y = _const_tiles(w, h, 16, [100])
    cb = _const_tiles(w, h, 16, [128])
    cr = _const_tiles(w, h, 16, [128 + 17])
    dw, dh, dy, dcb, dcr = jpeg_decode_color(
        jpeg_encode_color(w, h, y, cb, cr)
    )
    assert (dw, dh) == (w, h)
    assert dy == y and dcb == cb and dcr == cr


def test_grayscale_stream_also_decodes_with_neutral_chroma():
    from my_flink_1_10_2_spark.llm.jpeg import jpeg_encode_gray

    px = _const_tiles(16, 8, 8, [60, 200])
    w, h, y, cb, cr = jpeg_decode_color(jpeg_encode_gray(16, 8, px))
    assert (w, h, y) == (16, 8, px)
    assert set(cb) == {128} and set(cr) == {128}


def test_rgb_ycbcr_conversion_roundtrip_tolerance():
    for rgb in [(0, 0, 0), (255, 255, 255), (255, 0, 0), (12, 200, 99)]:
        back = ycbcr_to_rgb(*rgb_to_ycbcr(*rgb))
        assert all(abs(a - b) <= 2 for a, b in zip(rgb, back))


def test_plane_size_and_subsampling_validation():
    with pytest.raises(ValueError, match="plane y"):
        jpeg_encode_color(8, 8, b"\x00" * 63, b"\x00" * 64, b"\x00" * 64)
    with pytest.raises(ValueError, match="subsampling"):
        jpeg_encode_color(8, 8, b"\x00" * 64, b"\x00" * 64, b"\x00" * 64,
                          subsampling="4:1:1")


def test_color_422_quant_exact_tiles_roundtrip_bit_exact():
    """4:2:2 (horizontal-only chroma subsampling, Y factors (2,1)):
    constant 16x16 tiles survive the horizontal box average exactly."""
    w, h = 32, 16
    y = _const_tiles(w, h, 16, [2 * ((9 * t) % 128) for t in range(4)])
    cb = _const_tiles(w, h, 16, [128 + 17 * k for k in (-5, -2, 1, 4)])
    cr = _const_tiles(w, h, 16, [128 + 17 * k for k in (6, 3, 0, -4)])
    payload = jpeg_encode_color(w, h, y, cb, cr, subsampling="4:2:2")
    assert jpeg_decode_color(payload) == (w, h, y, cb, cr)


# -- progressive color (SOF2, 3 components) -----------------------------------


def test_progressive_color_decodes_identically_to_baseline():
    """Both color encoders quantize identically, so the 8-scan
    progressive stream (interleaved DC + per-component AC, both with a
    refinement pass) must reproduce the baseline color decode exactly —
    for every subsampling mode and an odd-size image."""
    import math

    from my_flink_1_10_2_spark.llm.jpeg_progressive import (
        jpeg_encode_color_progressive,
    )

    w, h = 35, 21  # odd dims: own-grid vs MCU-padded-grid divergence
    y = bytes(int(128 + 80 * math.sin((x + 2 * yy) / 5.0))
              for yy in range(h) for x in range(w))
    cb = bytes(int(128 + 50 * math.cos(x / 3.0)) for yy in range(h) for x in range(w))
    cr = bytes(int(128 - 50 * math.sin(yy / 4.0)) for yy in range(h) for x in range(w))
    for sub in ("4:4:4", "4:2:2", "4:2:0"):
        base = jpeg_decode_color(jpeg_encode_color(w, h, y, cb, cr, subsampling=sub))
        prog = jpeg_decode_color(
            jpeg_encode_color_progressive(w, h, y, cb, cr, subsampling=sub)
        )
        assert prog == base, sub


def test_progressive_color_quant_exact_tiles_bit_exact():
    from my_flink_1_10_2_spark.llm.jpeg_progressive import (
        jpeg_encode_color_progressive,
    )

    w, h = 32, 32
    y = _const_tiles(w, h, 16, [2 * ((5 * t) % 128) for t in range(4)])
    cb = _const_tiles(w, h, 16, [128 + 17 * k for k in (-3, 0, 2, 4)])
    cr = _const_tiles(w, h, 16, [128 + 17 * k for k in (4, 2, 0, -3)])
    payload = jpeg_encode_color_progressive(w, h, y, cb, cr)
    assert jpeg_decode_color(payload) == (w, h, y, cb, cr)


def test_progressive_grayscale_routes_through_color_entry():
    from my_flink_1_10_2_spark.llm.jpeg_progressive import (
        jpeg_encode_gray_progressive,
    )

    px = _const_tiles(16, 8, 8, [60, 200])
    w, h, y, cb, cr = jpeg_decode_color(jpeg_encode_gray_progressive(16, 8, px))
    assert (w, h, y) == (16, 8, px)
    assert set(cb) == {128} and set(cr) == {128}


def test_progressive_color_fuzz_matches_baseline_many_seeds():
    """Randomized progressive-vs-baseline color equivalence across seeds,
    sizes and subsampling modes — the shared AC-refinement helper must
    hold the ZRL correction-bit window invariant on chroma grids too
    (the round-7 color ac_refine duplicated the gray desync)."""
    import numpy as np

    from my_flink_1_10_2_spark.llm.jpeg_progressive import (
        jpeg_encode_color_progressive,
    )

    for seed in range(12):
        rng = np.random.default_rng(100 + seed)
        w = int(rng.integers(8, 48))
        h = int(rng.integers(8, 40))
        y, cb, cr = (
            rng.integers(0, 256, size=w * h, dtype=np.uint8).tobytes()
            for _ in range(3)
        )
        sub = ("4:4:4", "4:2:2", "4:2:0")[seed % 3]
        base = jpeg_decode_color(jpeg_encode_color(w, h, y, cb, cr, subsampling=sub))
        prog = jpeg_decode_color(
            jpeg_encode_color_progressive(w, h, y, cb, cr, subsampling=sub)
        )
        assert prog == base, (seed, w, h, sub)
