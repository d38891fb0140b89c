"""GIF codec tests: LZW correctness (including the KwKwK case and the
4096-entry table reset), container roundtrips (animation, interlace),
interop with a known-good third-party byte stream, and corruption
rejection."""

from __future__ import annotations

import base64

import pytest

from my_flink_1_10_2_spark.llm.gif import (
    gif_decode,
    gif_encode,
    lzw_decode,
    lzw_encode,
)


def test_lzw_roundtrip_randomized():
    import random

    rng = random.Random(707)
    for trial in range(30):
        n_sym = rng.choice([2, 4, 7, 16, 256])
        mcs = max(2, (n_sym - 1).bit_length())
        data = bytes(rng.randrange(n_sym) for _ in range(rng.randrange(1, 4000)))
        assert lzw_decode(lzw_encode(data, mcs), mcs) == data


def test_lzw_kwkwk_case():
    # 'aaaa...' forces code == next_free immediately (the classic case)
    data = b"\x00" * 50
    assert lzw_decode(lzw_encode(data, 2), 2) == data


def test_lzw_table_overflow_reset():
    # >4096 distinct phrases forces the encoder's mid-stream CLEAR
    data = bytes((i * 7 + (i >> 8) * 13) % 256 for i in range(300_000))
    assert lzw_decode(lzw_encode(data, 8), 8) == data


def test_gif_single_frame_roundtrip():
    w, h = 9, 5
    palette = [(0, 0, 0), (255, 0, 0), (0, 255, 0), (0, 0, 255)]
    frame = bytes((x * 3 + 1) % 4 for x in range(w * h))
    payload = gif_encode(w, h, [frame], palette)
    assert payload[:6] == b"GIF87a"
    dw, dh, dpal, frames = gif_decode(payload)
    assert (dw, dh) == (w, h)
    assert dpal[: len(palette)] == palette
    assert frames == [frame]


def test_gif_animation_and_interlace_roundtrip():
    w, h = 6, 11  # odd height exercises every interlace pass
    palette = [(i, 255 - i, i // 2) for i in range(16)]
    frames = [
        bytes((x * 5 + f * 3) % 16 for x in range(w * h)) for f in range(4)
    ]
    for interlace in (False, True):
        payload = gif_encode(w, h, frames, palette, interlace=interlace)
        assert payload[:6] == b"GIF89a"
        _, _, _, got = gif_decode(payload)
        assert got == frames, f"interlace={interlace}"


def test_gif_deterministic_bytes():
    palette = [(0, 0, 0), (255, 255, 255)]
    frame = bytes(x % 2 for x in range(8 * 8))
    a = gif_encode(8, 8, [frame], palette)
    b = gif_encode(8, 8, [frame], palette)
    assert a == b


def test_gif_third_party_interop():
    """Decode the canonical 1x1 transparent GIF (a publicly ubiquitous
    tracking-pixel byte stream produced by other encoders)."""
    raw = base64.b64decode(
        b"R0lGODlhAQABAIAAAAAAAP///yH5BAEAAAAALAAAAAABAAEAAAIBRAA7"
    )
    w, h, palette, frames = gif_decode(raw)
    assert (w, h) == (1, 1)
    assert len(frames) == 1 and len(frames[0]) == 1
    assert palette[0] == (0, 0, 0) and palette[1] == (255, 255, 255)


def test_gif_rejects_malformed():
    palette = [(0, 0, 0), (255, 255, 255)]
    frame = bytes(x % 2 for x in range(4 * 4))
    good = gif_encode(4, 4, [frame], palette)
    with pytest.raises(ValueError, match="signature"):
        gif_decode(b"JUNK" + good[4:])
    with pytest.raises(ValueError, match="trailer"):
        gif_decode(good[:-1])
    with pytest.raises(ValueError, match="palette"):
        gif_encode(4, 4, [bytes([9] * 16)], palette)
    with pytest.raises(ValueError, match="frame has"):
        gif_encode(4, 4, [frame[:-1]], palette)
    with pytest.raises(ValueError, match="at least one frame"):
        gif_encode(4, 4, [], palette)
