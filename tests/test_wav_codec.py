"""Pure-stdlib RIFF/PCM WAV codec (the audio leg of the multimodal
column — public container format, no codec library)."""

from __future__ import annotations

import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from my_flink_1_10_2_spark.llm.wav import wav_decode, wav_encode


@settings(max_examples=50, deadline=None)
@given(
    rate=st.sampled_from([8000, 16000, 44100]),
    channels=st.integers(1, 2),
    bits=st.sampled_from([8, 16]),
    data=st.data(),
)
def test_roundtrip_property(rate, channels, bits, data):
    n_frames = data.draw(st.integers(0, 40))
    lo, hi = (0, 255) if bits == 8 else (-32768, 32767)
    samples = data.draw(
        st.lists(
            st.integers(lo, hi),
            min_size=n_frames * channels,
            max_size=n_frames * channels,
        )
    )
    enc = wav_encode(samples, sample_rate=rate, channels=channels, bits=bits)
    assert wav_decode(enc) == (rate, channels, bits, samples)


def test_decode_rejects_garbage_and_nonpcm():
    with pytest.raises(ValueError, match="RIFF"):
        wav_decode(b"id3 nonsense here....")
    # a compressed format id (2 = ADPCM) is honestly gated
    fmt = struct.pack("<HHIIHH", 2, 1, 8000, 8000, 1, 8)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", 0)
    )
    payload = b"RIFF" + struct.pack("<I", len(body)) + body
    with pytest.raises(NotImplementedError, match="PCM"):
        wav_decode(payload)
    with pytest.raises(ValueError, match="bits"):
        wav_encode([0], bits=24)
    with pytest.raises(ValueError, match="multiple of channels"):
        wav_encode([0, 1, 2], channels=2)


def test_decode_skips_extra_chunks_word_aligned():
    """Real WAVs carry LIST/INFO chunks (odd sizes pad to word
    boundaries) — the chunk walk must skip them and still find data."""
    samples = [100, -200, 300]
    canonical = wav_encode(samples)
    # splice an odd-sized junk chunk between fmt and data
    fmt_at = canonical.index(b"fmt ")
    data_at = canonical.index(b"data")
    junk = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"  # padded
    spliced = canonical[:data_at] + junk + canonical[data_at:]
    spliced = spliced[:4] + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    assert wav_decode(spliced)[3] == samples
    assert fmt_at < data_at


# -- IMA ADPCM (format tag 0x11) ----------------------------------------------

import math as _math

from my_flink_1_10_2_spark.llm.wav import (
    _adpcm_decode_data,
    _ima_decode_nibble,
    wav_encode_adpcm,
)


def test_adpcm_roundtrip_tracks_smooth_signal():
    """Lossy 4-bit codec: a low-frequency sine must round-trip with
    small error relative to amplitude (the step table adapts within a
    few samples)."""
    n = 2000
    src = [int(12000 * _math.sin(2 * _math.pi * 50 * i / 8000)) for i in range(n)]
    payload = wav_encode_adpcm(src, sample_rate=8000, block_align=256)
    rate, channels, bits, out = wav_decode(payload)
    assert (rate, channels, bits) == (8000, 1, 16)
    assert len(out) == n  # fact chunk trims the padded tail block
    rms = _math.sqrt(sum((a - b) ** 2 for a, b in zip(src, out)) / n)
    assert rms < 600  # < 5% of amplitude
    # block headers carry the first sample of each block verbatim
    spb = (256 - 4) * 2 + 1
    for b0 in range(0, n, spb):
        assert out[b0] == src[b0]


def test_adpcm_decoder_golden_nibbles():
    """Spec vectors: from pred=0, index=0 (step 7), code 3 adds
    step>>1 + step>>2 + step>>3 = 3+1+0 and moves the index by -1->0;
    code 8 is a negative zero-magnitude step (diff = step>>3)."""
    pred, idx = _ima_decode_nibble(3, 0, 0)
    assert (pred, idx) == (4, 0)  # 7>>1 + 7>>2 + 7>>3 = 3+1+0
    pred, idx = _ima_decode_nibble(8, 100, 4)  # step 11, sign bit only
    assert (pred, idx) == (100 - (11 >> 3), 3)
    pred, idx = _ima_decode_nibble(7, 0, 88)  # max step clamps to int16
    assert pred == 32767 and idx == 88


def test_adpcm_decode_is_deterministic_and_bounded():
    src = [((i * 37) % 400 - 200) * 40 for i in range(600)]
    p1 = wav_encode_adpcm(src, block_align=64)
    p2 = wav_encode_adpcm(src, block_align=64)
    assert p1 == p2  # bit-identical encode (no hidden state)
    _, _, _, out = wav_decode(p1)
    assert all(-32768 <= v <= 32767 for v in out)


def test_adpcm_stereo_is_gated():
    import struct

    import pytest

    # hand-build a 2-channel ADPCM fmt header over an empty data chunk
    fmt = struct.pack("<HHIIHHHH", 0x11, 2, 8000, 8000, 256, 4, 2, 505)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", 0))
    with pytest.raises(NotImplementedError, match="multi-channel IMA"):
        wav_decode(b"RIFF" + struct.pack("<I", len(body)) + body)
