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
