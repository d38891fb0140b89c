"""AIFF codec tests: 80-bit extended-float vectors, WAV cross-container
sample parity, chunk-walk robustness, and rejection paths."""

from __future__ import annotations

import struct

import pytest

from my_flink_1_10_2_spark.llm.aiff import (
    aiff_decode,
    aiff_encode,
    float80_decode,
    float80_encode,
)


def test_float80_known_vectors():
    # canonical sample rates, byte-exact per IEEE 754 extended
    assert float80_encode(44100.0).hex() == "400eac44000000000000"
    assert float80_encode(8000.0).hex() == "400bfa00000000000000"
    assert float80_encode(48000.0).hex() == "400ebb80000000000000"
    for v in (8000.0, 11025.0, 22050.0, 44100.0, 48000.0, 96000.0, 1.0, 0.5):
        assert float80_decode(float80_encode(v)) == v


def test_roundtrip_and_wav_cross_container():
    from my_flink_1_10_2_spark.llm.wav import wav_decode, wav_encode

    samples = [((i * 37) % 4096 - 2048) * 13 for i in range(123)]
    payload = aiff_encode(samples, sample_rate=8000)
    rate, ch, bits, dec = aiff_decode(payload)
    assert (rate, ch, bits) == (8000, 1, 16)
    assert dec == samples
    # the same samples through the RIFF/WAV container decode identically:
    # two independent containers, one ground truth
    wrate, wch, wbits, wdec = wav_decode(wav_encode(samples, sample_rate=8000))
    assert (wrate, wch, wbits) == (rate, ch, bits)
    assert list(wdec) == dec


def test_unknown_chunks_skipped_and_padding():
    samples = [100, -100, 2]  # odd SSND length never occurs at 16-bit;
    payload = bytearray(aiff_encode(samples))
    # splice an unknown odd-length chunk (with pad byte) before COMM
    extra = b"NAME" + struct.pack(">L", 3) + b"abc" + b"\x00"
    out = payload[:12] + extra + payload[12:]
    struct.pack_into(">L", out, 4, len(out) - 8)
    rate, _, _, dec = aiff_decode(bytes(out))
    assert rate == 8000 and dec == samples


def test_rejections():
    good = aiff_encode([1, 2, 3])
    with pytest.raises(ValueError, match="FORM"):
        aiff_decode(b"XXXX" + good[4:])
    with pytest.raises(ValueError, match="AIFF form"):
        aiff_decode(good[:8] + b"AIFC" + good[12:])
    with pytest.raises(ValueError, match="truncated"):
        aiff_decode(good[:-2])
    with pytest.raises(ValueError, match="positive"):
        float80_encode(0.0)
