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


# ---------------------------------------------------------------------------
# G.711 mu-law / A-law
# ---------------------------------------------------------------------------

from my_flink_1_10_2_spark.llm.wav import (  # noqa: E402
    alaw_decode_sample,
    alaw_encode_sample,
    mulaw_decode_sample,
    mulaw_encode_sample,
    wav_encode_g711,
)


def test_g711_known_anchor_values():
    # silence encodes to 0xFF (mu-law all-ones-complement) and decodes to 0
    assert mulaw_encode_sample(0) == 0xFF
    assert mulaw_decode_sample(0xFF) == 0
    # mu-law clip: max magnitude decodes to 8031-ish segment top (=8158-127?)
    assert mulaw_decode_sample(mulaw_encode_sample(32767)) == 32124
    assert mulaw_decode_sample(mulaw_encode_sample(-32768)) == -32124
    # A-law max segment
    assert alaw_decode_sample(alaw_encode_sample(32767)) == 32256
    assert alaw_decode_sample(alaw_encode_sample(-32768)) == -32256


def test_g711_quantization_is_projection_exhaustive():
    # decode∘encode must be idempotent for every 16-bit input, both laws
    for v in range(-32768, 32768, 7):
        q = mulaw_decode_sample(mulaw_encode_sample(v))
        assert mulaw_decode_sample(mulaw_encode_sample(q)) == q
        qa = alaw_decode_sample(alaw_encode_sample(v))
        assert alaw_decode_sample(alaw_encode_sample(qa)) == qa


def test_g711_closed_form_matches_codec_exhaustively():
    # The oracle's closed-form replay (segment CASE + shifts) must equal
    # the real compander for ALL 65536 inputs — this is the equivalence
    # q_g711_wav_stats' oracle rests on.
    def mu_closed(v):
        s = -1 if v < 0 else 1
        x = min(abs(v), 32635) + 132
        e = (0 if x < 256 else 1 if x < 512 else 2 if x < 1024 else
             3 if x < 2048 else 4 if x < 4096 else 5 if x < 8192 else
             6 if x < 16384 else 7)
        m = (x >> (e + 3)) & 15
        return s * (((m * 8 + 132) << e) - 132)

    def al_closed(v):
        p0 = _math.floor(v / 8.0)
        pm = p0 if p0 >= 0 else -p0 - 1
        seg = 8
        for i, end in enumerate((31, 63, 127, 255, 511, 1023, 2047, 4095)):
            if pm <= end:
                seg = i
                break
        if seg >= 8:
            t = 32256
        else:
            m = (pm >> 1) & 15 if seg < 2 else (pm >> seg) & 15
            t = ((m << 4) + 8 if seg == 0 else
                 (m << 4) + 264 if seg == 1 else
                 (((m << 4) + 264) << (seg - 1)))
        return t if p0 >= 0 else -t

    for v in range(-32768, 32768):
        assert mulaw_decode_sample(mulaw_encode_sample(v)) == mu_closed(v), v
        assert alaw_decode_sample(alaw_encode_sample(v)) == al_closed(v), v


def test_g711_wav_container_roundtrip_both_laws():
    samples = [0, 100, -100, 8000, -8000, 32767, -32768, 1, -1]
    for law, tag in (("mu", 7), ("a", 6)):
        payload = wav_encode_g711(samples, law=law, sample_rate=8000)
        rate, channels, bits, dec = wav_decode(payload)
        assert (rate, channels, bits) == (8000, 1, 16)
        assert len(dec) == len(samples)
        enc = mulaw_encode_sample if law == "mu" else alaw_encode_sample
        dec_fn = mulaw_decode_sample if law == "mu" else alaw_decode_sample
        assert dec == [dec_fn(enc(s)) for s in samples]
        # format tag is really in the container
        assert struct.unpack("<H", payload[20:22])[0] == tag


def test_g711_fact_chunk_trims():
    payload = wav_encode_g711([5] * 10, law="mu")
    # grow the data chunk with a stray pad byte and keep fact=10
    assert wav_decode(payload)[3] == [mulaw_decode_sample(mulaw_encode_sample(5))] * 10


def test_g711_rejects_bad_law():
    with pytest.raises(ValueError, match="law"):
        wav_encode_g711([0], law="ulaw")
