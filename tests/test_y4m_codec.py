"""Unit tests for the YUV4MPEG2 codec (llm/y4m.py): roundtrips for both
chroma geometries, the frame-sampling contract, and malformed-stream
rejection."""

from __future__ import annotations

import pytest

from my_flink_1_10_2_spark.llm.y4m import y4m_decode, y4m_encode


def _frames(w, h, csz, n):
    return [
        (
            bytes((f * 31 + i * 7) % 256 for i in range(w * h)),
            bytes((f * 11 + i * 3) % 256 for i in range(csz)),
            bytes((f * 17 + i * 5) % 256 for i in range(csz)),
        )
        for f in range(n)
    ]


def test_roundtrip_420_and_444():
    for chroma, csz_of in (("420jpeg", lambda w, h: (w // 2) * (h // 2)),
                           ("444", lambda w, h: w * h)):
        w, h = 6, 4
        frames = _frames(w, h, csz_of(w, h), 5)
        payload = y4m_encode(w, h, frames, chroma=chroma)
        dw, dh, dc, n, sampled = y4m_decode(payload)
        assert (dw, dh, dc, n) == (w, h, chroma, 5)
        assert sampled == frames


def test_sampling_keeps_every_kth_frame():
    w, h = 4, 4
    frames = _frames(w, h, 4, 7)
    payload = y4m_encode(w, h, frames, chroma="420jpeg")
    _, _, _, n, sampled = y4m_decode(payload, every=3)
    assert n == 7
    assert sampled == [frames[0], frames[3], frames[6]]


def test_header_params_parsed_and_unknown_rejected():
    payload = y4m_encode(4, 4, _frames(4, 4, 4, 1))
    # interlacing/aspect/comment params are tolerated
    patched = payload.replace(b" Ip ", b" Ip XCOMMENT ", 1)
    assert y4m_decode(patched)[3] == 1
    with pytest.raises(ValueError, match="unknown stream parameter"):
        y4m_decode(payload.replace(b" Ip ", b" Q9 ", 1))


def test_malformed_streams_rejected():
    good = y4m_encode(4, 4, _frames(4, 4, 4, 2))
    with pytest.raises(ValueError, match="magic"):
        y4m_decode(b"JUNK" + good[4:])
    with pytest.raises(ValueError, match="truncated"):
        y4m_decode(good[:-5])
    with pytest.raises(ValueError, match="FRAME marker"):
        y4m_decode(good.replace(b"FRAME\n", b"FRUME\n", 1))
    with pytest.raises(ValueError, match="even dimensions"):
        y4m_encode(5, 4, _frames(5, 4, 4, 1), chroma="420jpeg")
    with pytest.raises(ValueError, match="plane size"):
        y4m_encode(4, 4, [(b"\0" * 15, b"\0" * 4, b"\0" * 4)])
    with pytest.raises(NotImplementedError, match="chroma"):
        y4m_encode(4, 4, _frames(4, 4, 16, 1), chroma="422")
