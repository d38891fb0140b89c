"""AIFF codec — Apple's IFF-structured PCM audio container from the
public AIFF-C 1.3 specification: a FORM/AIFF chunk tree holding COMM
(channels, frame count, bit depth, and the sample rate as an 80-bit
IEEE 754 EXTENDED-precision float — the format's famous quirk) and
SSND (offset, block size, big-endian PCM frames).

The 80-bit extended conversion is implemented by hand (15-bit biased
exponent, explicit-integer-bit 64-bit mantissa) — the part every AIFF
implementation has to get right and the reason naive readers mis-rate
files.  Complements llm/wav.py (little-endian RIFF) the way BMP/TIFF
complement PNG: same samples, independent container and endianness.
"""

from __future__ import annotations

import struct


def float80_encode(value: float) -> bytes:
    """Encode a positive number as 80-bit extended precision
    (sign 1 | biased exponent 15 | explicit-integer-bit mantissa 64)."""
    if value <= 0:
        raise ValueError("sample rate must be positive")
    import math

    m, e = math.frexp(value)  # value = m * 2^e, 0.5 <= m < 1
    exponent = e - 1 + 16383
    mantissa = int(m * (1 << 64))  # top bit set since m >= 0.5
    return struct.pack(">HQ", exponent, mantissa)


def float80_decode(data: bytes) -> float:
    if len(data) != 10:
        raise ValueError("extended float must be 10 bytes")
    exponent, mantissa = struct.unpack(">HQ", data)
    sign = -1.0 if exponent & 0x8000 else 1.0
    exponent &= 0x7FFF
    if exponent == 0 and mantissa == 0:
        return 0.0
    return sign * mantissa * 2.0 ** (exponent - 16383 - 63)


def aiff_encode(
    samples: list[int], sample_rate: int = 8000, bits: int = 16
) -> bytes:
    """Encode mono PCM samples to AIFF (big-endian frames)."""
    if bits != 16:
        raise NotImplementedError("only 16-bit PCM supported")
    pcm = struct.pack(f">{len(samples)}h", *samples)
    comm = struct.pack(">hLh", 1, len(samples), bits) + float80_encode(
        float(sample_rate)
    )
    ssnd = struct.pack(">LL", 0, 0) + pcm
    body = (
        b"AIFF"
        + b"COMM" + struct.pack(">L", len(comm)) + comm
        + b"SSND" + struct.pack(">L", len(ssnd)) + ssnd
        + (b"\x00" if len(ssnd) % 2 else b"")
    )
    return b"FORM" + struct.pack(">L", len(body)) + body


def aiff_decode(payload: bytes) -> tuple[int, int, int, list[int]]:
    """Decode an AIFF stream to (sample_rate, channels, bits, samples).
    Walks the chunk tree honestly (unknown chunks skipped, odd-length
    padding honored)."""
    if payload[:4] != b"FORM":
        raise ValueError("not an IFF stream (missing FORM)")
    (form_len,) = struct.unpack_from(">L", payload, 4)
    if payload[8:12] != b"AIFF":
        raise ValueError(f"not an AIFF form (type {payload[8:12]!r})")
    pos, end = 12, 8 + form_len
    comm = ssnd = None
    while pos + 8 <= end:
        cid = payload[pos : pos + 4]
        (clen,) = struct.unpack_from(">L", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + clen]
        if len(body) != clen:
            raise ValueError(f"truncated {cid!r} chunk")
        if cid == b"COMM":
            comm = body
        elif cid == b"SSND":
            ssnd = body
        pos += 8 + clen + (clen % 2)  # chunks are word-aligned
    if comm is None or ssnd is None:
        raise ValueError("missing COMM or SSND chunk")
    channels, n_frames, bits = struct.unpack_from(">hLh", comm, 0)
    rate = float80_decode(comm[8:18])
    if bits != 16 or channels != 1:
        raise NotImplementedError("only 16-bit mono supported")
    offset, _block = struct.unpack_from(">LL", ssnd, 0)
    pcm = ssnd[8 + offset : 8 + offset + n_frames * 2]
    if len(pcm) != n_frames * 2:
        raise ValueError("SSND shorter than COMM frame count")
    samples = list(struct.unpack(f">{n_frames}h", pcm))
    return int(round(rate)), channels, bits, samples
