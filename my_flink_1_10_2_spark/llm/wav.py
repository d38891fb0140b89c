"""Pure-stdlib WAV (RIFF/PCM) codec — the audio leg of the multimodal
column, real like the PNG leg (llm/png.py).

WAV's container is public (RIFF chunks; PCM sample frames) and needs no
codec library for the linear-PCM profile: a 'RIFF'/'WAVE' header, an
'fmt ' chunk (format 1 = PCM, channels, sample rate, bit depth) and a
'data' chunk of little-endian interleaved samples.  Supports 8-bit
unsigned and 16-bit signed PCM, mono or multi-channel.  Compressed
formats (MP3/AAC/ADPCM...) stay honestly gated — those are real codecs.

Used executor-side inside Arrow ``mapInPandas`` batches
(`multimodal.extract_features(fake=False)` routes ``audio/wav`` here) —
pure byte math, no Spark imports.
"""

from __future__ import annotations

import struct


def wav_encode(
    samples: list[int] | bytes,
    *,
    sample_rate: int = 8000,
    channels: int = 1,
    bits: int = 16,
) -> bytes:
    """Encode PCM samples (interleaved ints; 16-bit signed or 8-bit
    unsigned) as a canonical RIFF/WAVE file."""
    if bits == 16:
        frames = struct.pack(f"<{len(samples)}h", *samples)
    elif bits == 8:
        frames = bytes(samples)
    else:
        raise ValueError("bits must be 8 or 16 for PCM")
    if len(samples) % channels:
        raise ValueError("sample count must be a multiple of channels")
    block_align = channels * bits // 8
    byte_rate = sample_rate * block_align
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, byte_rate, block_align, bits
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(frames)) + frames
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def wav_decode(payload: bytes) -> tuple[int, int, int, list[int]]:
    """Decode a RIFF/WAVE PCM file → (sample_rate, channels, bits,
    interleaved samples as Python ints).  Raises NotImplementedError for
    non-PCM formats (compressed audio is honestly gated)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV (bad RIFF/WAVE header)")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(payload):
        tag = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        chunk = payload[pos + 8 : pos + 8 + size]
        if tag == b"fmt ":
            fmt = chunk
        elif tag == b"data":
            data = chunk
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, channels, sample_rate, _br, _ba, bits = struct.unpack(
        "<HHIIHH", fmt[:16]
    )
    if audio_format != 1:
        raise NotImplementedError(
            f"WAV audio format {audio_format} (only PCM=1; compressed "
            "audio codecs are not re-implementable here)"
        )
    if bits == 16:
        samples = list(struct.unpack(f"<{len(data) // 2}h", data))
    elif bits == 8:
        samples = list(data)
    else:
        raise NotImplementedError(f"PCM bit depth {bits} (8/16 supported)")
    return sample_rate, channels, bits, samples
