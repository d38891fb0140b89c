"""Pure-stdlib WAV (RIFF/PCM) codec — the audio leg of the multimodal
column, real like the PNG leg (llm/png.py).

WAV's container is public (RIFF chunks; PCM sample frames) and needs no
codec library for the linear-PCM profile: a 'RIFF'/'WAVE' header, an
'fmt ' chunk (format 1 = PCM, channels, sample rate, bit depth) and a
'data' chunk of little-endian interleaved samples.  Supports 8-bit
unsigned and 16-bit signed PCM (mono or multi-channel) plus mono IMA
ADPCM (format tag 0x11 — the public step-table codec, decoded for real
below).  Perceptual codecs (MP3/AAC...) stay honestly gated.

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
    fact_samples = None
    while pos + 8 <= len(payload):
        tag = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        chunk = payload[pos + 8 : pos + 8 + size]
        if tag == b"fmt ":
            fmt = chunk
        elif tag == b"data":
            data = chunk
        elif tag == b"fact" and size >= 4:
            (fact_samples,) = struct.unpack("<I", chunk[:4])
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, channels, sample_rate, _br, block_align, bits = struct.unpack(
        "<HHIIHH", fmt[:16]
    )
    if audio_format == 0x11:  # IMA ADPCM — real decode, see below
        if channels != 1:
            raise NotImplementedError(
                "multi-channel IMA ADPCM (interleaved channel words) "
                "not supported — mono covers the multimodal audio leg"
            )
        samples = _adpcm_decode_data(data, block_align, fact_samples)
        return sample_rate, channels, 16, samples
    if audio_format in (6, 7):  # G.711 A-law / mu-law — real decode
        if channels != 1:
            raise NotImplementedError(
                "multi-channel G.711 not supported — mono covers the "
                "multimodal audio leg"
            )
        table = _g711_decode_table("a" if audio_format == 6 else "mu")
        samples = [table[b] for b in data]
        if fact_samples is not None:
            samples = samples[:fact_samples]
        return sample_rate, channels, 16, samples
    if audio_format != 1:
        raise NotImplementedError(
            f"WAV audio format {audio_format} (PCM=1, IMA ADPCM=0x11 and "
            "G.711 mu/A-law=7/6 supported; other compressed codecs are "
            "not re-implementable here)"
        )
    if bits == 16:
        samples = list(struct.unpack(f"<{len(data) // 2}h", data))
    elif bits == 8:
        samples = list(data)
    else:
        raise NotImplementedError(f"PCM bit depth {bits} (8/16 supported)")
    return sample_rate, channels, bits, samples


# ---------------------------------------------------------------------------
# IMA ADPCM (WAVE format tag 0x11) — the classic 4-bit step-table codec.
# Public algorithm (IMA Digital Audio Pack '92; the DVI/IMA tables below
# are the spec constants).  Mono blocks: 4-byte header (int16 predictor,
# uint8 step index, pad) + two samples per byte, low nibble first.
# Multi-channel ADPCM interleaves 4-byte channel words per block and is
# gated (mono covers the multimodal audio leg).

_IMA_INDEX = (-1, -1, -1, -1, 2, 4, 6, 8)
_IMA_STEP = (
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
)


def _ima_clamp16(v: int) -> int:
    return -32768 if v < -32768 else (32767 if v > 32767 else v)


def _ima_decode_nibble(code: int, pred: int, index: int) -> tuple[int, int]:
    step = _IMA_STEP[index]
    diff = step >> 3
    if code & 1:
        diff += step >> 2
    if code & 2:
        diff += step >> 1
    if code & 4:
        diff += step
    if code & 8:
        diff = -diff
    pred = _ima_clamp16(pred + diff)
    index = min(max(index + _IMA_INDEX[code & 7], 0), 88)
    return pred, index


def _ima_encode_sample(sample: int, pred: int, index: int) -> tuple[int, int, int]:
    step = _IMA_STEP[index]
    diff = sample - pred
    code = 0
    if diff < 0:
        code = 8
        diff = -diff
    if diff >= step:
        code |= 4
        diff -= step
    if diff >= step >> 1:
        code |= 2
        diff -= step >> 1
    if diff >= step >> 2:
        code |= 1
    pred, index = _ima_decode_nibble(code, pred, index)
    return code, pred, index


def wav_encode_adpcm(
    samples: list[int], *, sample_rate: int = 8000, block_align: int = 256
) -> bytes:
    """Encode mono 16-bit samples as a RIFF/WAVE IMA-ADPCM (tag 0x11)
    file.  Each block carries ``(block_align - 4) * 2 + 1`` samples (the
    header stores the first verbatim); the tail block is zero-padded in
    the nibble stream, with the true count in the ``fact`` chunk."""
    if block_align < 8 or block_align % 4:
        raise ValueError("block_align must be a multiple of 4, >= 8")
    spb = (block_align - 4) * 2 + 1  # samples per block
    blocks = []
    index = 0
    for start in range(0, len(samples), spb):
        chunk = samples[start : start + spb]
        pred = _ima_clamp16(int(chunk[0]))
        block = bytearray(struct.pack("<hBB", pred, index, 0))
        nibbles = []
        for s in chunk[1:]:
            code, pred, index = _ima_encode_sample(int(s), pred, index)
            nibbles.append(code)
        nibbles += [0] * ((block_align - 4) * 2 - len(nibbles))
        for lo, hi in zip(nibbles[::2], nibbles[1::2]):
            block.append(lo | (hi << 4))
        blocks.append(bytes(block))
    frames = b"".join(blocks)
    byte_rate = (sample_rate * block_align + spb - 1) // spb
    fmt = struct.pack(
        "<HHIIHHHH", 0x11, 1, sample_rate, byte_rate, block_align, 4, 2, spb
    )
    fact = struct.pack("<I", len(samples))
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<I", len(fact)) + fact
        + b"data" + struct.pack("<I", len(frames)) + frames
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _adpcm_decode_data(
    data: bytes, block_align: int, n_samples: int | None
) -> list[int]:
    out: list[int] = []
    for off in range(0, len(data), block_align):
        block = data[off : off + block_align]
        if len(block) < 4:
            break
        pred, index, _pad = struct.unpack("<hBB", block[:4])
        index = min(max(index, 0), 88)
        out.append(pred)
        for byte in block[4:]:
            for code in (byte & 0x0F, byte >> 4):
                pred, index = _ima_decode_nibble(code, pred, index)
                out.append(pred)
    return out if n_samples is None else out[:n_samples]


# ---------------------------------------------------------------------------
# G.711 mu-law / A-law (WAVE format tags 7 / 6) — the ITU-T G.711
# companding codecs, from the public algorithm (classic Sun g711.c,
# mirrored in countless public implementations).  8-bit log-companded
# telephony audio; decode(encode(x)) is a pure deterministic
# quantization, which is what the closed-form oracle replays.
# ---------------------------------------------------------------------------

_MULAW_BIAS = 0x84
_MULAW_CLIP = 32635


def mulaw_encode_sample(x: int) -> int:
    sign = 0x80 if x < 0 else 0x00
    if x < 0:
        x = -x
    if x > _MULAW_CLIP:
        x = _MULAW_CLIP
    x += _MULAW_BIAS
    exponent = 7
    mask = 0x4000
    while exponent > 0 and not (x & mask):
        exponent -= 1
        mask >>= 1
    mantissa = (x >> (exponent + 3)) & 0x0F
    return ~(sign | (exponent << 4) | mantissa) & 0xFF


def mulaw_decode_sample(b: int) -> int:
    b = ~b & 0xFF
    sign = b & 0x80
    exponent = (b >> 4) & 0x07
    mantissa = b & 0x0F
    x = (((mantissa << 3) + _MULAW_BIAS) << exponent) - _MULAW_BIAS
    return -x if sign else x


_ALAW_SEG_END = (0x1F, 0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF)


def alaw_encode_sample(x: int) -> int:
    p = x >> 3  # 16 -> 13 bit
    if p >= 0:
        mask = 0xD5
    else:
        mask = 0x55
        p = -p - 1
    seg = 8
    for i, end in enumerate(_ALAW_SEG_END):
        if p <= end:
            seg = i
            break
    if seg >= 8:
        return 0x7F ^ mask
    aval = seg << 4
    aval |= (p >> 1) & 0x0F if seg < 2 else (p >> seg) & 0x0F
    return aval ^ mask


def alaw_decode_sample(b: int) -> int:
    b ^= 0x55
    t = (b & 0x0F) << 4
    seg = (b & 0x70) >> 4
    if seg == 0:
        t += 8
    elif seg == 1:
        t += 0x108
    else:
        t = (t + 0x108) << (seg - 1)
    return t if b & 0x80 else -t


def _g711_decode_table(law: str) -> list[int]:
    dec = mulaw_decode_sample if law == "mu" else alaw_decode_sample
    return [dec(b) for b in range(256)]


def wav_encode_g711(
    samples: list[int], *, law: str = "mu", sample_rate: int = 8000
) -> bytes:
    """Encode mono 16-bit samples as a RIFF/WAVE G.711 file (format tag
    7 for mu-law, 6 for A-law) with the fact chunk compressed formats
    require."""
    if law not in ("mu", "a"):
        raise ValueError("law must be 'mu' or 'a'")
    enc = mulaw_encode_sample if law == "mu" else alaw_encode_sample
    tag = 7 if law == "mu" else 6
    frames = bytes(enc(int(s)) for s in samples)
    fmt = struct.pack("<HHIIHH", tag, 1, sample_rate, sample_rate, 1, 8)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<II", 4, len(samples))
        + b"data" + struct.pack("<I", len(frames)) + frames
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body
