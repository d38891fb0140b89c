"""Pure-stdlib baseline PNG codec (zlib + struct — no image libraries).

Replaces the gated "fake" codec for the multimodal column's image leg
(the container has no PIL/ffmpeg; PNG's format is public and zlib is in
the stdlib).  Supports non-interlaced 8-bit depth, color types 0
(grayscale), 2 (RGB) and 6 (RGBA), and all five scanline filters
(None/Sub/Up/Average/Paeth) in both directions — enough to decode any
baseline screenshot-class PNG and to round-trip generated fixtures.

JPEG/video decode stays honestly gated (`NotImplementedError`) — those
codecs are not re-implementable responsibly here; the Spark-side
plumbing (schema, Arrow batching, partitioning) is shared with this
real path.

Used executor-side inside Arrow ``mapInPandas`` batches
(`multimodal.extract_features(fake=False)`) — pure byte math, no Spark
imports here.
"""

from __future__ import annotations

import struct
import zlib

_SIGNATURE = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # color type → samples per pixel


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def png_encode(
    width: int,
    height: int,
    pixels: bytes,
    *,
    channels: int = 1,
    filter_plan: str = "mixed",
) -> bytes:
    """Encode raw 8-bit pixels (row-major, ``channels`` interleaved) as a
    baseline PNG.  ``filter_plan``: 'none' writes filter 0 everywhere;
    'mixed' cycles Sub/Up/Average/Paeth/None by row so decoders are
    forced through every filter type."""
    if channels not in (1, 3, 4):
        raise ValueError("channels must be 1 (gray), 3 (RGB) or 4 (RGBA)")
    stride = width * channels
    if len(pixels) != stride * height:
        raise ValueError(
            f"pixel buffer is {len(pixels)} bytes; expected {stride * height}"
        )
    color_type = {1: 0, 3: 2, 4: 6}[channels]
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    raw = bytearray()
    prev = bytes(stride)
    for r in range(height):
        row = pixels[r * stride : (r + 1) * stride]
        f = (r % 5 + 1) % 5 if filter_plan == "mixed" else 0  # 1,2,3,4,0,...
        raw.append(f)
        if f == 0:  # None
            raw += row
        elif f == 1:  # Sub
            raw += bytes(
                (row[i] - (row[i - channels] if i >= channels else 0)) & 0xFF
                for i in range(stride)
            )
        elif f == 2:  # Up
            raw += bytes((row[i] - prev[i]) & 0xFF for i in range(stride))
        elif f == 3:  # Average
            raw += bytes(
                (row[i] - ((row[i - channels] if i >= channels else 0) + prev[i]) // 2)
                & 0xFF
                for i in range(stride)
            )
        else:  # Paeth
            raw += bytes(
                (
                    row[i]
                    - _paeth(
                        row[i - channels] if i >= channels else 0,
                        prev[i],
                        prev[i - channels] if i >= channels else 0,
                    )
                )
                & 0xFF
                for i in range(stride)
            )
        prev = row
    return (
        _SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


def png_decode(payload: bytes) -> tuple[int, int, int, bytes]:
    """Decode a baseline PNG → (width, height, channels, raw pixel bytes,
    row-major interleaved).  Raises NotImplementedError for the PNG
    features outside the baseline profile (interlace, 16-bit, palette)."""
    if payload[:8] != _SIGNATURE:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    width = height = channels = None
    idat = bytearray()
    while pos < len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(
            ">I", payload[pos + 8 + length : pos + 12 + length]
        )
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        pos += 12 + length
        if tag == b"IHDR":
            width, height, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8:
                raise NotImplementedError(f"PNG bit depth {depth} (baseline is 8)")
            if color not in _CHANNELS or color == 4:
                supported = color in (0, 2, 6)
                if not supported:
                    raise NotImplementedError(
                        f"PNG color type {color} (gray/RGB/RGBA supported)"
                    )
            if interlace:
                raise NotImplementedError("interlaced PNG (Adam7) not supported")
            if comp or filt:
                raise ValueError("invalid PNG compression/filter method")
            channels = _CHANNELS[color]
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    if width is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != (stride + 1) * height:
        raise ValueError("PNG decompressed size mismatch")
    out = bytearray(stride * height)
    prev = bytes(stride)
    for r in range(height):
        f = raw[r * (stride + 1)]
        line = bytearray(raw[r * (stride + 1) + 1 : (r + 1) * (stride + 1)])
        if f == 1:  # Sub
            for i in range(channels, stride):
                line[i] = (line[i] + line[i - channels]) & 0xFF
        elif f == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif f == 3:  # Average
            for i in range(stride):
                left = line[i - channels] if i >= channels else 0
                line[i] = (line[i] + (left + prev[i]) // 2) & 0xFF
        elif f == 4:  # Paeth
            for i in range(stride):
                left = line[i - channels] if i >= channels else 0
                ul = prev[i - channels] if i >= channels else 0
                line[i] = (line[i] + _paeth(left, prev[i], ul)) & 0xFF
        elif f != 0:
            raise ValueError(f"invalid PNG filter type {f}")
        out[r * stride : (r + 1) * stride] = line
        prev = bytes(line)
    return width, height, channels, bytes(out)
