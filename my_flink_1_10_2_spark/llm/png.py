"""Pure-stdlib baseline PNG codec (zlib + struct — no image libraries).

Replaces the gated "fake" codec for the multimodal column's image leg
(the container has no PIL/ffmpeg; PNG's format is public and zlib is in
the stdlib).  Supports 8-bit depth in color types 0 (grayscale),
2 (RGB), 3 (palette, expanded to RGB on decode) and 6 (RGBA), all five
scanline filters (None/Sub/Up/Average/Paeth) in both directions, and
Adam7 interlace (encode + decode) — enough to decode any
screenshot-class PNG and to round-trip generated fixtures.  16-bit
depth has its own entry points (png_encode_deep / png_decode_deep) so
png_decode's byte-per-sample contract stays intact.

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


# Adam7 pass grid: (x0, y0, dx, dy) per pass (PNG spec §8.2)
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _pass_dims(width: int, height: int, p: tuple[int, int, int, int]) -> tuple[int, int]:
    x0, y0, dx, dy = p
    return -(-(width - x0) // dx) if width > x0 else 0, (
        -(-(height - y0) // dy) if height > y0 else 0
    )


def _filter_rows(pixels: bytes, width: int, height: int, bpp: int,
                 filter_plan: str) -> bytearray:
    """Forward-filter a (sub)image into the PNG scanline stream."""
    stride = width * bpp
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
                (row[i] - (row[i - bpp] if i >= bpp else 0)) & 0xFF
                for i in range(stride)
            )
        elif f == 2:  # Up
            raw += bytes((row[i] - prev[i]) & 0xFF for i in range(stride))
        elif f == 3:  # Average
            raw += bytes(
                (row[i] - ((row[i - bpp] if i >= bpp else 0) + prev[i]) // 2)
                & 0xFF
                for i in range(stride)
            )
        else:  # Paeth
            raw += bytes(
                (
                    row[i]
                    - _paeth(
                        row[i - bpp] if i >= bpp else 0,
                        prev[i],
                        prev[i - bpp] if i >= bpp else 0,
                    )
                )
                & 0xFF
                for i in range(stride)
            )
        prev = row
    return raw


def _extract_pass(pixels: bytes, width: int, height: int, bpp: int,
                  p: tuple[int, int, int, int]) -> tuple[bytes, int, int]:
    x0, y0, dx, dy = p
    pw, ph = _pass_dims(width, height, p)
    out = bytearray()
    for j in range(ph):
        y = y0 + j * dy
        for i in range(pw):
            x = x0 + i * dx
            out += pixels[(y * width + x) * bpp : (y * width + x) * bpp + bpp]
    return bytes(out), pw, ph


def png_encode(
    width: int,
    height: int,
    pixels: bytes,
    *,
    channels: int = 1,
    filter_plan: str = "mixed",
    interlace: bool = False,
    palette: list[tuple[int, int, int]] | None = None,
) -> bytes:
    """Encode raw 8-bit pixels (row-major, ``channels`` interleaved) as a
    baseline PNG.  ``filter_plan``: 'none' writes filter 0 everywhere;
    'mixed' cycles Sub/Up/Average/Paeth/None by row so decoders are
    forced through every filter type.  ``interlace=True`` writes Adam7
    (seven sub-images, each filtered independently — PNG spec §8.2).
    ``palette`` switches to color type 3: ``pixels`` are then 1-byte
    palette indices and a PLTE chunk carries the RGB entries."""
    if palette is not None:
        if channels != 1:
            raise ValueError("palette PNGs take 1-byte indices (channels=1)")
        if not 1 <= len(palette) <= 256:
            raise ValueError("palette must have 1..256 entries")
        color_type = 3
    else:
        if channels not in (1, 3, 4):
            raise ValueError("channels must be 1 (gray), 3 (RGB) or 4 (RGBA)")
        color_type = {1: 0, 3: 2, 4: 6}[channels]
    stride = width * channels
    if len(pixels) != stride * height:
        raise ValueError(
            f"pixel buffer is {len(pixels)} bytes; expected {stride * height}"
        )
    ihdr = struct.pack(
        ">IIBBBBB", width, height, 8, color_type, 0, 0, 1 if interlace else 0
    )
    if interlace:
        raw = bytearray()
        for p in _ADAM7:
            sub, pw, ph = _extract_pass(pixels, width, height, channels, p)
            if pw and ph:
                raw += _filter_rows(sub, pw, ph, channels, filter_plan)
    else:
        raw = _filter_rows(pixels, width, height, channels, filter_plan)
    out = _SIGNATURE + _chunk(b"IHDR", ihdr)
    if palette is not None:
        out += _chunk(b"PLTE", bytes(v for rgb in palette for v in rgb))
    return (
        out + _chunk(b"IDAT", zlib.compress(bytes(raw))) + _chunk(b"IEND", b"")
    )


def _defilter(raw: bytes, width: int, height: int, bpp: int, off: int = 0
              ) -> tuple[bytes, int]:
    """Reverse the scanline filters of one (sub)image starting at ``off``
    in the decompressed stream → (pixels, bytes consumed)."""
    stride = width * bpp
    need = (stride + 1) * height
    if off + need > len(raw):
        raise ValueError("PNG decompressed size mismatch")
    out = bytearray(stride * height)
    prev = bytes(stride)
    for r in range(height):
        base = off + r * (stride + 1)
        f = raw[base]
        line = bytearray(raw[base + 1 : base + 1 + stride])
        if f == 1:  # Sub
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif f == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif f == 3:  # Average
            for i in range(stride):
                left = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + (left + prev[i]) // 2) & 0xFF
        elif f == 4:  # Paeth
            for i in range(stride):
                left = line[i - bpp] if i >= bpp else 0
                ul = prev[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + _paeth(left, prev[i], ul)) & 0xFF
        elif f != 0:
            raise ValueError(f"invalid PNG filter type {f}")
        out[r * stride : (r + 1) * stride] = line
        prev = bytes(line)
    return bytes(out), need


def png_decode(payload: bytes) -> tuple[int, int, int, bytes]:
    """Decode a baseline PNG → (width, height, channels, raw pixel bytes,
    row-major interleaved).  Handles gray/RGB/RGBA/palette color types,
    all five filters, and Adam7 interlace (palette output is expanded to
    RGB).  16-bit depth stays gated — widening the return contract
    silently would be worse than refusing."""
    if payload[:8] != _SIGNATURE:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    width = height = channels = None
    color = interlace = 0
    palette: bytes | None = None
    idat = bytearray()
    while pos < len(payload):
        if pos + 12 > len(payload):
            raise ValueError("truncated PNG chunk header")
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        if len(body) < length or pos + 12 + length > len(payload):
            raise ValueError(f"truncated PNG chunk {tag!r}")
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
            if color not in (0, 2, 3, 6):
                raise NotImplementedError(
                    f"PNG color type {color} (gray/RGB/palette/RGBA supported)"
                )
            if comp or filt:
                raise ValueError("invalid PNG compression/filter method")
            channels = 1 if color == 3 else _CHANNELS[color]
        elif tag == b"PLTE":
            if length % 3:
                raise ValueError("PLTE length must be a multiple of 3")
            palette = bytes(body)
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    if width is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    if color == 3 and palette is None:
        raise ValueError("palette PNG missing PLTE chunk")
    raw = zlib.decompress(bytes(idat))
    if interlace:  # Adam7: seven independently-filtered sub-images
        out = bytearray(width * height * channels)
        off = 0
        for p in _ADAM7:
            pw, ph = _pass_dims(width, height, p)
            if not pw or not ph:
                continue
            sub, used = _defilter(raw, pw, ph, channels, off)
            off += used
            x0, y0, dx, dy = p
            for j in range(ph):
                y = y0 + j * dy
                for i in range(pw):
                    x = x0 + i * dx
                    src = (j * pw + i) * channels
                    dst = (y * width + x) * channels
                    out[dst : dst + channels] = sub[src : src + channels]
        if off != len(raw):
            raise ValueError("PNG decompressed size mismatch")
        pixels = bytes(out)
    else:
        pixels, used = _defilter(raw, width, height, channels)
        if used != len(raw):
            raise ValueError("PNG decompressed size mismatch")
    if color == 3:
        n = len(palette) // 3
        expanded = bytearray(width * height * 3)
        for i, idx in enumerate(pixels):
            if idx >= n:
                raise ValueError(f"palette index {idx} out of range ({n} entries)")
            expanded[i * 3 : i * 3 + 3] = palette[idx * 3 : idx * 3 + 3]
        return width, height, 3, bytes(expanded)
    return width, height, channels, pixels


def png_encode_deep(
    width: int,
    height: int,
    samples: list[int],
    *,
    channels: int = 1,
    filter_plan: str = "mixed",
    interlace: bool = False,
) -> bytes:
    """Encode 16-bit samples (row-major, ``channels`` interleaved ints
    0..65535) as a bit-depth-16 PNG — big-endian per spec; the byte-wise
    scanline filters apply unchanged with bpp = channels*2."""
    if channels not in (1, 3, 4):
        raise ValueError("channels must be 1 (gray), 3 (RGB) or 4 (RGBA)")
    if len(samples) != width * height * channels:
        raise ValueError(
            f"expected {width * height * channels} samples, got {len(samples)}"
        )
    if any(not 0 <= s <= 0xFFFF for s in samples):
        raise ValueError("16-bit samples must be in 0..65535")
    raw16 = b"".join(struct.pack(">H", s) for s in samples)
    bpp = channels * 2
    color_type = {1: 0, 3: 2, 4: 6}[channels]
    ihdr = struct.pack(
        ">IIBBBBB", width, height, 16, color_type, 0, 0, 1 if interlace else 0
    )
    if interlace:
        raw = bytearray()
        for p in _ADAM7:
            sub, pw, ph = _extract_pass(raw16, width, height, bpp, p)
            if pw and ph:
                raw += _filter_rows(sub, pw, ph, bpp, filter_plan)
    else:
        raw = _filter_rows(raw16, width, height, bpp, filter_plan)
    return (
        _SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


def png_decode_deep(payload: bytes) -> tuple[int, int, int, int, list[int]]:
    """Depth-aware decode → (width, height, channels, depth, samples as
    ints).  Depth 8 delegates to :func:`png_decode`; depth 16 is decoded
    here (big-endian samples, byte-wise filters at bpp = channels*2,
    Adam7 handled).  The separate entry point keeps :func:`png_decode`'s
    byte-per-sample contract intact instead of silently widening it."""
    if payload[:8] != _SIGNATURE:
        raise ValueError("not a PNG (bad signature)")
    # peek at IHDR (always the first chunk per spec)
    if payload[12:16] != b"IHDR":
        raise ValueError("PNG missing leading IHDR")
    width, height, depth, color, comp, filt, interlace = struct.unpack(
        ">IIBBBBB", payload[16:29]
    )
    if depth == 8:
        w, h, ch, px = png_decode(payload)
        return w, h, ch, 8, list(px)
    if depth != 16:
        raise NotImplementedError(f"PNG bit depth {depth}")
    if color not in (0, 2, 6):
        raise NotImplementedError(
            f"16-bit PNG color type {color} (gray/RGB/RGBA supported)"
        )
    channels = _CHANNELS[color]
    bpp = channels * 2
    pos = 8
    idat = bytearray()
    while pos < len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(">I", payload[pos + 8 + length : pos + 12 + length])
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        pos += 12 + length
        if tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    if not idat:
        raise ValueError("PNG missing IDAT")
    raw = zlib.decompress(bytes(idat))
    if interlace:
        out = bytearray(width * height * bpp)
        off = 0
        for p in _ADAM7:
            pw, ph = _pass_dims(width, height, p)
            if not pw or not ph:
                continue
            sub, used = _defilter(raw, pw, ph, bpp, off)
            off += used
            x0, y0, dx, dy = p
            for j in range(ph):
                y = y0 + j * dy
                for i in range(pw):
                    x = x0 + i * dx
                    src = (j * pw + i) * bpp
                    dst = (y * width + x) * bpp
                    out[dst : dst + bpp] = sub[src : src + bpp]
        if off != len(raw):
            raise ValueError("PNG decompressed size mismatch")
        data = bytes(out)
    else:
        data, used = _defilter(raw, width, height, bpp)
        if used != len(raw):
            raise ValueError("PNG decompressed size mismatch")
    samples = [
        (data[i] << 8) | data[i + 1] for i in range(0, len(data), 2)
    ]
    return width, height, channels, 16, samples
