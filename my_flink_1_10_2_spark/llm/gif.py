"""GIF87a/89a codec — palette-indexed images and animations with REAL
LZW compression, implemented from the public specification only
(CompuServe GIF89a spec, 1990; the LZW variable-code-width scheme it
defines in Appendix F):

  stream  := header | logical screen descriptor | [global color table]
             | block* | trailer(0x3B)
  block   := image (0x2C: descriptor | [local color table] | LZW data)
           | extension (0x21: GCE 0xF9 / application 0xFF / comment 0xFE)
  LZW     := min-code-size byte | sub-blocks of LSB-first packed codes,
             code width grows from mcs+1 up to 12 bits, CLEAR resets the
             table, table full at 4096 forces a CLEAR (encoder side)

Both the interlaced row order (4-pass: 0/8, 4/8, 2/4, 1/2) and the
KwKwK decoder case (code == next free entry) are implemented and
tested.  The encoder emits deterministic byte streams (no RNG, fixed
dictionary policy), so shards re-export byte-identically.

This is the third REAL image codec in the multimodal family (PNG =
DEFLATE+filters, JPEG = DCT+Huffman, GIF = LZW+palette) — animation
frames make it the palette-video analog of llm/avi.py.
"""

from __future__ import annotations

import struct

# ------------------------------------------------------------------ LZW


def lzw_encode(data: bytes, min_code_size: int) -> bytes:
    """GIF-flavor LZW: variable width, CLEAR/EOI codes, 4096-entry cap."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    bitbuf = bitcnt = 0

    def emit(code: int, width: int) -> None:
        nonlocal bitbuf, bitcnt
        bitbuf |= code << bitcnt
        bitcnt += width
        while bitcnt >= 8:
            out.append(bitbuf & 0xFF)
            bitbuf >>= 8
            bitcnt -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1
    emit(clear, width)
    w = b""
    for byte in data:
        wk = w + bytes([byte])
        if wk in table:
            w = wk
            continue
        emit(table[w], width)
        if next_code < 4096:
            table[wk] = next_code
            # per spec the width bumps when the NEXT code to assign
            # no longer fits the current width
            if next_code == (1 << width) and width < 12:
                width += 1
            next_code += 1
        else:
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        w = bytes([byte])
    if w:
        emit(table[w], width)
    emit(eoi, width)
    if bitcnt:
        out.append(bitbuf & 0xFF)
    return bytes(out)


def lzw_decode(data: bytes, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    pos = 0
    bitbuf = bitcnt = 0

    def read(width: int) -> int | None:
        nonlocal pos, bitbuf, bitcnt
        while bitcnt < width:
            if pos >= len(data):
                # real-world encoders commonly omit the explicit EOI
                # code; only sub-byte padding may remain at this point
                return None
            bitbuf |= data[pos] << bitcnt
            pos += 1
            bitcnt += 8
        code = bitbuf & ((1 << width) - 1)
        bitbuf >>= width
        bitcnt -= width
        return code

    out = bytearray()
    table: list[bytes] = []
    width = min_code_size + 1
    prev: bytes | None = None

    def reset() -> None:
        nonlocal table, width, prev
        table = [bytes([i]) for i in range(clear)] + [b"", b""]
        width = min_code_size + 1
        prev = None

    reset()
    while True:
        code = read(width)
        if code is None:
            return bytes(out)
        if code == clear:
            reset()
            continue
        if code == eoi:
            return bytes(out)
        if prev is None:
            if code >= len(table):
                raise ValueError(f"first LZW code {code} out of table")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
        elif code == len(table):
            entry = prev + prev[:1]  # KwKwK
        else:
            raise ValueError(f"LZW code {code} beyond table size {len(table)}")
        out += entry
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry


# ------------------------------------------------------------- container

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _interlaced_row_order(height: int) -> list[int]:
    order = []
    for start, step in _INTERLACE_PASSES:
        order.extend(range(start, height, step))
    return order


def _subblocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def _palette_bits(n_colors: int) -> int:
    bits = 1
    while (1 << bits) < n_colors:
        bits += 1
    return bits


def gif_encode(
    width: int,
    height: int,
    frames: list[bytes],
    palette: list[tuple[int, int, int]],
    delay_cs: int = 4,
    interlace: bool = False,
    loop: bool = True,
) -> bytes:
    """Encode palette-index frames to GIF89a (GIF87a when a single frame
    and no control extension is needed).  ``frames`` are row-major index
    bytes; ``palette`` is up to 256 (r, g, b) tuples."""
    if not frames:
        raise ValueError("at least one frame required")
    if not 2 <= len(palette) <= 256:
        raise ValueError("palette must have 2..256 colors")
    bits = _palette_bits(len(palette))
    table_size = 1 << bits
    animated = len(frames) > 1
    out = bytearray()
    out += b"GIF89a" if animated else b"GIF87a"
    # logical screen descriptor: global color table, 8 bits/channel
    out += struct.pack(
        "<HHBBB", width, height, 0x80 | ((bits - 1) << 4) | (bits - 1), 0, 0
    )
    for idx in range(table_size):
        r, g, b = palette[idx] if idx < len(palette) else (0, 0, 0)
        out += bytes((r, g, b))
    if animated and loop:
        # NETSCAPE2.0 looping application extension
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    mcs = max(2, bits)
    for frame in frames:
        if len(frame) != width * height:
            raise ValueError(
                f"frame has {len(frame)} indices, want {width * height}"
            )
        if max(frame) >= table_size:
            raise ValueError("pixel index outside the palette")
        if animated:
            # graphic control extension: delay, no transparency
            out += b"\x21\xf9\x04" + struct.pack("<BHB", 0, delay_cs, 0) + b"\x00"
        flags = 0x40 if interlace else 0
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, width, height, flags)
        if interlace:
            rows = bytearray()
            for r in _interlaced_row_order(height):
                rows += frame[r * width : (r + 1) * width]
            frame = bytes(rows)
        out.append(mcs)
        out += _subblocks(lzw_encode(frame, mcs))
    out += b"\x3b"
    return bytes(out)


def gif_decode(
    payload: bytes,
) -> tuple[int, int, list[tuple[int, int, int]], list[bytes]]:
    """Decode a GIF87a/89a stream.

    Returns (width, height, global_palette, frames) where frames are
    row-major palette-index bytes (interlacing undone; local color
    tables rejected as unsupported rather than silently mis-colored)."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF stream (bad signature)")
    width, height, flags, _bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    palette: list[tuple[int, int, int]] = []
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        for _ in range(n):
            palette.append(tuple(payload[pos : pos + 3]))
            pos += 3
    frames: list[bytes] = []
    while True:
        if pos >= len(payload):
            raise ValueError("GIF stream missing trailer")
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            return width, height, palette, frames
        if block == 0x21:  # extension: label + sub-blocks, skippable
            pos += 1
            while payload[pos]:
                pos += 1 + payload[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02x} at {pos - 1}")
        fx, fy, fw, fh, fflags = struct.unpack_from("<HHHHB", payload, pos)
        pos += 9
        if (fx, fy, fw, fh) != (0, 0, width, height):
            raise NotImplementedError("sub-rectangle frames not supported")
        if fflags & 0x80:
            raise NotImplementedError("local color tables not supported")
        mcs = payload[pos]
        pos += 1
        lzw = bytearray()
        while payload[pos]:
            ln = payload[pos]
            lzw += payload[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        pos += 1
        frame = lzw_decode(bytes(lzw), mcs)
        if len(frame) != fw * fh:
            raise ValueError(
                f"frame decoded to {len(frame)} pixels, want {fw * fh}"
            )
        if fflags & 0x40:  # interlaced: undo the 4-pass row order
            rows = bytearray(fw * fh)
            for i, r in enumerate(_interlaced_row_order(fh)):
                rows[r * fw : (r + 1) * fw] = frame[i * fw : (i + 1) * fw]
            frame = bytes(rows)
        frames.append(frame)
