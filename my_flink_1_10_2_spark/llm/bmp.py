"""BMP (Windows DIB) codec — 24-bit uncompressed BITMAPINFOHEADER
bitmaps from the public file-format layout: 14-byte file header
('BM', file size, pixel-array offset), 40-byte info header (width,
height, planes=1, bpp=24, BI_RGB), then BOTTOM-UP rows of BGR triples,
each row padded to a 4-byte boundary.

The payload of screenshots, scanned forms, and legacy OCR corpora —
and the simplest REAL image container, which makes it the reference
cross-check for the PNG/JPEG/GIF family: the same pixel recipe graded
through four independent containers pins the harness, not the codec.
"""

from __future__ import annotations

import struct


def bmp_encode(width: int, height: int, rgb_rows: list[bytes]) -> bytes:
    """Encode top-down RGB rows (3 bytes/pixel) to a 24-bit BMP."""
    if len(rgb_rows) != height:
        raise ValueError(f"got {len(rgb_rows)} rows, want {height}")
    row_bytes = width * 3
    pad = (-row_bytes) % 4
    stride = row_bytes + pad
    pixel_off = 14 + 40
    file_size = pixel_off + stride * height
    out = bytearray()
    out += b"BM" + struct.pack("<IHHI", file_size, 0, 0, pixel_off)
    out += struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, stride * height,
        2835, 2835, 0, 0,
    )
    for row in reversed(rgb_rows):  # bottom-up storage
        if len(row) != row_bytes:
            raise ValueError(f"row has {len(row)} bytes, want {row_bytes}")
        # RGB -> BGR per pixel
        bgr = bytearray(row_bytes)
        bgr[0::3] = row[2::3]
        bgr[1::3] = row[1::3]
        bgr[2::3] = row[0::3]
        out += bgr + b"\x00" * pad
    return bytes(out)


def bmp_decode(payload: bytes) -> tuple[int, int, list[bytes]]:
    """Decode a 24-bit BI_RGB BMP to (width, height, top-down RGB rows).
    Both bottom-up (positive height) and top-down (negative height)
    storage orders are handled."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP stream (bad magic)")
    _size, _r1, _r2, pixel_off = struct.unpack_from("<IHHI", payload, 2)
    hdr_size, width, height = struct.unpack_from("<Iii", payload, 14)
    if hdr_size < 40:
        raise NotImplementedError(f"BITMAPCOREHEADER ({hdr_size}) not supported")
    planes, bpp, compression = struct.unpack_from("<HHI", payload, 26)
    if planes != 1 or bpp != 24 or compression != 0:
        raise NotImplementedError(
            f"only 24-bit BI_RGB supported (planes={planes}, bpp={bpp}, "
            f"compression={compression})"
        )
    top_down = height < 0
    height = abs(height)
    row_bytes = width * 3
    stride = row_bytes + ((-row_bytes) % 4)
    if pixel_off + stride * height > len(payload):
        raise ValueError("truncated BMP pixel array")
    rows = []
    for r in range(height):
        src = r if top_down else height - 1 - r
        base = pixel_off + src * stride
        bgr = payload[base : base + row_bytes]
        rgb = bytearray(row_bytes)
        rgb[0::3] = bgr[2::3]
        rgb[1::3] = bgr[1::3]
        rgb[2::3] = bgr[0::3]
        rows.append(bytes(rgb))
    return width, height, rows
