"""TIFF codec — baseline RGB, uncompressed or PackBits, from the public
TIFF 6.0 specification: a byte-order header ('II' little / 'MM' big
endian, magic 42), a linked list of IFDs (image file directories) of
12-byte tag entries, and strip-based pixel data addressed by the
StripOffsets/StripByteCounts tags.  PackBits (spec §9) is the classic
Apple RLE: a signed count byte n means "n+1 literal bytes" (0 <= n <=
127) or "repeat next byte 1-n times" (-127 <= n <= -1); -128 is a noop.

The decoder walks the IFD honestly (both byte orders, out-of-line tag
values, multiple strips); the encoder emits canonical little-endian
single-IFD files any TIFF reader consumes.  Fifth REAL image container
in the multimodal family (PNG/JPEG/GIF/BMP/TIFF), and the first with a
tag-directory structure rather than fixed headers.
"""

from __future__ import annotations

import struct

# tag ids (TIFF 6.0 §8)
_WIDTH, _HEIGHT, _BPS, _COMPRESSION, _PHOTO = 256, 257, 258, 259, 262
_STRIP_OFFSETS, _SPP, _ROWS_PER_STRIP, _STRIP_COUNTS = 273, 277, 278, 279

_COMP_NONE, _COMP_PACKBITS = 1, 32773


def packbits_encode(data: bytes) -> bytes:
    """PackBits RLE (TIFF 6.0 §9): maximal runs, literals batched."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        # find run length at i
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 2:
            out.append(257 - run)  # two's complement of 1-run
            out.append(data[i])
            i += run
            continue
        # literal stretch: until a >=3 run starts (2-runs inside a
        # literal are cheaper left literal) or 128 bytes
        j = i + 1
        while j < n and j - i < 128:
            if j + 2 < n and data[j] == data[j + 1] == data[j + 2]:
                break
            j += 1
        out.append(j - i - 1)
        out += data[i:j]
        i = j
    return bytes(out)


def packbits_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    i = 0
    while len(out) < expected:
        if i >= len(data):
            raise ValueError("PackBits stream truncated")
        n = struct.unpack_from("b", data, i)[0]
        i += 1
        if n >= 0:
            chunk = data[i : i + n + 1]
            if len(chunk) != n + 1:
                raise ValueError("PackBits literal truncated")
            out += chunk
            i += n + 1
        elif n != -128:
            if i >= len(data):
                raise ValueError("PackBits run truncated")
            out += bytes([data[i]]) * (1 - n)
            i += 1
    if len(out) != expected:
        raise ValueError(f"PackBits decoded {len(out)} bytes, want {expected}")
    return bytes(out)


def tiff_encode(
    width: int,
    height: int,
    rgb_rows: list[bytes],
    compression: str = "packbits",
    rows_per_strip: int = 4,
) -> bytes:
    """Encode top-down RGB rows to a single-IFD little-endian TIFF."""
    if len(rgb_rows) != height:
        raise ValueError(f"got {len(rgb_rows)} rows, want {height}")
    if any(len(r) != width * 3 for r in rgb_rows):
        raise ValueError("row byte length != 3*width")
    comp = {"none": _COMP_NONE, "packbits": _COMP_PACKBITS}[compression]
    strips = []
    for s in range(0, height, rows_per_strip):
        raw = b"".join(rgb_rows[s : s + rows_per_strip])
        strips.append(packbits_encode(raw) if comp == _COMP_PACKBITS else raw)

    n_tags = 9
    # layout: header(8) | IFD | BPS value(6) | strip offset/count arrays | strips
    ifd_off = 8
    ifd_size = 2 + n_tags * 12 + 4
    bps_off = ifd_off + ifd_size
    n_strips = len(strips)
    arr_bytes = 4 * n_strips if n_strips > 1 else 0
    so_off = bps_off + 6
    sc_off = so_off + arr_bytes
    data_off = sc_off + arr_bytes
    offsets = []
    pos = data_off
    for s in strips:
        offsets.append(pos)
        pos += len(s)

    def tag(tid: int, ttype: int, count: int, value: int) -> bytes:
        return struct.pack("<HHII", tid, ttype, count, value)

    entries = [
        tag(_WIDTH, 3, 1, width),
        tag(_HEIGHT, 3, 1, height),
        tag(_BPS, 3, 3, bps_off),
        tag(_COMPRESSION, 3, 1, comp),
        tag(_PHOTO, 3, 1, 2),  # RGB
        tag(
            _STRIP_OFFSETS, 4, n_strips,
            offsets[0] if n_strips == 1 else so_off,
        ),
        tag(_SPP, 3, 1, 3),
        tag(_ROWS_PER_STRIP, 3, 1, rows_per_strip),
        tag(
            _STRIP_COUNTS, 4, n_strips,
            len(strips[0]) if n_strips == 1 else sc_off,
        ),
    ]
    out = bytearray()
    out += b"II" + struct.pack("<HI", 42, ifd_off)
    out += struct.pack("<H", n_tags) + b"".join(entries) + struct.pack("<I", 0)
    out += struct.pack("<HHH", 8, 8, 8)  # bits per sample
    if n_strips > 1:
        out += struct.pack(f"<{n_strips}I", *offsets)
        out += struct.pack(f"<{n_strips}I", *[len(s) for s in strips])
    for s in strips:
        out += s
    return bytes(out)


def tiff_decode(payload: bytes) -> tuple[int, int, list[bytes]]:
    """Decode a baseline RGB TIFF (either byte order, compression none
    or PackBits) to (width, height, top-down RGB rows)."""
    bo = payload[:2]
    if bo == b"II":
        e = "<"
    elif bo == b"MM":
        e = ">"
    else:
        raise ValueError("not a TIFF stream (bad byte-order mark)")
    magic, ifd_off = struct.unpack_from(e + "HI", payload, 2)
    if magic != 42:
        raise ValueError(f"bad TIFF magic {magic}")
    (n_tags,) = struct.unpack_from(e + "H", payload, ifd_off)
    tags: dict[int, tuple[int, int, int]] = {}
    for i in range(n_tags):
        tid, ttype, count, value = struct.unpack_from(
            e + "HHII", payload, ifd_off + 2 + i * 12
        )
        if ttype == 3 and count == 1:  # SHORT packed into the value field
            value = value & 0xFFFF if e == "<" else value >> 16
        tags[tid] = (ttype, count, value)

    def arr(tid: int) -> list[int]:
        ttype, count, value = tags[tid]
        if count == 1:
            return [value]
        fmt = "H" if ttype == 3 else "I"
        size = 2 if ttype == 3 else 4
        return list(struct.unpack_from(e + fmt * count, payload, value))

    for required in (_WIDTH, _HEIGHT, _STRIP_OFFSETS, _STRIP_COUNTS):
        if required not in tags:
            raise ValueError(f"missing required TIFF tag {required}")
    width = tags[_WIDTH][2]
    height = tags[_HEIGHT][2]
    comp = tags.get(_COMPRESSION, (3, 1, _COMP_NONE))[2]
    spp = tags.get(_SPP, (3, 1, 1))[2]
    if spp != 3 or tags.get(_PHOTO, (3, 1, 2))[2] != 2:
        raise NotImplementedError("only RGB (3 samples, photometric 2) supported")
    if comp not in (_COMP_NONE, _COMP_PACKBITS):
        raise NotImplementedError(f"unsupported TIFF compression {comp}")
    rps = tags.get(_ROWS_PER_STRIP, (4, 1, height))[2]
    offsets, counts = arr(_STRIP_OFFSETS), arr(_STRIP_COUNTS)
    raw = bytearray()
    for si, (off, cnt) in enumerate(zip(offsets, counts)):
        strip = payload[off : off + cnt]
        if len(strip) != cnt:
            raise ValueError("truncated TIFF strip")
        rows_here = min(rps, height - si * rps)
        expected = rows_here * width * 3
        raw += (
            packbits_decode(strip, expected)
            if comp == _COMP_PACKBITS
            else strip
        )
    if len(raw) != width * height * 3:
        raise ValueError(
            f"decoded {len(raw)} pixel bytes, want {width * height * 3}"
        )
    rb = width * 3
    return width, height, [bytes(raw[r * rb : (r + 1) * rb]) for r in range(height)]
