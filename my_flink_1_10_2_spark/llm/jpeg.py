"""Pure-Python baseline JPEG codec (grayscale, sequential DCT).

Closes the last gated image leg of the multimodal column (llm/png.py
did PNG; llm/wav.py did audio): a self-contained implementation of the
PUBLIC baseline JPEG pipeline (ITU-T T.81) — level shift, 8×8 DCT,
quantization, zigzag, DC DPCM + AC run-length, canonical Huffman coding
with the Annex-K luminance tables, JFIF marker framing with byte
stuffing — and the full inverse.  Single-component (grayscale) 8-bit
baseline only; anything else (progressive, chroma subsampling, 12-bit,
arithmetic coding) raises loudly.

Exactness contract for grading: JPEG is lossy in general, but an image
made of CONSTANT 8×8 tiles holds only DC energy, and an even gray level
v makes the DC coefficient 8·(v−128) an exact multiple of the standard
luminance quant step Q00=16 — quantize→dequantize→IDCT reproduces every
pixel bit-exactly.  The graded query builds such quant-exact tile
images from a closed-form rule, round-trips them through THIS codec,
and the decoded pixel statistics replay in SQL.  Natural images decode
with the usual bounded quantization error (property-tested).

The DHT/DQT segments are explicit in the stream (self-describing), so
decode correctness never depends on table choice; the standard tables
are used for spec fidelity.
"""

from __future__ import annotations

import struct

import numpy as np

# ITU-T T.81 Annex K.1 — standard luminance quantization table (natural
# row-major order).  Q[0,0]=16 is the DC step the exactness contract
# leans on.
STD_LUMA_QUANT = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int32,
)

# Annex K.3 — DC luminance Huffman spec (BITS, HUFFVAL)
DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_VALS = list(range(12))

# Annex K.5 — AC luminance Huffman spec
AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _zigzag_order() -> list[tuple[int, int]]:
    """The 64 (row, col) positions in JPEG zigzag order, generated from
    the diagonal rule (odd diagonals walk down, even walk up)."""
    out = []
    for d in range(15):
        rng = range(max(0, d - 7), min(d, 7) + 1)  # valid row indexes
        rows = rng if d % 2 == 1 else reversed(rng)
        out.extend((r, d - r) for r in rows)
    return out


ZIGZAG = _zigzag_order()
# vectorized zigzag gather/scatter indices (row/col arrays)
_ZIG_R = np.array([r for r, _ in ZIGZAG])
_ZIG_C = np.array([c for _, c in ZIGZAG])

_M = None  # orthonormal DCT-II matrix (== the T.81 DCT scaling)


def _dct_matrix() -> np.ndarray:
    global _M
    if _M is None:
        x = np.arange(8)
        u = x.reshape(-1, 1)
        m = np.cos((2 * x + 1) * u * np.pi / 16)
        m[0, :] *= np.sqrt(1.0 / 8.0)
        m[1:, :] *= 0.5
        _M = m
    return _M


# -- bit I/O with byte stuffing ---------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.bytes = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.bytes.append(b)
            if b == 0xFF:
                self.bytes.append(0x00)  # byte stuffing (T.81 §B.1.1.5)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def align(self) -> None:
        """Pad to a byte boundary with 1-bits (T.81 §B.2.1 — the fill
        before a restart marker)."""
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)

    def marker(self, byte2: int) -> None:
        """Emit a raw 0xFF<byte2> marker (NOT byte-stuffed — markers are
        the one legal 0xFF sequence inside entropy data)."""
        self.align()
        self.bytes += bytes((0xFF, byte2))

    def flush(self) -> bytes:
        self.align()
        return bytes(self.bytes)


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read(self, length: int) -> int:
        while self.nbits < length:
            if self.pos >= len(self.data):
                raise ValueError("JPEG entropy stream exhausted")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                if self.pos >= len(self.data):
                    raise ValueError("JPEG stream ends mid-marker")
                nxt = self.data[self.pos]
                if nxt == 0x00:
                    self.pos += 1  # stuffed byte
                else:
                    raise ValueError(f"unexpected marker 0xFF{nxt:02X} in scan")
            self.acc = (self.acc << 8) | b
            self.nbits += 8
        out = (self.acc >> (self.nbits - length)) & ((1 << length) - 1)
        self.nbits -= length
        self.acc &= (1 << self.nbits) - 1
        return out

    def restart(self, expected_n: int) -> None:
        """Consume an RSTn marker: discard fill bits to the byte
        boundary, require 0xFF 0xD0+n with the cyclically expected n
        (T.81 §B.2.1 / §E.1.4), leaving the reader clean for the next
        restart segment."""
        self.acc, self.nbits = 0, 0
        if self.pos + 2 > len(self.data):
            raise ValueError("JPEG stream ends where a restart marker is due")
        b0, b1 = self.data[self.pos], self.data[self.pos + 1]
        if b0 != 0xFF or not 0xD0 <= b1 <= 0xD7:
            raise ValueError(
                f"expected restart marker, got 0x{b0:02X}{b1:02X}"
            )
        if b1 - 0xD0 != expected_n:
            raise ValueError(
                f"restart marker out of sequence: got RST{b1 - 0xD0}, "
                f"expected RST{expected_n}"
            )
        self.pos += 2


# -- canonical Huffman tables ------------------------------------------------------


import functools


@functools.lru_cache(maxsize=64)
def _build_codes_cached(bits: tuple, vals: tuple) -> dict:
    return _build_codes(bits, vals)


@functools.lru_cache(maxsize=64)
def _build_decoder_cached(bits: tuple, vals: tuple) -> dict:
    return _build_decoder(bits, vals)


def _build_codes(bits, vals) -> dict[int, tuple[int, int]]:
    """value → (code, length) canonical assignment (T.81 Annex C);
    memoized on the table spec (DHT segments repeat across images)."""
    if not isinstance(bits, tuple):
        return _build_codes_cached(tuple(bits), tuple(vals))
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _build_decoder(bits, vals) -> dict[tuple[int, int], int]:
    """(length, code) → value; memoized like _build_codes."""
    if not isinstance(bits, tuple):
        return _build_decoder_cached(tuple(bits), tuple(vals))
    return {(ln, c): v for v, (c, ln) in _build_codes(bits, vals).items()}


def _magnitude(v: int) -> tuple[int, int]:
    """JPEG magnitude coding: value → (size, bits)."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    bits = v if v >= 0 else v + (1 << size) - 1
    return size, bits


def _extend(bits: int, size: int) -> int:
    if size == 0:
        return 0
    if bits < (1 << (size - 1)):
        return bits - (1 << size) + 1
    return bits


def _unstuff_scan(data: bytes) -> bytes:
    """Entropy-coded data up to the first real marker, with the
    byte-stuffing (FF 00 → FF, T.81 §B.1.1.5) removed in one pass —
    the precondition for :class:`_FastBitReader`.  Restart markers are
    treated as terminators (callers using RSTn keep the per-bit
    reader)."""
    import re

    m = re.search(rb"\xff[^\x00]", data)
    end = m.start() if m else len(data)
    return data[:end].replace(b"\xff\x00", b"\xff")


class _FastBitReader:
    """Bit cursor over UNSTUFFED entropy data: 16-bit peeks feed the
    LUT Huffman decoder (one dict-free lookup per symbol instead of a
    per-bit canonical-tree walk).  ~4 zero bytes of tail padding keep
    the 32-bit window fetch in-bounds at stream end."""

    __slots__ = ("buf", "bitpos", "nbits")

    def __init__(self, data: bytes):
        # 8 pad bytes: block decoders fetch 48-bit windows that may
        # start on the last real byte
        self.buf = _unstuff_scan(data) + b"\x00" * 8
        self.nbits = (len(self.buf) - 8) * 8
        self.bitpos = 0

    def peek16(self) -> int:
        bp = self.bitpos
        byte = bp >> 3
        word = int.from_bytes(self.buf[byte : byte + 4], "big")
        return (word >> (16 - (bp & 7))) & 0xFFFF

    def read(self, n: int) -> int:
        bp = self.bitpos
        if bp + n > self.nbits:
            raise ValueError("JPEG entropy stream exhausted")
        byte = bp >> 3
        word = int.from_bytes(self.buf[byte : byte + 4], "big")
        self.bitpos = bp + n
        return (word >> (32 - (bp & 7) - n)) & ((1 << n) - 1)


@functools.lru_cache(maxsize=64)
def _build_lut(bits: tuple, vals: tuple) -> list:
    """16-bit-prefix Huffman LUT: lut[peek16()] = (value << 5) | length,
    0 for invalid prefixes.  One lookup decodes any code (max length 16);
    memoized on the table spec like the other table builders."""
    lut = [0] * 65536
    for val, (code, length) in _build_codes(bits, vals).items():
        base = code << (16 - length)
        span = 1 << (16 - length)
        lut[base : base + span] = [(val << 5) | length] * span
    return lut


def _decode_block_lut(r, pred: int, dc_lut: list, ac_lut: list,
                      zz: list[int]) -> int:
    """One baseline block via the 16-bit-prefix Huffman LUTs over a
    :class:`_FastBitReader` (jpeg.py).  Each coefficient costs ONE
    48-bit window fetch: the Huffman symbol (≤16 bits) and its magnitude
    bits (≤11) are sliced from the same word — no per-bit calls, no
    second fetch.  Fills ``zz`` (caller-zeroed, len 64) and returns the
    new DC predictor.  Truncation is caught at block entry (the reader's
    zero padding keeps intra-block fetches in-bounds)."""
    buf = r.buf
    bp = r.bitpos
    if bp > r.nbits:
        raise ValueError("JPEG entropy stream exhausted")
    word = int.from_bytes(buf[bp >> 3 : (bp >> 3) + 6], "big")
    off = bp & 7
    e = dc_lut[(word >> (32 - off)) & 0xFFFF]
    if not e:
        raise ValueError("invalid Huffman code in scan")
    ln = e & 31
    size = e >> 5
    if size:
        v = (word >> (48 - off - ln - size)) & ((1 << size) - 1)
        pred += v if v >> (size - 1) else v - (1 << size) + 1
    bp += ln + size
    zz[0] = pred
    i = 1
    while i < 64:
        word = int.from_bytes(buf[bp >> 3 : (bp >> 3) + 6], "big")
        off = bp & 7
        e = ac_lut[(word >> (32 - off)) & 0xFFFF]
        if not e:
            raise ValueError("invalid Huffman code in scan")
        ln = e & 31
        rs = e >> 5
        if rs == 0x00:
            bp += ln
            break
        if rs == 0xF0:
            bp += ln
            i += 16
            continue
        i += rs >> 4
        size = rs & 0x0F
        if i > 63:
            raise ValueError("AC run past block end")
        v = (word >> (48 - off - ln - size)) & ((1 << size) - 1)
        zz[i] = v if v >> (size - 1) else v - (1 << size) + 1
        bp += ln + size
        i += 1
    r.bitpos = bp
    return pred



# -- encoder ----------------------------------------------------------------------


def jpeg_encode_gray(
    width: int, height: int, pixels: bytes, quant: np.ndarray | None = None,
    restart_interval: int = 0,
) -> bytes:
    """Encode 8-bit grayscale pixels (row-major) as a baseline JFIF
    JPEG.  Partial edge blocks are padded by edge replication.
    ``restart_interval`` > 0 emits a DRI segment and an RSTn marker
    (n cycling 0-7) every that-many MCUs with the DC predictor reset —
    T.81 §B.2.4.4 / §E.1.4, the resync points real encoders insert."""
    if len(pixels) != width * height:
        raise ValueError(f"expected {width * height} pixels, got {len(pixels)}")
    q = STD_LUMA_QUANT if quant is None else np.asarray(quant, dtype=np.int32)
    img = np.frombuffer(bytes(pixels), dtype=np.uint8).reshape(height, width)
    bh, bw = -(-height // 8) * 8, -(-width // 8) * 8
    padded = np.empty((bh, bw), dtype=np.float64)
    padded[:height, :width] = img
    padded[height:, :width] = img[-1:, :]
    padded[:, width:] = padded[:, width - 1 : width]

    m = _dct_matrix()
    dc_codes = _build_codes(DC_BITS, DC_VALS)
    ac_codes = _build_codes(AC_BITS, AC_VALS)
    w = _BitWriter()
    prev_dc = 0
    mcu = 0
    rst_n = 0
    for by in range(0, bh, 8):
        for bx in range(0, bw, 8):
            if restart_interval and mcu and mcu % restart_interval == 0:
                w.marker(0xD0 + rst_n)
                rst_n = (rst_n + 1) & 7
                prev_dc = 0  # DPCM predictor resets at every restart
            mcu += 1
            block = padded[by : by + 8, bx : bx + 8] - 128.0
            coeffs = m @ block @ m.T
            qc = np.round(coeffs / q).astype(np.int64)
            zz = qc[_ZIG_R, _ZIG_C].tolist()  # vectorized zigzag gather
            # DC: DPCM
            diff = zz[0] - prev_dc
            prev_dc = zz[0]
            size, bits = _magnitude(diff)
            code, ln = dc_codes[size]
            w.write(code, ln)
            if size:
                w.write(bits, size)
            # AC: run-length of zeros + magnitude
            run = 0
            last_nz = max((i for i in range(1, 64) if zz[i]), default=0)
            for i in range(1, last_nz + 1):
                v = zz[i]
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, ln = ac_codes[0xF0]  # ZRL
                    w.write(code, ln)
                    run -= 16
                size, bits = _magnitude(v)
                code, ln = ac_codes[run * 16 + size]
                w.write(code, ln)
                w.write(bits, size)
                run = 0
            if last_nz < 63:
                code, ln = ac_codes[0x00]  # EOB
                w.write(code, ln)
    scan = w.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    dqt = bytes([0]) + bytes(int(q[r, c]) for r, c in ZIGZAG)
    out += seg(0xFFDB, dqt)
    sof = struct.pack(">BHHB", 8, height, width, 1) + bytes([1, 0x11, 0])
    out += seg(0xFFC0, sof)
    out += seg(0xFFC4, bytes([0x00]) + bytes(DC_BITS) + bytes(DC_VALS))
    out += seg(0xFFC4, bytes([0x10]) + bytes(AC_BITS) + bytes(AC_VALS))
    if restart_interval:
        out += seg(0xFFDD, struct.pack(">H", restart_interval))
    out += seg(0xFFDA, bytes([1, 1, 0x00, 0, 63, 0]))
    out += scan
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# -- decoder ----------------------------------------------------------------------


def jpeg_decode_gray(data: bytes) -> tuple[int, int, bytes]:
    """Decode a baseline grayscale JPEG → (width, height, pixels).
    Restart intervals (DRI + RSTn resync, DC predictor reset) are
    handled; raises NotImplementedError for progressive/multi-component/
    12-bit streams and ValueError for malformed ones."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class, id) -> decoder map
    width = height = None
    scan_data = None
    dc_id = ac_id = 0
    restart_interval = 0
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = struct.unpack_from(">H", data, pos)[0]
        pos += 2
        if marker == 0xFFD9:  # EOI
            break
        (length,) = struct.unpack_from(">H", data, pos)
        body = data[pos + 2 : pos + length]
        pos += length
        if marker == 0xFFDB:
            off = 0
            while off < len(body):
                pq, tq = body[off] >> 4, body[off] & 0x0F
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables unsupported")
                tbl = np.zeros((8, 8), dtype=np.int32)
                for i, (r, c) in enumerate(ZIGZAG):
                    tbl[r, c] = body[off + 1 + i]
                quant[tq] = tbl
                off += 65
        elif marker == 0xFFC2:
            # progressive DCT: route to the multi-scan decoder
            # (llm/jpeg_progressive.py — spectral selection + successive
            # approximation per T.81 Annex G)
            from my_flink_1_10_2_spark.llm.jpeg_progressive import (
                jpeg_decode_gray_progressive,
            )

            return jpeg_decode_gray_progressive(data)
        elif marker in (0xFFC1, 0xFFC3, 0xFFC5, 0xFFC6, 0xFFC7,
                        0xFFC9, 0xFFCA, 0xFFCB, 0xFFCD, 0xFFCE, 0xFFCF):
            raise NotImplementedError(
                f"only sequential (SOF0) and progressive (SOF2) DCT are "
                f"supported, got SOF marker 0x{marker:04X}"
            )
        elif marker == 0xFFC0:
            precision, height, width, ncomp = struct.unpack_from(">BHHB", body, 0)
            if precision != 8:
                raise NotImplementedError("only 8-bit precision supported")
            if ncomp != 1:
                raise NotImplementedError(
                    "only single-component (grayscale) JPEG supported"
                )
        elif marker == 0xFFC4:
            off = 0
            while off < len(body):
                tc, th = body[off] >> 4, body[off] & 0x0F
                bits = tuple(body[off + 1 : off + 17])
                n = sum(bits)
                vals = tuple(body[off + 17 : off + 17 + n])
                huff[(tc, th)] = (bits, vals)  # DHT spec
                off += 17 + n
        elif marker == 0xFFDA:
            ncomp = body[0]
            if ncomp != 1:
                raise NotImplementedError("multi-component scan unsupported")
            dc_id, ac_id = body[2] >> 4, body[2] & 0x0F
            scan_data = data[pos:]
            break
        elif marker == 0xFFDD:
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        # APPn / COM: skipped
    if width is None or scan_data is None:
        raise ValueError("JPEG missing SOF0 or SOS")

    q = quant[0]
    m = _dct_matrix()
    bh, bw = -(-height // 8), -(-width // 8)

    if not restart_interval:
        # fast path: LUT Huffman over the unstuffed stream + one batched
        # IDCT (the per-bit reader below remains for RSTn resync streams,
        # which the FastBitReader treats as terminators)
        fr = _FastBitReader(scan_data)
        dc_lut = _build_lut(*huff[(0, dc_id)])
        ac_lut = _build_lut(*huff[(1, ac_id)])
        pred = 0
        zz_rows: list[list[int]] = []
        for _ in range(bh * bw):
            zz = [0] * 64
            pred = _decode_block_lut(fr, pred, dc_lut, ac_lut, zz)
            zz_rows.append(zz)
        coeffs = np.zeros((len(zz_rows), 8, 8), dtype=np.float64)
        coeffs[:, _ZIG_R, _ZIG_C] = (
            np.asarray(zz_rows, dtype=np.float64) * q[_ZIG_R, _ZIG_C]
        )
        blocks = m.T @ coeffs @ m + 128.0
        out = blocks.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3).reshape(
            bh * 8, bw * 8
        )
        pixels = np.clip(np.round(out[:height, :width]), 0, 255).astype(np.uint8)
        return width, height, pixels.tobytes()

    dc_table = _build_decoder(*huff[(0, dc_id)])
    ac_table = _build_decoder(*huff[(1, ac_id)])

    def read_code(r: _BitReader, table: dict) -> int:
        code, ln = 0, 0
        while ln < 16:
            code = (code << 1) | r.read(1)
            ln += 1
            if (ln, code) in table:
                return table[(ln, code)]
        raise ValueError("invalid Huffman code in scan")

    out = np.zeros((bh * 8, bw * 8), dtype=np.float64)
    r = _BitReader(scan_data)
    prev_dc = 0
    mcu = 0
    rst_n = 0
    for by in range(bh):
        for bx in range(bw):
            if restart_interval and mcu and mcu % restart_interval == 0:
                r.restart(rst_n)
                rst_n = (rst_n + 1) & 7
                prev_dc = 0
            mcu += 1
            zz = [0] * 64
            size = read_code(r, dc_table)
            diff = _extend(r.read(size), size) if size else 0
            prev_dc += diff
            zz[0] = prev_dc
            i = 1
            while i < 64:
                rs = read_code(r, ac_table)
                if rs == 0x00:  # EOB
                    break
                if rs == 0xF0:  # ZRL
                    i += 16
                    continue
                run, size = rs >> 4, rs & 0x0F
                i += run
                if i > 63:
                    raise ValueError("AC run past block end")
                zz[i] = _extend(r.read(size), size)
                i += 1
            coeffs = np.zeros((8, 8), dtype=np.float64)
            coeffs[_ZIG_R, _ZIG_C] = (
                np.asarray(zz, dtype=np.float64) * q[_ZIG_R, _ZIG_C]
            )
            block = m.T @ coeffs @ m + 128.0
            out[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = block
    pixels = np.clip(np.round(out[:height, :width]), 0, 255).astype(np.uint8)
    return width, height, pixels.tobytes()
