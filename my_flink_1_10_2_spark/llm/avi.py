"""Pure-Python MJPEG/AVI container codec — the REAL video leg of the
multimodal column.

AVI is the public RIFF container (Microsoft's published AVI file-format
spec): ``RIFF('AVI ' LIST('hdrl' avih LIST('strl' strh strf))
LIST('movi' '00dc'…) idx1)``, little-endian chunks, word alignment.
Motion-JPEG stores each frame as an ordinary baseline JPEG inside a
``00dc`` chunk, so with ``llm/jpeg.py`` in the tree a real video path
needs only the container walk: encode N frames → one AVI; decode an AVI
→ the frame JPEGs → pixels.  Frame SAMPLING (every k-th frame — the
training-pipeline op) happens on the chunk index before any pixel work,
exactly like a production frame sampler that avoids decoding dropped
frames.

Scope: single video stream, MJPG fourcc, no audio, no OpenDML
extensions — anything else raises loudly.  All of this is executor-side
byte math used inside Arrow batches; no Spark imports here.
"""

from __future__ import annotations

import struct


def _chunk(fourcc: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) % 2 else b""
    return fourcc + struct.pack("<I", len(body)) + body + pad


def _list(list_type: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", list_type + body)


def avi_encode_mjpeg(
    width: int,
    height: int,
    frames: list[bytes],
    *,
    fps: int = 10,
) -> bytes:
    """Wrap baseline-JPEG frame payloads into a minimal spec-shaped
    MJPEG AVI (avih + vids/MJPG strh + BITMAPINFOHEADER strf + movi +
    idx1)."""
    if not frames:
        raise ValueError("an AVI needs at least one frame")
    max_size = max(len(f) for f in frames)
    avih = struct.pack(
        "<14I",
        1_000_000 // fps,  # dwMicroSecPerFrame
        max_size * fps,  # dwMaxBytesPerSec
        0,  # dwPaddingGranularity
        0x10,  # AVIF_HASINDEX
        len(frames),
        0,  # dwInitialFrames
        1,  # dwStreams
        max_size,  # dwSuggestedBufferSize
        width,
        height,
        0, 0, 0, 0,  # dwReserved
    )
    strh = (
        b"vids"
        + b"MJPG"
        + struct.pack(
            "<10I4H",
            0, 0, 0,  # flags, prio+lang, initial frames
            1, fps,  # scale, rate → fps
            0, len(frames),  # start, length
            max_size, 0xFFFFFFFF, 0,  # bufsize, quality(-1), samplesize
            0, 0, width, height,  # rcFrame
        )
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, width, height, 1, 24, b"MJPG",
        width * height * 3, 0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih) + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi_body = b"movi"
    offsets = []
    for f in frames:
        offsets.append(len(movi_body))  # offset of the ckid within movi
        movi_body += _chunk(b"00dc", f)
    movi = _chunk(b"LIST", movi_body)
    idx = b"".join(
        b"00dc" + struct.pack("<III", 0x10, off, len(frames[i]))
        for i, off in enumerate(offsets)
    )
    riff_body = b"AVI " + hdrl + movi + _chunk(b"idx1", idx)
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def avi_frames(data: bytes, *, every: int = 1) -> tuple[int, int, int, list[bytes]]:
    """Walk an MJPEG AVI → (width, height, n_total_frames,
    [frame JPEG payloads]) keeping every ``every``-th frame (index 0,
    every, 2·every, …) — the sampler skips dropped frames WITHOUT
    decoding them.  Loud on non-AVI RIFFs, non-MJPG streams and
    truncated chunks."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI (bad RIFF header)")
    if every < 1:
        raise ValueError("every must be >= 1")
    pos = 12
    end = 8 + struct.unpack_from("<I", data, 4)[0]
    width = height = None
    handler = None
    frames: list[bytes] = []
    n_total = 0

    def walk(lo: int, hi: int) -> None:
        nonlocal width, height, handler, n_total
        p = lo
        while p + 8 <= hi:
            fourcc = data[p : p + 4]
            (size,) = struct.unpack_from("<I", data, p + 4)
            body_lo, body_hi = p + 8, p + 8 + size
            if body_hi > hi:
                raise ValueError(f"truncated chunk {fourcc!r}")
            if fourcc == b"LIST":
                ltype = data[body_lo : body_lo + 4]
                walk(body_lo + 4, body_hi)
                if ltype not in (b"hdrl", b"strl", b"movi"):
                    pass  # unknown lists are skippable per RIFF rules
            elif fourcc == b"strh":
                if data[body_lo : body_lo + 4] == b"vids":
                    handler = data[body_lo + 4 : body_lo + 8]
            elif fourcc == b"strf" and width is None:
                _sz, w, h = struct.unpack_from("<Iii", data, body_lo)
                width, height = w, abs(h)
            elif fourcc == b"00dc":
                if n_total % every == 0:
                    frames.append(data[body_lo:body_hi])
                n_total += 1
            p = body_hi + (size % 2)  # word alignment

    walk(pos, min(end, len(data)))
    if handler is None or width is None:
        raise ValueError("AVI missing video stream headers")
    if handler != b"MJPG":
        raise NotImplementedError(
            f"only MJPG video streams are supported, got {handler!r}"
        )
    return width, height, n_total, frames


def avi_decode_sampled_pixels(
    data: bytes, *, every: int = 1
) -> tuple[int, int, int, list[bytes]]:
    """(width, height, n_total_frames, [decoded grayscale pixel buffers
    for the sampled frames]) — container walk + per-frame baseline JPEG
    decode (llm/jpeg.py)."""
    from my_flink_1_10_2_spark.llm.jpeg import jpeg_decode_gray

    width, height, n_total, frames = avi_frames(data, every=every)
    out = []
    for f in frames:
        w, h, px = jpeg_decode_gray(f)
        if (w, h) != (width, height):
            raise ValueError(
                f"frame dims {(w, h)} disagree with container {(width, height)}"
            )
        out.append(px)
    return width, height, n_total, out
