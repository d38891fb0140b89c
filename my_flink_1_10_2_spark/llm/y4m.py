"""YUV4MPEG2 (.y4m) raw-video codec — the uncompressed interchange
format every video toolchain (ffmpeg, mjpegtools, VP9/AV1 reference
encoders) reads and writes; implemented from the public mjpegtools
specification of the stream layout:

  stream := "YUV4MPEG2" {' ' param}* '\\n' frame*
  frame  := "FRAME" {' ' param}* '\\n' Y-plane U-plane V-plane

Params: W<width> H<height> F<num>:<den> I<p|t|b> A<num>:<den>
C<chroma>.  Supported chroma tags: ``C444`` (full-resolution planes)
and ``C420jpeg``/``C420`` (2x2-subsampled chroma, even dimensions
required).  Everything is byte-planar and uncompressed, so the decoder
is pure slicing — the value of the operator is the CONTAINER walk
(param parsing, frame framing, plane geometry) plus the frame-sampling
contract shared with llm/avi.py: skipped frames are seeked past, never
materialized.

Ref parity: multimodal ingestion surface alongside the AVI/MJPEG path
(reference has no video codecs; this extends the training-data pipeline
family the same way llm/png.py and llm/jpeg.py do).
"""

from __future__ import annotations

_MAGIC = b"YUV4MPEG2"


def _plane_sizes(width: int, height: int, chroma: str) -> tuple[int, int]:
    """(luma_bytes, chroma_bytes_per_plane) for a frame."""
    if chroma == "444":
        return width * height, width * height
    if chroma in ("420jpeg", "420", "420mpeg2", "420paldv"):
        if width % 2 or height % 2:
            raise ValueError(f"C420 requires even dimensions, got {width}x{height}")
        return width * height, (width // 2) * (height // 2)
    raise NotImplementedError(f"unsupported chroma tag C{chroma}")


def y4m_encode(
    width: int,
    height: int,
    frames: list[tuple[bytes, bytes, bytes]],
    rate: tuple[int, int] = (25, 1),
    chroma: str = "420jpeg",
) -> bytes:
    """Encode planar YUV frames to a .y4m stream."""
    ysz, csz = _plane_sizes(width, height, chroma)
    out = bytearray()
    out += _MAGIC + (
        f" W{width} H{height} F{rate[0]}:{rate[1]} Ip A1:1 C{chroma}\n"
    ).encode("ascii")
    for y, u, v in frames:
        if len(y) != ysz or len(u) != csz or len(v) != csz:
            raise ValueError(
                f"plane size mismatch: got ({len(y)},{len(u)},{len(v)}), "
                f"want ({ysz},{csz},{csz})"
            )
        out += b"FRAME\n"
        out += y + u + v
    return bytes(out)


def y4m_decode(
    payload: bytes, every: int = 1
) -> tuple[int, int, str, int, list[tuple[bytes, bytes, bytes]]]:
    """Decode a .y4m stream, keeping every ``every``-th frame (others are
    seeked past without materializing — the production sampler shape).

    Returns (width, height, chroma, n_frames_total, sampled_planes)."""
    if not payload.startswith(_MAGIC):
        raise ValueError("not a YUV4MPEG2 stream (bad magic)")
    nl = payload.index(b"\n")
    width = height = None
    chroma = "420jpeg"
    for tok in payload[len(_MAGIC) : nl].split():
        tag, val = chr(tok[0]), tok[1:].decode("ascii")
        if tag == "W":
            width = int(val)
        elif tag == "H":
            height = int(val)
        elif tag == "C":
            chroma = val
        elif tag == "F":
            num, den = val.split(":")
            if int(num) <= 0 or int(den) <= 0:
                raise ValueError(f"bad frame rate {val}")
        elif tag in ("I", "A", "X"):
            pass
        else:
            raise ValueError(f"unknown stream parameter {tok!r}")
    if not width or not height:
        raise ValueError("stream header missing W/H")
    ysz, csz = _plane_sizes(width, height, chroma)
    frame_bytes = ysz + 2 * csz
    i = nl + 1
    n_frames = 0
    sampled: list[tuple[bytes, bytes, bytes]] = []
    while i < len(payload):
        if not payload.startswith(b"FRAME", i):
            raise ValueError(f"expected FRAME marker at offset {i}")
        fnl = payload.index(b"\n", i)
        i = fnl + 1
        if i + frame_bytes > len(payload):
            raise ValueError("truncated frame data")
        if n_frames % every == 0:
            y = payload[i : i + ysz]
            u = payload[i + ysz : i + ysz + csz]
            v = payload[i + ysz + csz : i + frame_bytes]
            sampled.append((y, u, v))
        i += frame_bytes
        n_frames += 1
    return width, height, chroma, n_frames, sampled
