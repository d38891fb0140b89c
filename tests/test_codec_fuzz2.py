"""Adversarial randomized fuzz, wave 2: BMP / Y4M / WAV / PNG (the
codecs that predate round 9's fuzz discipline in test_codec_fuzz.py).
Same policy — >=100 seeded-random instances per codec plus the
stream-shape corners the in-repo encoders never produce:

- BMP: top-down (negative height) pixel order from a test-side
  synthesizer, non-multiple-of-4 row padding, trailing garbage.
- Y4M: FRAME lines carrying parameters (spec-legal, encoder never
  writes them), X-token stream headers, every=k frame sampling.
- WAV: junk LIST chunks with odd sizes in the RIFF walk, G.711
  involution across all 256 codes, IMA-ADPCM block-boundary counts.
- PNG: Adam7 at degenerate geometries (1xN, Nx1 — empty passes),
  every filter plan, palette and 16-bit variants.
"""

from __future__ import annotations

import random
import struct

import pytest

from my_flink_1_10_2_spark.llm.bmp import bmp_decode, bmp_encode
from my_flink_1_10_2_spark.llm.png import (
    png_decode,
    png_decode_deep,
    png_encode,
    png_encode_deep,
)
from my_flink_1_10_2_spark.llm.wav import (
    alaw_decode_sample,
    alaw_encode_sample,
    mulaw_decode_sample,
    mulaw_encode_sample,
    wav_decode,
    wav_encode,
    wav_encode_adpcm,
    wav_encode_g711,
)
from my_flink_1_10_2_spark.llm.y4m import y4m_decode, y4m_encode

# ------------------------------------------------------------------- BMP


def _rgb_rows(rng: random.Random, w: int, h: int) -> list[bytes]:
    return [bytes(rng.randrange(256) for _ in range(w * 3)) for _ in range(h)]


def test_bmp_fuzz_roundtrip():
    rng = random.Random(830)
    for trial in range(120):
        # widths hitting every pad residue (w*3 mod 4 cycles 0,3,2,1)
        w, h = rng.randint(1, 21), rng.randint(1, 21)
        rows = _rgb_rows(rng, w, h)
        payload = bmp_encode(w, h, rows)
        assert bmp_decode(payload) == (w, h, rows), f"trial {trial}"
        # trailing garbage after the pixel array must not affect decode
        assert bmp_decode(payload + b"\xde\xad\xbe\xef") == (w, h, rows)


def _bmp_encode_topdown(w: int, h: int, rgb_rows: list[bytes]) -> bytes:
    """Negative-height BMP synthesizer: rows stored top-down — the
    spec-legal order the in-repo encoder never writes."""
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    stride = row_bytes + pad
    pixel_off = 14 + 40
    out = bytearray()
    out += b"BM" + struct.pack("<IHHI", pixel_off + stride * h, 0, 0, pixel_off)
    out += struct.pack(
        "<IiiHHIIiiII", 40, w, -h, 1, 24, 0, stride * h, 2835, 2835, 0, 0
    )
    for row in rgb_rows:  # natural order, no reversal
        bgr = bytearray(row_bytes)
        bgr[0::3] = row[2::3]
        bgr[1::3] = row[1::3]
        bgr[2::3] = row[0::3]
        out += bgr + b"\x00" * pad
    return bytes(out)


def test_bmp_fuzz_topdown_negative_height():
    rng = random.Random(831)
    for trial in range(100):
        w, h = rng.randint(1, 17), rng.randint(1, 17)
        rows = _rgb_rows(rng, w, h)
        td = _bmp_encode_topdown(w, h, rows)
        bu = bmp_encode(w, h, rows)
        assert bmp_decode(td) == bmp_decode(bu) == (w, h, rows), f"trial {trial}"


# ------------------------------------------------------------------- Y4M


def _planes(rng: random.Random, ysz: int, csz: int) -> tuple[bytes, bytes, bytes]:
    return (
        bytes(rng.randrange(256) for _ in range(ysz)),
        bytes(rng.randrange(256) for _ in range(csz)),
        bytes(rng.randrange(256) for _ in range(csz)),
    )


def test_y4m_fuzz_roundtrip_and_sampling():
    rng = random.Random(832)
    for trial in range(100):
        chroma = rng.choice(["420jpeg", "420", "420mpeg2", "444"])
        if chroma == "444":
            w, h = rng.randint(1, 16), rng.randint(1, 16)
            ysz, csz = w * h, w * h
        else:
            w, h = rng.randrange(2, 17, 2), rng.randrange(2, 17, 2)
            ysz, csz = w * h, (w // 2) * (h // 2)
        n = rng.randint(1, 8)
        frames = [_planes(rng, ysz, csz) for _ in range(n)]
        every = rng.randint(1, 4)
        payload = y4m_encode(w, h, frames, chroma=chroma)
        w2, h2, c2, total, sampled = y4m_decode(payload, every=every)
        assert (w2, h2, c2, total) == (w, h, chroma, n), f"trial {trial}"
        assert sampled == frames[::every], f"trial {trial}"


def test_y4m_frame_parameters_and_x_tokens():
    """Spec-legal stream shapes the encoder never writes: FRAME lines
    carrying interlace/X parameters, and X-comment tokens in the stream
    header — both must be skipped, not choked on."""
    rng = random.Random(833)
    for trial in range(100):
        w, h = rng.randrange(2, 13, 2), rng.randrange(2, 13, 2)
        ysz, csz = w * h, (w // 2) * (h // 2)
        frames = [_planes(rng, ysz, csz) for _ in range(rng.randint(1, 4))]
        head = (
            f"YUV4MPEG2 W{w} H{h} F30000:1001 Ip A1:1 C420jpeg "
            f"XYSCSS=420JPEG Xcomment{trial}\n"
        ).encode()
        body = bytearray()
        for y, u, v in frames:
            params = rng.choice([b"", b" Ip", b" Xtag=1", b" Ip Xz"])
            body += b"FRAME" + params + b"\n" + y + u + v
        w2, h2, c2, total, sampled = y4m_decode(bytes(head + body))
        assert (w2, h2, total) == (w, h, len(frames)), f"trial {trial}"
        assert sampled == frames


# ------------------------------------------------------------------- WAV


def test_wav_pcm_fuzz_roundtrip_with_junk_chunks():
    rng = random.Random(834)
    for trial in range(120):
        bits = rng.choice([8, 16])
        channels = rng.randint(1, 4)
        n = rng.randint(0, 100) * channels
        if bits == 16:
            samples = [rng.randint(-32768, 32767) for _ in range(n)]
        else:
            samples = [rng.randrange(256) for _ in range(n)]
        rate = rng.randint(1, 192000)
        payload = wav_encode(
            samples, sample_rate=rate, channels=channels, bits=bits
        )
        assert wav_decode(payload) == (rate, channels, bits, samples)
        # splice an odd-sized LIST chunk between fmt and data
        jlen = rng.choice([1, 3, 5])
        junk = (
            b"LIST" + struct.pack("<I", jlen)
            + bytes(rng.randrange(256) for _ in range(jlen)) + b"\x00"
        )
        fmt_end = 12 + 8 + 16  # RIFF hdr + fmt chunk (16-byte PCM fmt)
        spliced = bytearray(payload)
        spliced[fmt_end:fmt_end] = junk
        struct.pack_into("<I", spliced, 4, len(spliced) - 8)
        assert wav_decode(bytes(spliced)) == (rate, channels, bits, samples), (
            f"trial {trial}"
        )


def test_g711_involution_all_codes():
    """encode(decode(b)) == b for every byte value — the table-level
    identity both ITU-T G.711 laws must satisfy (stronger than a
    tolerance check: any off-by-one in segment math breaks it).  The
    single sanctioned exception: mu-law 0x7F is the non-canonical
    'negative zero' — it decodes to 0, which re-encodes to the
    canonical positive-zero code 0xFF."""
    for b in range(256):
        got = mulaw_encode_sample(mulaw_decode_sample(b))
        if b == 0x7F:
            assert got == 0xFF and mulaw_decode_sample(b) == 0
        else:
            assert got == b, f"mu {b}"
        assert alaw_encode_sample(alaw_decode_sample(b)) == b, f"A {b}"


def test_g711_quantization_error_bound():
    rng = random.Random(835)
    for _ in range(500):
        x = rng.randint(-32768, 32767)
        for enc, dec, bound in (
            (mulaw_encode_sample, mulaw_decode_sample, 1024),
            (alaw_encode_sample, alaw_decode_sample, 1024),
        ):
            y = dec(enc(x))
            assert abs(y - max(-32767, x)) <= bound, (x, y)


def test_wav_g711_container_fuzz():
    rng = random.Random(836)
    for trial in range(100):
        law = rng.choice(["mu", "a"])
        n = rng.randint(0, 300)
        samples = [rng.randint(-32768, 32767) for _ in range(n)]
        payload = wav_encode_g711(samples, law=law, sample_rate=8000)
        rate, ch, bits, back = wav_decode(payload)
        assert (rate, ch, bits) == (8000, 1, 16)
        enc = mulaw_encode_sample if law == "mu" else alaw_encode_sample
        dec = mulaw_decode_sample if law == "mu" else alaw_decode_sample
        assert back == [dec(enc(s)) for s in samples], f"trial {trial}"


def test_wav_adpcm_fuzz_block_boundaries():
    """IMA ADPCM is lossy but deterministic: decode(encode(x)) must be
    stable (re-encoding the decoded signal reproduces it exactly — the
    codec is idempotent on its own output) and sample counts must
    survive every block-boundary residue, incl. the one-sample block."""
    rng = random.Random(837)
    for trial in range(100):
        n = rng.choice(
            [0, 1, 2, 504, 505, 506, 1009, 1010, 1011, rng.randint(3, 2000)]
        )
        # smooth-ish signal: ADPCM tracks it closely, keeps values sane
        samples, v = [], 0
        for _ in range(n):
            v = max(-32768, min(32767, v + rng.randint(-500, 500)))
            samples.append(v)
        payload = wav_encode_adpcm(samples, sample_rate=8000)
        rate, ch, bits, once = wav_decode(payload)
        assert (rate, ch, bits, len(once)) == (8000, 1, 16, n), f"trial {trial}"
        twice = wav_decode(wav_encode_adpcm(once, sample_rate=8000))[3]
        assert twice == once, f"trial {trial}: ADPCM not idempotent"


# ------------------------------------------------------------------- AVI


def test_avi_fuzz_roundtrip_and_sampling():
    """MJPEG-AVI container walk: opaque frame payloads (odd AND even
    lengths — the word-alignment rule) survive the roundtrip, and
    every=k keeps exactly frames 0, k, 2k, ..."""
    from my_flink_1_10_2_spark.llm.avi import avi_encode_mjpeg, avi_frames

    rng = random.Random(841)
    for trial in range(100):
        w, h = rng.randint(1, 64), rng.randint(1, 64)
        n = rng.randint(1, 9)
        frames = [
            bytes(rng.randrange(256) for _ in range(rng.randint(1, 400)))
            for _ in range(n)
        ]
        every = rng.randint(1, 4)
        payload = avi_encode_mjpeg(w, h, frames, fps=rng.randint(1, 60))
        w2, h2, total, back = avi_frames(payload, every=every)
        assert (w2, h2, total) == (w, h, n), f"trial {trial}"
        assert back == frames[::every], f"trial {trial}"


def test_avi_junk_chunks_are_skipped():
    """Real-world AVIs carry JUNK alignment chunks (odd sizes included)
    the in-repo encoder never writes — splice them between top-level
    chunks and decode must be unaffected."""
    from my_flink_1_10_2_spark.llm.avi import avi_encode_mjpeg, avi_frames

    rng = random.Random(842)
    for trial in range(100):
        frames = [
            bytes(rng.randrange(256) for _ in range(rng.randint(1, 200)))
            for _ in range(rng.randint(1, 5))
        ]
        payload = avi_encode_mjpeg(17, 11, frames)
        jlen = rng.choice([1, 2, 3, 512])
        junk = (
            b"JUNK" + struct.pack("<I", jlen)
            + bytes(rng.randrange(256) for _ in range(jlen))
            + (b"\x00" if jlen % 2 else b"")
        )
        # after the 'AVI ' form type, before the hdrl LIST
        spliced = bytearray(payload)
        spliced[12:12] = junk
        struct.pack_into("<I", spliced, 4, len(spliced) - 8)
        w2, h2, total, back = avi_frames(bytes(spliced))
        assert (w2, h2, total, back) == (17, 11, len(frames), frames), (
            f"trial {trial}"
        )


# ------------------------------------------------------------------- PNG


def test_png_fuzz_roundtrip_degenerate_adam7():
    """Adam7 passes are EMPTY for 1xN / Nx1 / tiny images (pass grids
    miss the image entirely) — the classic interlace corner."""
    rng = random.Random(838)
    geoms = [(1, 1), (1, 7), (7, 1), (2, 2), (3, 5), (8, 8), (9, 3)]
    for trial in range(120):
        w, h = geoms[trial % len(geoms)] if trial < 60 else (
            rng.randint(1, 24), rng.randint(1, 24)
        )
        channels = rng.choice([1, 3, 4])
        pixels = bytes(rng.randrange(256) for _ in range(w * h * channels))
        plan = rng.choice(["none", "mixed"])
        for interlace in (False, True):
            payload = png_encode(
                w, h, pixels, channels=channels, filter_plan=plan,
                interlace=interlace,
            )
            w2, h2, ch2, px2 = png_decode(payload)
            assert (w2, h2, ch2, px2) == (w, h, channels, pixels), (
                f"trial {trial} interlace={interlace}"
            )


def test_png_palette_fuzz():
    rng = random.Random(839)
    for trial in range(100):
        w, h = rng.randint(1, 20), rng.randint(1, 20)
        n_colors = rng.randint(1, 256)
        palette = [
            (rng.randrange(256), rng.randrange(256), rng.randrange(256))
            for _ in range(n_colors)
        ]
        idx = bytes(rng.randrange(n_colors) for _ in range(w * h))
        payload = png_encode(w, h, idx, palette=palette)
        w2, h2, ch2, px2 = png_decode(payload)
        # palette decode expands to RGB triples
        want = b"".join(bytes(palette[i]) for i in idx)
        assert (w2, h2) == (w, h) and px2 == want, f"trial {trial}"


def test_png_deep16_fuzz():
    rng = random.Random(840)
    for trial in range(100):
        w, h = rng.randint(1, 12), rng.randint(1, 12)
        channels = rng.choice([1, 3, 4])
        samples = [rng.randrange(65536) for _ in range(w * h * channels)]
        interlace = rng.random() < 0.5
        payload = png_encode_deep(
            w, h, samples, channels=channels, interlace=interlace
        )
        w2, h2, ch2, depth, back = png_decode_deep(payload)
        assert (w2, h2, ch2, depth, back) == (w, h, channels, 16, samples), (
            f"trial {trial}"
        )
