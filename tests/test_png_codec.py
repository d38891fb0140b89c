"""Pure-stdlib baseline PNG codec + the real multimodal decode/resize
paths built on it (ref brief: multimodal decode/resize slots — the codec
itself is public-format PNG, RFC 2083 / W3C spec)."""

from __future__ import annotations

import struct
import zlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from my_flink_1_10_2_spark.llm.multimodal import (
    extract_features,
    resize_png,
    synthetic_png_media,
)
from my_flink_1_10_2_spark.llm.png import png_decode, png_encode
from my_flink_1_10_2_spark.queries import read
from tests.conftest import SF_DIR


@settings(max_examples=60, deadline=None)
@given(
    w=st.integers(1, 12),
    h=st.integers(1, 12),
    ch=st.sampled_from([1, 3, 4]),
    plan=st.sampled_from(["none", "mixed"]),
    data=st.data(),
)
def test_roundtrip_property(w, h, ch, plan, data):
    px = bytes(
        data.draw(
            st.lists(
                st.integers(0, 255), min_size=w * h * ch, max_size=w * h * ch
            )
        )
    )
    assert png_decode(png_encode(w, h, px, channels=ch, filter_plan=plan)) == (
        w,
        h,
        ch,
        px,
    )


def test_mixed_plan_exercises_all_filters():
    """A ≥5-row mixed-plan image stores filter bytes 1,2,3,4,0 — the
    decoder is provably driven through every filter type."""
    enc = png_encode(3, 6, bytes(range(18)), channels=1, filter_plan="mixed")
    # IDAT body: find chunk, inflate, read per-row filter bytes
    pos = 8
    idat = b""
    while pos < len(enc):
        (n,) = struct.unpack(">I", enc[pos : pos + 4])
        tag = enc[pos + 4 : pos + 8]
        if tag == b"IDAT":
            idat += enc[pos + 8 : pos + 8 + n]
        pos += 12 + n
    raw = zlib.decompress(idat)
    stride = 3
    filters = [raw[r * (stride + 1)] for r in range(6)]
    assert filters == [1, 2, 3, 4, 0, 1]


def test_decode_rejects_garbage_and_unsupported():
    with pytest.raises(ValueError, match="signature"):
        png_decode(b"plainly not a png")
    ok = png_encode(2, 2, bytes(4))
    corrupt = ok[:20] + bytes([ok[20] ^ 0xFF]) + ok[21:]
    with pytest.raises(ValueError, match="CRC"):
        png_decode(corrupt)
    # 16-bit depth is outside the baseline profile → honest gate
    ihdr = struct.pack(">IIBBBBB", 1, 1, 16, 0, 0, 0, 0)
    chunk = (
        struct.pack(">I", len(ihdr))
        + b"IHDR"
        + ihdr
        + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF)
    )
    with pytest.raises(NotImplementedError, match="bit depth"):
        png_decode(b"\x89PNG\r\n\x1a\n" + chunk)


def test_encode_validates_buffer():
    with pytest.raises(ValueError, match="pixel buffer"):
        png_encode(2, 2, bytes(3))
    with pytest.raises(ValueError, match="channels"):
        png_encode(1, 1, bytes(2), channels=2)


def test_synthetic_media_decodes_to_closed_form(spark):
    """The full Spark path: encode executor-side (mixed filters) →
    decode → pixel stats equal the closed-form rule."""
    docs = read(spark, SF_DIR, "documents").filter("doc_id < 40")
    feats = extract_features(synthetic_png_media(docs), fake=False)
    for r in feats.collect():
        d = r.media_id
        w, h = 4 + d % 5, 3 + d % 4
        px = [(d * 31 + i * 7) % 256 for i in range(w * h)]
        assert r.features[:4] == [float(w), float(h), 1.0, float(w * h)]
        assert r.features[4:] == [float(sum(px)), float(min(px)), float(max(px))]


def test_dhash_band_join_equals_bruteforce(spark):
    """The 4x16-band candidate join must return EXACTLY the brute-force
    hamming<=3 pair set (pigeonhole guarantee), on real decoded pixels."""
    from my_flink_1_10_2_spark.llm.multimodal import (
        dhash_neardup_pairs,
        neardup_png_media,
        png_dhash,
    )

    docs = read(spark, SF_DIR, "documents").filter("doc_id < 150")
    hashes = png_dhash(neardup_png_media(docs))
    banded = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in dhash_neardup_pairs(hashes, max_hamming=3).collect()
    }
    hs = {r.media_id: (r.hash_lo, r.hash_hi) for r in hashes.collect()}
    brute = set()
    ids = sorted(hs)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            d = bin(hs[a][0] ^ hs[b][0]).count("1") + bin(
                hs[a][1] ^ hs[b][1]
            ).count("1")
            if d <= 3:
                brute.add((a, b, d))
    assert banded == brute and len(brute) > 50
    with pytest.raises(ValueError, match="hamming <= 3"):
        dhash_neardup_pairs(hashes, max_hamming=5)


def test_resize_png_real_pixels(spark):
    """Nearest-neighbor resize: decoded output pixels equal the manual
    index mapping of the decoded input pixels."""
    docs = read(spark, SF_DIR, "documents").filter("doc_id < 8")
    media = synthetic_png_media(docs)
    out = resize_png(media, out_w=3, out_h=2)
    resized = {r.media_id: bytes(r.payload) for r in out.collect()}
    for r in media.collect():
        d = r.media_id
        w, h = 4 + d % 5, 3 + d % 4
        px = bytes((d * 31 + i * 7) % 256 for i in range(w * h))
        expect = bytes(
            px[(rr * h // 2) * w + (cc * w // 3)]
            for rr in range(2)
            for cc in range(3)
        )
        got = png_decode(resized[d])
        assert got == (3, 2, 1, expect)
    with pytest.raises(Exception, match="non-PNG"):
        resize_png(
            media.withColumn("mime", media.mime.substr(1, 2)), 2, 2
        ).collect()


# -- Adam7 interlace + palette (round-7 gate closures) ------------------------

import struct as _struct
import zlib as _zlib

from my_flink_1_10_2_spark.llm.png import png_decode as _dec, png_encode as _enc


def _rand_pixels(n, seed=3):
    x = seed
    out = bytearray()
    for _ in range(n):
        x = (x * 1103515245 + 12345) & 0x7FFFFFFF
        out.append(x & 0xFF)
    return bytes(out)


def test_adam7_roundtrip_matches_progressive_scatter():
    """Interlaced encode -> decode must reproduce the exact pixels for
    sizes that exercise empty and partial passes (1x1 up to 13x11)."""
    for w, h, ch in [(1, 1, 1), (2, 3, 3), (8, 8, 1), (13, 11, 4), (16, 9, 3)]:
        px = _rand_pixels(w * h * ch, seed=w * 100 + h)
        payload = _enc(w, h, px, channels=ch, interlace=True)
        assert _dec(payload) == (w, h, ch, px), (w, h, ch)
        # and the interlaced bytes differ from the sequential encoding
        # whenever more than one pass exists (the framing really changed)
        if (w, h) != (1, 1):
            assert payload != _enc(w, h, px, channels=ch)


def test_palette_decode_expands_to_rgb():
    palette = [(255, 0, 0), (0, 255, 0), (0, 0, 128), (7, 7, 7)]
    idx = bytes([0, 1, 2, 3, 3, 2, 1, 0, 2, 2, 1, 1])  # 4x3
    payload = _enc(4, 3, idx, palette=palette)
    w, h, ch, px = _dec(payload)
    assert (w, h, ch) == (4, 3, 3)
    want = b"".join(bytes(palette[i]) for i in idx)
    assert px == want


def test_palette_interlaced_roundtrip():
    palette = [(i, 255 - i, i ^ 0x55) for i in range(16)]
    idx = bytes(i % 16 for i in range(9 * 7))
    payload = _enc(9, 7, idx, palette=palette, interlace=True)
    w, h, ch, px = _dec(payload)
    assert (w, h, ch) == (9, 7, 3)
    assert px == b"".join(bytes(palette[i]) for i in idx)


def test_palette_index_out_of_range_is_loud():
    import pytest

    payload = _enc(2, 1, bytes([0, 3]), palette=[(1, 2, 3), (4, 5, 6)])
    # hand-shrink the palette: rebuild PLTE with 1 entry, keep indices
    payload = _enc(2, 1, bytes([0, 1]), palette=[(1, 2, 3), (4, 5, 6)])
    # corrupt: decode with an index >= palette size via direct chunk edit
    sig = payload[:8]
    pos, chunks = 8, []
    while pos < len(payload):
        (ln,) = _struct.unpack(">I", payload[pos:pos + 4])
        tag = payload[pos + 4:pos + 8]
        body = payload[pos + 8:pos + 8 + ln]
        chunks.append((tag, body))
        pos += 12 + ln
    out = sig
    for tag, body in chunks:
        if tag == b"PLTE":
            body = body[:3]  # drop the second entry
        out += _struct.pack(">I", len(body)) + tag + body + _struct.pack(
            ">I", _zlib.crc32(tag + body) & 0xFFFFFFFF)
    with pytest.raises(ValueError, match="palette index"):
        _dec(out)


def test_sixteen_bit_depth_stays_gated():
    import pytest

    ihdr = _struct.pack(">IIBBBBB", 1, 1, 16, 0, 0, 0, 0)
    payload = (b"\x89PNG\r\n\x1a\n"
               + _struct.pack(">I", len(ihdr)) + b"IHDR" + ihdr
               + _struct.pack(">I", _zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF))
    with pytest.raises(NotImplementedError, match="bit depth 16"):
        _dec(payload)


def test_sixteen_bit_deep_roundtrip_plain_and_interlaced():
    """png_encode_deep/png_decode_deep: 16-bit samples survive the
    byte-wise filters (bpp=2*ch) and Adam7 exactly; values above 255
    prove real 16-bit width."""
    from my_flink_1_10_2_spark.llm.png import png_decode_deep, png_encode_deep

    for w, h, ch in [(7, 5, 1), (9, 6, 3)]:
        n = w * h * ch
        samples = [(i * 9973 + 123) % 65536 for i in range(n)]
        for interlace in (False, True):
            payload = png_encode_deep(
                w, h, samples, channels=ch, interlace=interlace
            )
            assert png_decode_deep(payload) == (w, h, ch, 16, samples)


def test_deep_decode_delegates_for_8bit():
    from my_flink_1_10_2_spark.llm.png import png_decode_deep

    px = bytes(range(48))
    payload = _enc(4, 4, px, channels=3)
    assert png_decode_deep(payload) == (4, 4, 3, 8, list(px))


def test_deep_encode_validates_range():
    import pytest

    from my_flink_1_10_2_spark.llm.png import png_encode_deep

    with pytest.raises(ValueError, match="0..65535"):
        png_encode_deep(1, 1, [70000])
