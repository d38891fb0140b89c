"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real — schema, partition-friendly transforms,
Arrow-batched ``mapInPandas`` UDF signatures.  The codec step comes in
two flavors: PNG decode is REAL (pure-stdlib baseline codec,
:mod:`my_flink_1_10_2_spark.llm.png` — ``extract_features(fake=False)``
emits actual pixel statistics), while JPEG/audio/video stay honestly
gated behind ``NotImplementedError`` (those libraries are not in this
container); ``fake=True`` keeps the deterministic byte-statistics stub
for mime-agnostic pipeline tests.

At scale: binary payloads stay columnar in parquet; metadata predicates
(mime, byte size) push down so the decode UDF only ever sees the
selected rows, and ``mapInPandas`` streams Arrow batches — no
driver-side materialization.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("mime", StringType()),
        StructField("n_bytes", LongType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("mime", StringType()),
        StructField("n_bytes", LongType()),
        StructField("features", ArrayType(DoubleType())),
    ]
)


def _cpu_spread(df: DataFrame) -> DataFrame:
    """Round-robin repartition to the session's shuffle parallelism
    before a CPU-heavy Arrow codec stage: a small parquet scan yields
    1-2 input splits, which would encode/decode the whole corpus
    serially on one core.  Only the bigint doc_id moves; at real scale
    this is the standard rebalance ahead of an expensive UDF stage."""
    n = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    return df.repartition(n)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Wrap the documents table as a media table: payload = utf-8 bytes,
    typed metadata columns.  Demonstrates the multimodal column model on
    the available fixtures."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.col("text").cast("binary").alias("payload"),
        F.when(F.col("doc_id") % 2 == 0, "image/png").otherwise("audio/wav").alias("mime"),
        F.length(F.col("text").cast("binary")).cast("bigint").alias("n_bytes"),
    )


def _fake_decode(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic fake 'decoder': stable per-payload features derived
    from byte statistics.  Stands in for a real image/audio codec."""
    if payload is None:
        return [0.0] * dim
    out = []
    n = len(payload)
    for i in range(dim):
        s = sum(payload[i::dim][:64]) if n > i else 0
        out.append(round((s % 997) / 997.0, 9))
    return out


def synthetic_png_media(docs: DataFrame) -> DataFrame:
    """Per-document grayscale PNGs with a CLOSED-FORM pixel rule —
    width = 4 + doc_id%5, height = 3 + doc_id%4, pixel i =
    (doc_id*31 + i*7) % 256 — encoded executor-side with the mixed
    filter plan (Sub/Up/Average/Paeth/None all exercised).  Because the
    pixels have a closed form, a SQL oracle can replay the DECODED
    statistics exactly: any defect in inflate/unfilter shows up as a
    value mismatch."""
    from .png import png_encode

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                w, h = 4 + d % 5, 3 + d % 4
                px = bytes((d * 31 + i * 7) % 256 for i in range(w * h))
                payloads.append(
                    png_encode(w, h, px, channels=1, filter_plan="mixed")
                )
            out = pd.DataFrame(
                {
                    "media_id": pdf["doc_id"].astype("int64"),
                    "payload": payloads,
                    "mime": "image/png",
                    "n_bytes": [len(p) for p in payloads],
                }
            )
            yield out

    return _cpu_spread(docs.select("doc_id")).mapInPandas(batches, MEDIA_SCHEMA)


def synthetic_jpeg_media(docs: DataFrame, progressive: bool = False) -> DataFrame:
    """Per-document grayscale JPEGs built from QUANT-EXACT constant 8×8
    tiles: width = 8*(2 + doc_id%3), height = 8*(1 + doc_id%2), tile t
    holds the EVEN level ((doc_id*37 + t*29) % 128) * 2.  A constant
    tile carries only DC energy and an even level makes 8·(v−128) an
    exact multiple of the standard DC quant step (16), so the lossy
    JPEG roundtrip is pixel-exact for these fixtures — a SQL oracle
    replays the DECODED statistics, and any defect in the Huffman /
    zigzag / dequant / IDCT chain mismatches.  Natural-image loss
    behavior is property-tested separately (tests/test_jpeg_codec.py).

    ``progressive=True`` encodes the same tiles as SOF2 streams
    (llm/jpeg_progressive.py: DC/AC first scans at Al=1 plus both
    refinement passes) — identical quantized coefficients, so the
    exactness contract carries over unchanged."""
    import numpy as np

    from .jpeg import jpeg_encode_gray
    from .jpeg_progressive import jpeg_encode_gray_progressive

    enc = jpeg_encode_gray_progressive if progressive else jpeg_encode_gray

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                tw, th = 2 + d % 3, 1 + d % 2  # tiles across / down
                tiles = np.array(
                    [
                        [((d * 37 + (r * tw + c) * 29) % 128) * 2 for c in range(tw)]
                        for r in range(th)
                    ],
                    dtype=np.uint8,
                )
                img = np.kron(tiles, np.ones((8, 8), dtype=np.uint8))
                payloads.append(enc(tw * 8, th * 8, img.tobytes()))
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"].astype("int64"),
                    "payload": payloads,
                    "mime": "image/jpeg",
                    "n_bytes": [len(p) for p in payloads],
                }
            )

    return _cpu_spread(docs.select("doc_id")).mapInPandas(batches, MEDIA_SCHEMA)


def synthetic_avi_media(docs: DataFrame) -> DataFrame:
    """Per-document MJPEG AVIs with a CLOSED-FORM frame rule: 3 +
    doc_id%4 frames of 16×8 grayscale, frame f built from two
    quant-exact constant 8×8 tiles at even levels
    ((doc_id*41 + f*23 + t*29) % 128) * 2 — the whole lossy
    container→JPEG→pixel chain is bit-exact on these fixtures (see
    synthetic_jpeg_media), so a SQL oracle replays the decoded video
    statistics."""
    import numpy as np

    from .avi import avi_encode_mjpeg
    from .jpeg import jpeg_encode_gray

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                frames = []
                for f in range(3 + d % 4):
                    tiles = np.array(
                        [[((d * 41 + f * 23 + t * 29) % 128) * 2 for t in range(2)]],
                        dtype=np.uint8,
                    )
                    img = np.kron(tiles, np.ones((8, 8), dtype=np.uint8))
                    frames.append(jpeg_encode_gray(16, 8, img.tobytes()))
                payloads.append(avi_encode_mjpeg(16, 8, frames, fps=5))
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"].astype("int64"),
                    "payload": payloads,
                    "mime": "video/x-msvideo",
                    "n_bytes": [len(p) for p in payloads],
                }
            )

    return _cpu_spread(docs.select("doc_id")).mapInPandas(batches, MEDIA_SCHEMA)


def synthetic_wav_media(docs: DataFrame) -> DataFrame:
    """Per-document mono 16-bit PCM WAVs with a CLOSED-FORM sample rule —
    n = 64 + doc_id%32 samples, sample[i] = ((doc_id*17 + i*13) % 2048)
    - 1024 — really encoded as RIFF/WAVE (llm/wav.py), so the decoded
    audio statistics are SQL-replayable exactly, like the PNG fixture."""
    from .wav import wav_encode

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                n = 64 + d % 32
                samples = [((d * 17 + i * 13) % 2048) - 1024 for i in range(n)]
                payloads.append(wav_encode(samples, sample_rate=8000))
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"].astype("int64"),
                    "payload": payloads,
                    "mime": "audio/wav",
                    "n_bytes": [len(p) for p in payloads],
                }
            )

    return _cpu_spread(docs.select("doc_id")).mapInPandas(batches, MEDIA_SCHEMA)


def _wav_features(payload: bytes) -> list[float]:
    """Real decode → audio statistics (all integer-valued): [sample_rate,
    channels, n_samples, sum, min, max, zero_crossings]."""
    from .wav import wav_decode

    rate, ch, _bits, s = wav_decode(payload)
    zc = sum(1 for i in range(1, len(s)) if (s[i - 1] < 0) != (s[i] < 0))
    return [
        float(rate),
        float(ch),
        float(len(s)),
        float(sum(s)),
        float(min(s)),
        float(max(s)),
        float(zc),
    ]


def _png_features(payload: bytes) -> list[float]:
    """Real decode → pixel statistics (all integer-valued, so doubles
    carry them exactly): [width, height, channels, n_pixels, sum, min,
    max]."""
    from .png import png_decode

    w, h, ch, px = png_decode(payload)
    return [
        float(w),
        float(h),
        float(ch),
        float(len(px)),
        float(sum(px)),
        float(min(px)),
        float(max(px)),
    ]


def _jpeg_features(payload: bytes) -> list[float]:
    """Real decode → pixel statistics: [width, height, 1 (grayscale),
    n_pixels, sum, min, max] — same layout as the PNG leg."""
    from .jpeg import jpeg_decode_gray

    w, h, px = jpeg_decode_gray(payload)
    return [
        float(w),
        float(h),
        1.0,
        float(len(px)),
        float(sum(px)),
        float(min(px)),
        float(max(px)),
    ]


def _avi_features(payload: bytes) -> list[float]:
    """Real MJPEG/AVI decode → video statistics over ALL frames:
    [width, height, n_frames, n_pixels_decoded, sum, min, max]."""
    from .avi import avi_decode_sampled_pixels

    w, h, n_total, pxs = avi_decode_sampled_pixels(payload, every=1)
    flat = b"".join(pxs)
    return [
        float(w),
        float(h),
        float(n_total),
        float(len(flat)),
        float(sum(flat)),
        float(min(flat)),
        float(max(flat)),
    ]


def extract_features(media: DataFrame, fake: bool = True, dim: int = 8) -> DataFrame:
    """Decode → feature-extract via Arrow-batched ``mapInPandas``.

    ``fake=False`` runs the REAL pure-stdlib decoders — baseline PNG
    (``image/png`` → pixel statistics) and RIFF/PCM WAV (``audio/wav``
    → sample statistics); any other mime raises ``NotImplementedError``
    — JPEG/video/compressed-audio codecs are not available in this
    container.  ``fake=True`` keeps the deterministic byte-statistics
    stub for mime-agnostic tests."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            pdf = pdf.copy()
            if fake:
                pdf["features"] = pdf["payload"].map(lambda p: _fake_decode(p, dim))
            else:
                decoders = {
                    "image/png": _png_features,
                    "image/jpeg": _jpeg_features,
                    "audio/wav": _wav_features,
                    "video/x-msvideo": _avi_features,
                }
                bad = set(pdf["mime"]) - set(decoders)
                if bad:
                    raise NotImplementedError(
                        f"real codecs for {sorted(bad)} are not available in "
                        "this environment (baseline PNG, baseline grayscale "
                        "JPEG, PCM WAV and MJPEG/AVI decode for real); use "
                        "fake=True for the deterministic stub"
                    )
                pdf["features"] = [
                    decoders[m](p)
                    for m, p in zip(pdf["mime"], pdf["payload"])
                ]
            yield pdf[["media_id", "mime", "n_bytes", "features"]]

    return media.mapInPandas(batches, FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_n_bytes: int = 64, max_frames: int = 4) -> DataFrame:
    """'Frame sampling' over the opaque payload: deterministic byte-offset
    slices standing in for video frame extraction.  JVM-side (substring on
    binary) — demonstrates that sampling never needs Python."""
    frames = F.array(
        *[
            F.substring(F.col("payload"), i * every_n_bytes + 1, every_n_bytes)
            for i in range(max_frames)
        ]
    )
    return media.select(
        "media_id",
        "mime",
        F.posexplode(frames).alias("frame_idx", "frame_bytes"),
    ).filter(F.length("frame_bytes") > 0)


def resize(media: DataFrame, target_bytes: int = 256, fake: bool = True) -> DataFrame:
    """'Resize' the media payload (the brief's image-resize slot).

    ``fake=True`` is the JVM-side deterministic stand-in: truncate/pad
    the payload to `target_bytes` (schema-preserving, no Python in the
    plan).  For REAL pixel resizing of PNGs see :func:`resize_png`.
    """
    if not fake:
        raise NotImplementedError(
            "mime-agnostic real resize needs per-format codecs; PNGs "
            "resize for real via resize_png(), other formats are gated"
        )
    resized = F.substring(F.col("payload"), 1, target_bytes)
    padded = F.concat(
        resized,
        F.repeat(F.lit(b"\x00"), F.lit(target_bytes) - F.length(resized)),
    )
    return media.withColumn("payload", padded).withColumn(
        "n_bytes", F.length(F.col("payload")).cast("bigint")
    )


def neardup_png_media(docs: DataFrame) -> DataFrame:
    """Per-document 16x8 grayscale PNGs in PERIOD-50 groups with a
    one-pixel perturbation — the image near-dup fixture:

      g = doc_id % 50;  base[i] = (g*31 + i*7) % 256
      perturbed at i = (doc_id*13) % 128:  (base[i] + 128) % 256

    Documents in the same group are visually identical up to one pixel,
    so their dHashes differ by only a few bits — genuine near-duplicates
    for the perceptual-dedup operator, with a closed form the SQL oracle
    can replay."""
    from .png import png_encode

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                g, p = d % 50, (d * 13) % 128
                px = bytearray((g * 31 + i * 7) % 256 for i in range(128))
                px[p] = (px[p] + 128) % 256
                payloads.append(
                    png_encode(16, 8, bytes(px), channels=1, filter_plan="mixed")
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"].astype("int64"),
                    "payload": payloads,
                    "mime": "image/png",
                    "n_bytes": [len(p) for p in payloads],
                }
            )

    return _cpu_spread(docs.select("doc_id")).mapInPandas(batches, MEDIA_SCHEMA)


def png_dhash(media: DataFrame) -> DataFrame:
    """Perceptual dHash over REAL decoded pixels: decode the PNG,
    nearest-neighbor-resize to 9x8 (the classic dHash grid), and emit
    the 64 horizontal-gradient bits split into two 32-bit halves
    (``hash_lo`` bits 0..31 = rows 0..3, ``hash_hi`` = rows 4..7 —
    avoiding BIGINT sign overflow at bit 63 in either engine).

    bit(r, c) = resized[r][c] > resized[r][c+1], packed at r*8 + c."""
    from .png import png_decode

    def one(payload: bytes) -> tuple[int, int]:
        w, h, ch, px = png_decode(payload)
        if ch != 1:
            raise NotImplementedError("dHash expects grayscale PNGs here")
        res = [
            [px[(r * h // 8) * w + (c * w // 9)] for c in range(9)]
            for r in range(8)
        ]
        lo = hi = 0
        for r in range(8):
            for c in range(8):
                if res[r][c] > res[r][c + 1]:
                    if r < 4:
                        lo |= 1 << (r * 8 + c)
                    else:
                        hi |= 1 << ((r - 4) * 8 + c)
        return lo, hi

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            hashes = [one(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "hash_lo": [a for a, _ in hashes],
                    "hash_hi": [b for _, b in hashes],
                }
            )

    return media.mapInPandas(
        batches, "media_id bigint, hash_lo bigint, hash_hi bigint"
    )


def dhash_neardup_pairs(hashes: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Image near-dup pairs by banded hamming join: split the 64-bit
    dHash into 4 x 16-bit bands; pairs sharing ANY band are candidates
    (pigeonhole: <= 3 differing bits can touch at most 3 of 4 bands, so
    recall is EXACT for max_hamming <= 3); the exact popcount filter
    runs JVM-side on the candidates only — never all-pairs.  The same
    band-bucket discipline as MinHash-LSH (`llm/dedup.py`)."""
    if max_hamming > 3:
        raise ValueError(
            "4x16 banding is only exact for hamming <= 3; raise the band "
            "count for looser thresholds"
        )
    bands = F.array(
        F.col("hash_lo").bitwiseAND(F.lit(0xFFFF)),
        F.shiftright("hash_lo", 16).bitwiseAND(F.lit(0xFFFF)),
        F.col("hash_hi").bitwiseAND(F.lit(0xFFFF)),
        F.shiftright("hash_hi", 16).bitwiseAND(F.lit(0xFFFF)),
    )
    banded = hashes.select(
        "media_id", "hash_lo", "hash_hi", F.posexplode(bands).alias("band", "bv")
    )
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bv") == F.col("b.bv"))
            & (F.col("a.media_id") < F.col("b.media_id")),
        )
        .select(
            F.col("a.media_id").alias("doc_a"),
            F.col("b.media_id").alias("doc_b"),
            (
                F.bit_count(F.col("a.hash_lo").bitwiseXOR(F.col("b.hash_lo")))
                + F.bit_count(F.col("a.hash_hi").bitwiseXOR(F.col("b.hash_hi")))
            ).cast("bigint").alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )
    return cand


def resize_png(media: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """REAL image resize: decode → nearest-neighbor scale → re-encode,
    inside one Arrow batch loop (pure-stdlib codec, executor-side only).
    Input rows must be ``image/png``; schema is preserved with
    ``payload``/``n_bytes`` rewritten."""
    from .png import png_decode, png_encode

    def scale_one(payload: bytes) -> bytes:
        w, h, ch, px = png_decode(payload)
        out = bytearray(out_w * out_h * ch)
        for r in range(out_h):
            src_r = r * h // out_h
            for c in range(out_w):
                src_c = c * w // out_w
                s = (src_r * w + src_c) * ch
                d = (r * out_w + c) * ch
                out[d : d + ch] = px[s : s + ch]
        return png_encode(out_w, out_h, bytes(out), channels=ch, filter_plan="none")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            bad = set(pdf["mime"]) - {"image/png"}
            if bad:
                raise NotImplementedError(
                    f"resize_png got non-PNG mimes {sorted(bad)}"
                )
            pdf = pdf.copy()
            pdf["payload"] = pdf["payload"].map(scale_one)
            pdf["n_bytes"] = pdf["payload"].map(len)
            yield pdf[["media_id", "payload", "mime", "n_bytes"]]

    return media.mapInPandas(batches, MEDIA_SCHEMA)


def interlaced_palette_png_stats(docs: DataFrame) -> DataFrame:
    """Encode → decode → stats through the FULL baseline-PNG feature
    surface in one Arrow stage: per-document Adam7-INTERLACED,
    PALETTE-color PNGs (color type 3, 16 closed-form RGB entries,
    mixed scanline filters) are really encoded, really decoded
    (llm/png.py: seven-pass de-interlace + PLTE expansion), and the
    DECODED per-channel sums are emitted for oracle grading.

    Closed forms (doc key d, pixel index i, palette slot j):
      w = 5 + d % 7, h = 4 + d % 5        (sizes hit empty/partial passes)
      j(i) = (d*5 + i*3) % 16
      palette[j] = ((d*11 + j*29) % 256, (d*17 + j*13) % 256,
                    (d*7 + j*37) % 256)
    """
    from .png import png_decode, png_encode

    schema = (
        "media_id long, width long, height long, "
        "r_sum long, g_sum long, b_sum long, px_min long, px_max long"
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for d in pdf["doc_id"]:
                d = int(d)
                w, h = 5 + d % 7, 4 + d % 5
                palette = [
                    (
                        (d * 11 + j * 29) % 256,
                        (d * 17 + j * 13) % 256,
                        (d * 7 + j * 37) % 256,
                    )
                    for j in range(16)
                ]
                idx = bytes((d * 5 + i * 3) % 16 for i in range(w * h))
                payload = png_encode(
                    w, h, idx, palette=palette, interlace=True,
                    filter_plan="mixed",
                )
                dw, dh, ch, px = png_decode(payload)
                if (dw, dh, ch) != (w, h, 3):
                    raise ValueError("interlaced palette decode shape mismatch")
                rows.append(
                    (
                        d, w, h,
                        sum(px[0::3]), sum(px[1::3]), sum(px[2::3]),
                        min(px), max(px),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "width", "height",
                    "r_sum", "g_sum", "b_sum", "px_min", "px_max",
                ],
            )

    return docs.select("doc_id").mapInPandas(batches, schema)
