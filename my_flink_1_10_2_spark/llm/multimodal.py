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

    return docs.select("doc_id").mapInPandas(batches, MEDIA_SCHEMA)


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


def extract_features(media: DataFrame, fake: bool = True, dim: int = 8) -> DataFrame:
    """Decode → feature-extract via Arrow-batched ``mapInPandas``.

    ``fake=False`` runs the REAL pure-stdlib PNG decoder on ``image/png``
    payloads (features = actual pixel statistics); any other mime raises
    ``NotImplementedError`` — JPEG/audio/video codecs are not available
    in this container.  ``fake=True`` keeps the deterministic
    byte-statistics stub for mime-agnostic tests."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            pdf = pdf.copy()
            if fake:
                pdf["features"] = pdf["payload"].map(lambda p: _fake_decode(p, dim))
            else:
                bad = set(pdf["mime"]) - {"image/png"}
                if bad:
                    raise NotImplementedError(
                        f"real codecs for {sorted(bad)} are not available in "
                        "this environment (only baseline PNG decodes for "
                        "real); use fake=True for the deterministic stub"
                    )
                pdf["features"] = pdf["payload"].map(_png_features)
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
