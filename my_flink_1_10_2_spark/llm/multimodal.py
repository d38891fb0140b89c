"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real — schema, partition-friendly transforms,
Arrow-batched ``mapInPandas`` UDF signatures — while the actual codec
step is STUBBED (the image/audio libraries are not in this container):
``decode_image_batch`` raises ``NotImplementedError`` unless
``fake=True``, in which case a deterministic fake decoder produces stable
feature vectors so the pipeline is testable end-to-end.

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


def extract_features(media: DataFrame, fake: bool = True, dim: int = 8) -> DataFrame:
    """Decode → feature-extract via Arrow-batched ``mapInPandas``.

    With ``fake=False`` this is where a real codec (PIL/ffmpeg/...)
    would run; not available in this container.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not fake:
                raise NotImplementedError(
                    "real media codecs are not available in this environment; "
                    "use fake=True for the deterministic stub decoder"
                )
            pdf = pdf.copy()
            pdf["features"] = pdf["payload"].map(lambda p: _fake_decode(p, dim))
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

    With a real codec this would decode → scale → re-encode inside the
    same Arrow batch loop as :func:`extract_features`; here the
    deterministic stand-in truncates/pads the payload to `target_bytes`
    JVM-side, preserving the contract that matters for the pipeline:
    output schema equals input schema with `payload`/`n_bytes` rewritten,
    partitioning untouched, no Python in the plan.
    """
    if not fake:
        raise NotImplementedError(
            "real image codecs are not available in this environment; "
            "use fake=True for the deterministic stub"
        )
    resized = F.substring(F.col("payload"), 1, target_bytes)
    padded = F.concat(
        resized,
        F.repeat(F.lit(b"\x00"), F.lit(target_bytes) - F.length(resized)),
    )
    return media.withColumn("payload", padded).withColumn(
        "n_bytes", F.length(F.col("payload")).cast("bigint")
    )
