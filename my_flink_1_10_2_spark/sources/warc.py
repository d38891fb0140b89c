"""WARC/1.0 (+ WET) source/sink — the Common Crawl container every
web-scale LLM corpus pipeline starts from, implemented from the public
ISO 28500 / WARC 1.0 specification:

  record := version line "WARC/1.0\\r\\n"
            | named headers (WARC-Type, WARC-Record-ID, WARC-Date,
              Content-Length, ...) each "Name: value\\r\\n"
            | "\\r\\n" | Content-Length payload bytes | "\\r\\n\\r\\n"

Shards are written as *multi-member gzip* files (one gzip member per
record — the Common Crawl layout that makes records independently
seekable); Python's zlib consumes concatenated members natively, and
each member is emitted with mtime=0 so shard bytes are deterministic.

WET ("WARC Encapsulated Text") is WARC with ``WARC-Type: conversion``
records whose payload is the extracted plain text — exactly what a
text-pipeline ingests.  The reader yields one row per conversion
record, skipping ``warcinfo``/``request``/``response`` records the way
a WET consumer does.

Scale shape matches the other export sinks: contiguous global-rank
shard ranges (never one task), one shuffle keyed on shard id to write,
one task per shard to read, atomic ``.inprogress`` renames.
"""

from __future__ import annotations

import gzip
import io
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_CRLF = b"\r\n"


def encode_warc_record(
    warc_type: str,
    record_id: str,
    date: str,
    payload: bytes,
    extra_headers: dict[str, str] | None = None,
) -> bytes:
    """One WARC/1.0 record with deterministic header order."""
    headers = [
        ("WARC-Type", warc_type),
        ("WARC-Record-ID", f"<urn:uuid:{record_id}>"),
        ("WARC-Date", date),
    ]
    for k in sorted(extra_headers or {}):
        headers.append((k, (extra_headers or {})[k]))
    headers.append(("Content-Length", str(len(payload))))
    out = bytearray(b"WARC/1.0" + _CRLF)
    for k, v in headers:
        out += f"{k}: {v}".encode("utf-8") + _CRLF
    out += _CRLF
    out += payload
    out += _CRLF + _CRLF
    return bytes(out)


def decode_warc_records(stream: bytes):
    """Yield (headers_dict, payload_bytes) for each record in a
    (decompressed) WARC stream; strict on framing."""
    i = 0
    n = len(stream)
    while i < n:
        eol = stream.index(_CRLF, i)
        version = stream[i:eol]
        if version != b"WARC/1.0":
            raise ValueError(f"bad WARC version line {version!r} at {i}")
        i = eol + 2
        headers: dict[str, str] = {}
        while True:
            eol = stream.index(_CRLF, i)
            line = stream[i:eol]
            i = eol + 2
            if not line:
                break
            name, _, value = line.decode("utf-8").partition(":")
            if not _:
                raise ValueError(f"malformed WARC header line {line!r}")
            headers[name.strip()] = value.strip()
        length = int(headers["Content-Length"])
        payload = stream[i : i + length]
        if len(payload) != length:
            raise ValueError("truncated WARC payload")
        i += length
        if stream[i : i + 4] != _CRLF + _CRLF:
            raise ValueError("missing WARC record terminator")
        i += 4
        yield headers, payload


def _gzip_member(data: bytes) -> bytes:
    buf = io.BytesIO()
    with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
        gz.write(data)
    return buf.getvalue()


def _gunzip_all(data: bytes) -> bytes:
    """Decompress concatenated gzip members."""
    out = bytearray()
    buf = io.BytesIO(data)
    while buf.tell() < len(data):
        with gzip.GzipFile(fileobj=buf, mode="rb") as gz:
            out += gz.read()
    return bytes(out)


def write_wet_shards(
    df: DataFrame,
    out_dir: str,
    key_col: str = "doc_id",
    text_col: str = "text",
    uri_col: str | None = None,
    samples_per_shard: int = 200,
) -> DataFrame:
    """Write documents as WET shards (``part-NNNNN.warc.wet.gz``): a
    ``warcinfo`` record then one ``conversion`` record per row, each its
    own gzip member.  Returns the shard manifest."""
    from my_flink_1_10_2_spark.operators.rank import global_rank

    os.makedirs(out_dir, exist_ok=True)
    cols = [key_col, text_col] + ([uri_col] if uri_col else [])
    ranked = global_rank(df.select(*cols), [F.asc(key_col)], rank_col="__rk")
    sharded = ranked.withColumn(
        "__shard", ((F.col("__rk") - 1) / samples_per_shard).cast("bigint")
    )
    dest, kc, tc, uc = out_dir, key_col, text_col, uri_col

    def _write_shard(pdf):
        import pandas as pd

        pdf = pdf.sort_values(kc)
        shard_id = int(pdf["__shard"].iloc[0])
        path = os.path.join(dest, f"part-{shard_id:05d}.warc.wet.gz")
        tmp = path + ".inprogress"
        date = "2026-01-01T00:00:00Z"  # fixed: shard bytes must be deterministic
        with open(tmp, "wb") as fh:
            info = encode_warc_record(
                "warcinfo",
                f"shard-{shard_id:05d}",
                date,
                b"software: my_flink_1_10_2_spark WET writer\r\n",
            )
            fh.write(_gzip_member(info))
            for row in pdf.itertuples():
                key = int(getattr(row, kc))
                extra = {"WARC-Target-URI": getattr(row, uc)} if uc else {
                    "WARC-Target-URI": f"urn:doc:{key}"
                }
                rec = encode_warc_record(
                    "conversion",
                    f"doc-{key}",
                    date,
                    str(getattr(row, tc)).encode("utf-8"),
                    extra_headers={
                        "Content-Type": "text/plain",
                        **extra,
                    },
                )
                fh.write(_gzip_member(rec))
        os.replace(tmp, path)
        return pd.DataFrame(
            {
                "shard_id": [shard_id],
                "path": [path],
                "n_records": [len(pdf)],
                "first_key": [int(pdf[kc].min())],
                "last_key": [int(pdf[kc].max())],
                "n_bytes": [os.path.getsize(path)],
            }
        )

    schema = (
        "shard_id long, path string, n_records long, "
        "first_key long, last_key long, n_bytes long"
    )
    return sharded.groupBy("__shard").applyInPandas(_write_shard, schema)


def read_wet_shards(
    spark: SparkSession,
    in_dir: str,
    shard_col: str | None = None,
) -> DataFrame:
    """Read WET shards back: one task per shard, one row per
    ``conversion`` record — (doc_uri, text) plus optionally the shard
    id.  warcinfo/request/response records are skipped, as a WET
    consumer does."""
    paths = sorted(
        os.path.join(in_dir, f)
        for f in os.listdir(in_dir)
        if f.endswith(".warc.wet.gz")
    )
    if not paths:
        raise FileNotFoundError(f"no .warc.wet.gz shards under {in_dir}")
    schema = "doc_uri string, text string"
    if shard_col:
        schema += f", {shard_col} long"
    path_rdd = spark.sparkContext.parallelize([(p,) for p in paths], len(paths))
    path_df = spark.createDataFrame(path_rdd, "path string")

    def _read(batches):
        import pandas as pd

        for pdf in batches:
            for path in pdf["path"]:
                with open(path, "rb") as fh:
                    stream = _gunzip_all(fh.read())
                uris, texts = [], []
                for headers, payload in decode_warc_records(stream):
                    if headers.get("WARC-Type") != "conversion":
                        continue
                    uris.append(headers.get("WARC-Target-URI", ""))
                    texts.append(payload.decode("utf-8"))
                out = pd.DataFrame({"doc_uri": uris, "text": texts})
                if shard_col:
                    base = os.path.basename(path)
                    out[shard_col] = int(base[len("part-"):-len(".warc.wet.gz")])
                yield out

    return path_df.mapInPandas(_read, schema)
