"""zstd-compressed JSONL shard source/sink — the corpus container of
The Pile / RedPajama / Dolma releases: one JSON object per line,
whole-file zstd framing (``.jsonl.zst``).  Compression rides pyarrow's
bundled zstd streams (no extra dependency); JSON encoding is stdlib
``json`` with ``sort_keys=True`` and fixed separators so shard bytes
are deterministic and any JSONL consumer (jq, datasets, duckdb's
read_json) parses them.

Scale shape matches the other export sinks: contiguous global-rank
shard ranges decided on keys alone (``sources/sharding.py`` — never one
task, payload never range-shuffles), one payload shuffle keyed on shard
id to write, one task per shard to read, atomic ``.inprogress`` renames.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def write_jsonl_zst_shards(
    df: DataFrame,
    out_dir: str,
    key_col: str = "doc_id",
    cols: list[str] | None = None,
    samples_per_shard: int = 500,
    level: int | None = None,
) -> DataFrame:
    """Write sorted contiguous ``part-NNNNN.jsonl.zst`` shards; returns
    the shard manifest (shard_id, path, n_records, first_key, last_key,
    raw_bytes, zst_bytes)."""
    import pyarrow as pa

    from my_flink_1_10_2_spark.sources.sharding import assign_contiguous_shards

    cols = cols or list(df.columns)
    if key_col not in cols:
        cols = [key_col] + cols
    os.makedirs(out_dir, exist_ok=True)
    # keys-only shard assignment (sharding.py, guide §8): one payload
    # exchange — the groupBy(__shard) into the write kernel
    sharded = assign_contiguous_shards(
        df.select(*cols), key_col, samples_per_shard
    )
    dest, kc, out_cols = out_dir, key_col, cols

    def _write_shard(pdf):
        import pandas as pd

        pdf = pdf.sort_values(kc)
        shard_id = int(pdf["__shard"].iloc[0])
        path = os.path.join(dest, f"part-{shard_id:05d}.jsonl.zst")
        tmp = path + ".inprogress"
        raw_bytes = 0
        col_vals = {
            c: [v.item() if hasattr(v, "item") else v for v in pdf[c].tolist()]
            for c in out_cols
        }
        with pa.output_stream(tmp, compression="zstd") as fh:
            for i in range(len(pdf)):
                line = json.dumps(
                    {c: col_vals[c][i] for c in out_cols},
                    sort_keys=True,
                    separators=(",", ":"),
                    ensure_ascii=False,
                ).encode("utf-8") + b"\n"
                raw_bytes += len(line)
                fh.write(line)
        os.replace(tmp, path)
        return pd.DataFrame(
            {
                "shard_id": [shard_id],
                "path": [path],
                "n_records": [len(pdf)],
                "first_key": [int(pdf[kc].min())],
                "last_key": [int(pdf[kc].max())],
                "raw_bytes": [raw_bytes],
                "zst_bytes": [os.path.getsize(path)],
            }
        )

    schema = (
        "shard_id long, path string, n_records long, first_key long, "
        "last_key long, raw_bytes long, zst_bytes long"
    )
    return sharded.groupBy("__shard").applyInPandas(_write_shard, schema)


def decode_jsonl_zst(source, spec: dict) -> dict:
    """Decode ONE ``.jsonl.zst`` shard (path or bytes) → column lists
    keyed per ``spec`` (key -> long/double/string) — the per-shard unit
    of :func:`read_jsonl_zst_shards`, factored out so the corruption
    fuzz drives the exact production path.  Corrupt zstd frames, broken
    UTF-8, malformed JSON, and type-impossible values all surface as
    ValueError."""
    import pyarrow as pa

    try:
        if isinstance(source, (bytes, bytearray, memoryview)):
            stream = pa.input_stream(
                pa.BufferReader(bytes(source)), compression="zstd"
            )
            with stream as fh:
                text = fh.read().decode("utf-8")
        else:
            with pa.input_stream(source, compression="zstd") as fh:
                text = fh.read().decode("utf-8")
    except (pa.lib.ArrowException, OSError) as exc:
        if isinstance(exc, ValueError):
            raise
        raise ValueError(f"corrupt zstd shard: {exc}") from exc
    rows = {k: [] for k in spec}
    _decode_jsonl_lines(text, spec, rows)
    return rows


def _decode_jsonl_lines(text: str, spec: dict, rows: dict) -> None:
    """Decode decompressed jsonl text into ``rows`` (column lists) —
    the ONE line-decode loop both the shard reader and the seekable
    reader use, so they share a single error contract (malformed JSON
    raises from json.loads; non-object lines and type-impossible values
    raise ValueError)."""
    for line in text.splitlines():
        if not line:
            continue
        obj = json.loads(line)
        if not isinstance(obj, dict):
            raise ValueError(f"jsonl line is not an object: {line[:60]!r}")
        for k, t in spec.items():
            v = obj.get(k)
            if v is not None:
                try:
                    v = {"long": int, "double": float, "string": str}[t](v)
                except TypeError as exc:
                    raise ValueError(
                        f"jsonl field {k!r} not coercible to {t}: {exc}"
                    ) from exc
            rows[k].append(v)


def read_jsonl_zst_shards(
    spark: SparkSession,
    in_dir: str,
    schema: dict[str, str],
    shard_col: str | None = None,
) -> DataFrame:
    """Read ``.jsonl.zst`` shards back, one task per shard; ``schema``
    maps JSON key -> ``long`` / ``double`` / ``string``."""
    paths = sorted(
        os.path.join(in_dir, f)
        for f in os.listdir(in_dir)
        if f.endswith(".jsonl.zst")
    )
    if not paths:
        raise FileNotFoundError(f"no .jsonl.zst shards under {in_dir}")
    spark_types = {
        "long": T.LongType(),
        "double": T.DoubleType(),
        "string": T.StringType(),
    }
    fields = [T.StructField(k, spark_types[t]) for k, t in schema.items()]
    if shard_col:
        fields.append(T.StructField(shard_col, T.LongType()))
    out_schema = T.StructType(fields)
    spec = dict(schema)
    path_rdd = spark.sparkContext.parallelize([(p,) for p in paths], len(paths))
    path_df = spark.createDataFrame(path_rdd, "path string")

    def _read(batches):
        import pandas as pd

        for pdf in batches:
            for path in pdf["path"]:
                out = pd.DataFrame(decode_jsonl_zst(path, spec))
                if shard_col:
                    base = os.path.basename(path)
                    out[shard_col] = int(base[len("part-"):-len(".jsonl.zst")])
                yield out

    return path_df.mapInPandas(_read, out_schema)


# ---------------------------------------------------------------------------
# zstd SEEKABLE format (public spec: facebook/zstd
# contrib/seekable_format/zstd_seekable_compression_format.md): the
# payload is split into independent zstd frames, and a final SKIPPABLE
# frame carries a seek table of (compressed_size, decompressed_size)
# per frame.  Plain zstd decoders ignore skippable frames (verified:
# pyarrow's stream reads straight through them), so a seekable shard is
# still a valid .jsonl.zst to every existing consumer — but a
# byte-range reader can jump to any frame without inflating the prefix.
# This is what turns the one-huge-.jsonl.zst external corpus (a Pile /
# Dolma release file) from a one-task scan into N parallel tasks.

import struct

_SEEK_SKIP_MAGIC = 0x184D2A5E  # skippable-frame magic reserved for seek tables
_SEEK_FOOT_MAGIC = 0x8F92EAB1


def _seek_table_frame(frames) -> bytes:
    """Serialize the seek table (no per-frame checksums) as one
    skippable frame: entries then the 9-byte footer."""
    body = b"".join(struct.pack("<II", c, d) for c, d in frames)
    body += struct.pack("<IBI", len(frames), 0, _SEEK_FOOT_MAGIC)
    return struct.pack("<II", _SEEK_SKIP_MAGIC, len(body)) + body


def read_zstd_seek_table(path: str):
    """Parse a seekable file's trailing seek table →
    [(compressed_offset, compressed_size, decompressed_size)].
    Raises ValueError when the file has no seek table."""
    size = os.path.getsize(path)
    with open(path, "rb") as fh:
        if size < 17:
            raise ValueError(f"{path}: too small for a zstd seek table")
        fh.seek(size - 9)
        nframes, desc, magic = struct.unpack("<IBI", fh.read(9))
        if magic != _SEEK_FOOT_MAGIC:
            raise ValueError(f"{path}: no zstd seekable footer")
        entry = 12 if desc & 0x80 else 8
        table_size = nframes * entry + 9
        frame_start = size - 9 - nframes * entry - 8
        if frame_start < 0:
            raise ValueError(f"{path}: seek table larger than file")
        fh.seek(frame_start)
        skip_magic, frame_size = struct.unpack("<II", fh.read(8))
        if skip_magic != _SEEK_SKIP_MAGIC or frame_size != table_size:
            raise ValueError(f"{path}: malformed zstd seek-table frame")
        out = []
        off = 0
        for _ in range(nframes):
            if entry == 12:
                c, d, _crc = struct.unpack("<III", fh.read(12))
            else:
                c, d = struct.unpack("<II", fh.read(8))
            out.append((off, c, d))
            off += c
        if off != frame_start:
            raise ValueError(
                f"{path}: seek table covers {off} bytes, data is {frame_start}"
            )
        return out


def write_jsonl_zst_seekable(
    rows_iter,
    path: str,
    *,
    lines_per_frame: int = 200,
    max_frame_bytes: int = 8 << 20,
):
    """Write pre-encoded JSONL lines (an iterator of bytes, each ending
    in a newline) as one SEEKABLE .jsonl.zst file: one zstd frame per
    ``lines_per_frame`` lines (or sooner once a frame's raw size
    reaches ``max_frame_bytes`` — the seek table's sizes are 32-bit per
    spec, and small frames are what make byte-range reads cheap) + the
    trailing seek table.  Frames break on line boundaries so any frame
    decodes to whole JSON lines; a single line larger than the byte
    budget still becomes one (oversized) frame, but a line that cannot
    be represented in the 32-bit seek-table entry raises rather than
    writing an unreadable table.  Returns (n_frames, raw_bytes)."""
    import pyarrow as pa

    codec = pa.Codec("zstd")
    frames = []
    raw_bytes = 0
    tmp = path + ".inprogress"
    with open(tmp, "wb") as fh:
        buf = bytearray()
        n = 0

        def flush():
            nonlocal buf, n
            if not buf:
                return
            comp = codec.compress(bytes(buf), asbytes=True)
            if len(comp) > 0xFFFFFFFF or len(buf) > 0xFFFFFFFF:
                raise ValueError(
                    "zstd seekable frame exceeds the spec's 32-bit size "
                    f"field ({len(buf)} raw bytes) — lower max_frame_bytes "
                    "or split the offending line"
                )
            fh.write(comp)
            frames.append((len(comp), len(buf)))
            buf = bytearray()
            n = 0

        for line in rows_iter:
            buf += line
            raw_bytes += len(line)
            n += 1
            if n >= lines_per_frame or len(buf) >= max_frame_bytes:
                flush()
        flush()
        fh.write(_seek_table_frame(frames))
    os.replace(tmp, path)
    return len(frames), raw_bytes


def read_jsonl_zst_seekable(
    spark: SparkSession,
    path: str,
    schema: dict[str, str],
    frames_per_task: int = 8,
) -> DataFrame:
    """Read ONE seekable .jsonl.zst file with frame-range parallelism:
    the driver parses only the trailing seek table, assigns contiguous
    frame ranges to tasks, and each task reads its exact byte range and
    decompresses each frame independently (sizes known, so no streaming
    state and no false-boundary hazard — the seek table is
    authoritative, like the Arrow IPC footer)."""
    table = read_zstd_seek_table(path)
    spark_types = {
        "long": T.LongType(),
        "double": T.DoubleType(),
        "string": T.StringType(),
    }
    out_schema = T.StructType(
        [T.StructField(k, spark_types[t]) for k, t in schema.items()]
    )
    if not table:
        return spark.createDataFrame([], out_schema)
    spec = dict(schema)
    ranges = [
        (path, lo, min(lo + frames_per_task, len(table)))
        for lo in range(0, len(table), frames_per_task)
    ]
    meta = spark.sparkContext.broadcast(table)
    rdf = spark.createDataFrame(
        spark.sparkContext.parallelize(ranges, len(ranges)),
        "path string, lo long, hi long",
    )

    def _read(batches):
        import pandas as pd
        import pyarrow as pa

        codec = pa.Codec("zstd")
        tbl = meta.value
        for pdf in batches:
            for f, lo, hi in zip(pdf["path"], pdf["lo"], pdf["hi"]):
                rows = {k: [] for k in spec}
                with open(f, "rb") as fh:
                    for off, csize, dsize in tbl[int(lo) : int(hi)]:
                        fh.seek(off)
                        comp = fh.read(csize)
                        if len(comp) != csize:
                            raise ValueError(
                                f"{f}: truncated frame at offset {off}"
                            )
                        try:
                            text = codec.decompress(
                                comp, decompressed_size=dsize, asbytes=True
                            ).decode("utf-8")
                        except (pa.lib.ArrowException, OSError) as exc:
                            raise ValueError(
                                f"{f}: corrupt zstd frame at {off}: {exc}"
                            ) from exc
                        _decode_jsonl_lines(text, spec, rows)
                yield pd.DataFrame(rows)

    return rdf.mapInPandas(_read, out_schema)
