"""zstd-compressed JSONL shard source/sink — the corpus container of
The Pile / RedPajama / Dolma releases: one JSON object per line,
whole-file zstd framing (``.jsonl.zst``).  Compression rides pyarrow's
bundled zstd streams (no extra dependency); JSON encoding is stdlib
``json`` with ``sort_keys=True`` and fixed separators so shard bytes
are deterministic and any JSONL consumer (jq, datasets, duckdb's
read_json) parses them.

Scale shape matches the other export sinks: contiguous global-rank
shard ranges (``operators/rank.py::global_rank`` — never one task),
one shuffle keyed on shard id to write, one task per shard to read,
atomic ``.inprogress`` renames.
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

    from my_flink_1_10_2_spark.operators.rank import global_rank

    cols = cols or list(df.columns)
    if key_col not in cols:
        cols = [key_col] + cols
    os.makedirs(out_dir, exist_ok=True)
    ranked = global_rank(df.select(*cols), [F.asc(key_col)], rank_col="__rk")
    sharded = ranked.withColumn(
        "__shard", ((F.col("__rk") - 1) / samples_per_shard).cast("bigint")
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
    return rows


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
