"""NumPy ``.npy`` shard source/sink for embedding matrices — the flat
binary container FAISS/ScaNN index builders and numpy/torch memmap
loaders consume.  The header is hand-rolled from the PUBLIC ``.npy``
format spec (version 1.0, as documented in numpy/lib/format.py):

  \\x93NUMPY | 0x01 0x00 | uint16le(header_len) | ascii dict padded so
  the total header is a multiple of 64 bytes, ending in '\\n' | raw
  C-order data

so the files interoperate bidirectionally with ``np.load``/``np.save``
(asserted in tests) while the writer stays dependency-light and
byte-deterministic.

Each shard is a PAIR of files — ``part-NNNNN.ids.npy`` (int64 keys) and
``part-NNNNN.emb.npy`` (n x d float32 matrix) — the layout ANN tooling
expects: ids and vectors aligned by row position.

Scale shape matches the other export sinks (webdataset/tfrecord/arrow):
contiguous global-rank shard ranges decided on keys alone
(``sources/sharding.py`` — never one task, vectors never
range-shuffle), one payload shuffle keyed on shard id, one task per
shard on read, atomic ``.inprogress`` renames.
"""

from __future__ import annotations

import ast
import os
import struct

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_MAGIC = b"\x93NUMPY\x01\x00"


def write_npy(fh, arr) -> None:
    """Write a C-contiguous numpy array as .npy v1.0 (hand-rolled
    header; data via tobytes)."""
    import numpy as np

    arr = np.ascontiguousarray(arr)
    descr = arr.dtype.str  # e.g. '<f4', '<i8'
    if arr.dtype.hasobject:
        raise TypeError("object arrays are not writable as .npy")
    header = (
        "{'descr': %r, 'fortran_order': False, 'shape': %r, }"
        % (descr, arr.shape)
    ).encode("latin1")
    # pad with spaces so magic(8) + len(2) + header is a multiple of 64
    pad = 64 - (len(_MAGIC) + 2 + len(header) + 1) % 64
    header += b" " * pad + b"\n"
    fh.write(_MAGIC)
    fh.write(struct.pack("<H", len(header)))
    fh.write(header)
    fh.write(arr.tobytes(order="C"))


def read_npy(fh):
    """Read a .npy v1.0/2.0 file written by us or by np.save."""
    import numpy as np

    magic = fh.read(6)
    if magic != b"\x93NUMPY":
        raise ValueError("not a .npy file (bad magic)")
    version = fh.read(2)
    if len(version) < 2:
        raise ValueError("truncated .npy version bytes")
    major = version[0]
    if major == 1:
        raw = fh.read(2)
        if len(raw) < 2:
            raise ValueError("truncated .npy header length")
        (hlen,) = struct.unpack("<H", raw)
    elif major == 2:
        raw = fh.read(4)
        if len(raw) < 4:
            raise ValueError("truncated .npy header length")
        (hlen,) = struct.unpack("<I", raw)
    else:
        raise ValueError(f"unsupported .npy version {major}")
    try:
        meta = ast.literal_eval(fh.read(hlen).decode("latin1"))
        if not isinstance(meta, dict):
            raise ValueError("npy header is not a dict literal")
        if meta["fortran_order"]:
            raise ValueError("fortran-order .npy not supported")
        dtype = np.dtype(meta["descr"])
        shape = tuple(meta["shape"])
    except (SyntaxError, TypeError, KeyError) as exc:
        # corrupt header bytes must surface as the module's clean error
        raise ValueError(f"corrupt .npy header: {exc}") from exc
    if not all(isinstance(s, int) and s >= 0 for s in shape):
        raise ValueError(f"corrupt .npy shape {shape!r}")
    n_items = 1
    for s in shape:
        n_items *= s
    buf = fh.read(n_items * dtype.itemsize)
    if len(buf) != n_items * dtype.itemsize:
        raise ValueError("truncated .npy data")
    return np.frombuffer(buf, dtype=dtype).reshape(shape)


def write_npy_shards(
    emb: DataFrame,
    out_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    samples_per_shard: int = 100,
) -> DataFrame:
    """Export (id, vector) rows as aligned ids/emb .npy shard pairs;
    returns the manifest (shard_id, n_vecs, dim, first_key, last_key,
    ids_bytes, emb_bytes)."""
    from my_flink_1_10_2_spark.sources.sharding import assign_contiguous_shards

    os.makedirs(out_dir, exist_ok=True)
    # keys-only shard assignment (sharding.py, guide §8): one payload
    # exchange — the groupBy(__shard) into the write kernel
    sharded = assign_contiguous_shards(
        emb.select(id_col, vec_col), id_col, samples_per_shard
    )
    dest, idc, vc = out_dir, id_col, vec_col

    def _write_shard(pdf):
        import numpy as np
        import pandas as pd

        pdf = pdf.sort_values(idc)
        shard_id = int(pdf["__shard"].iloc[0])
        ids = pdf[idc].to_numpy(dtype=np.int64)
        mat = np.stack(pdf[vc].to_numpy()).astype(np.float32)
        ids_path = os.path.join(dest, f"part-{shard_id:05d}.ids.npy")
        emb_path = os.path.join(dest, f"part-{shard_id:05d}.emb.npy")
        for path, arr in ((ids_path, ids), (emb_path, mat)):
            tmp = path + ".inprogress"
            with open(tmp, "wb") as fh:
                write_npy(fh, arr)
            os.replace(tmp, path)
        return pd.DataFrame(
            {
                "shard_id": [shard_id],
                "n_vecs": [len(ids)],
                "dim": [int(mat.shape[1])],
                "first_key": [int(ids.min())],
                "last_key": [int(ids.max())],
                "ids_bytes": [os.path.getsize(ids_path)],
                "emb_bytes": [os.path.getsize(emb_path)],
            }
        )

    schema = (
        "shard_id long, n_vecs long, dim long, first_key long, "
        "last_key long, ids_bytes long, emb_bytes long"
    )
    return sharded.groupBy("__shard").applyInPandas(_write_shard, schema)


def read_npy_shards(
    spark: SparkSession,
    in_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    shard_col: str | None = None,
) -> DataFrame:
    """Read ids/emb .npy shard pairs back, one task per shard; row
    alignment between the two files is positional (verified by length)."""
    ids_paths = sorted(
        os.path.join(in_dir, f)
        for f in os.listdir(in_dir)
        if f.endswith(".ids.npy")
    )
    if not ids_paths:
        raise FileNotFoundError(f"no .ids.npy shards under {in_dir}")
    schema = f"{id_col} long, {vec_col} array<float>"
    if shard_col:
        schema += f", {shard_col} long"

    path_rdd = spark.sparkContext.parallelize(
        [(p,) for p in ids_paths], len(ids_paths)
    )
    path_df = spark.createDataFrame(path_rdd, "path string")

    def _read(batches):
        import pandas as pd

        for pdf in batches:
            for ids_path in pdf["path"]:
                emb_path = ids_path[: -len(".ids.npy")] + ".emb.npy"
                with open(ids_path, "rb") as fh:
                    ids = read_npy(fh)
                with open(emb_path, "rb") as fh:
                    mat = read_npy(fh)
                if len(ids) != len(mat):
                    raise ValueError(
                        f"shard misalignment: {len(ids)} ids vs {len(mat)} vectors"
                    )
                out = pd.DataFrame(
                    {id_col: ids, vec_col: [row for row in mat]}
                )
                if shard_col:
                    base = os.path.basename(ids_path)
                    out[shard_col] = int(base[len("part-"):-len(".ids.npy")])
                yield out

    return path_df.mapInPandas(_read, schema)
