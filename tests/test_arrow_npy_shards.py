"""Tests for the Arrow IPC and .npy shard source/sinks: lossless
roundtrips, interop with the canonical implementations, shard layout,
and corruption rejection."""

from __future__ import annotations

import io
import os
import shutil
import struct
import tempfile

import numpy as np
import pytest
from pyspark.sql import functions as F

from my_flink_1_10_2_spark.queries import read
from my_flink_1_10_2_spark.sources.arrow_ipc import (
    read_arrow_shards,
    write_arrow_shards,
)
from my_flink_1_10_2_spark.sources.npy_shards import (
    read_npy,
    read_npy_shards,
    write_npy,
    write_npy_shards,
)
from tests.conftest import SF_DIR


@pytest.fixture()
def workdir():
    d = tempfile.mkdtemp(prefix="fl_shards_t_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


# ---------------------------------------------------------------- arrow ipc


def test_arrow_roundtrip_exact_multicolumn(spark, workdir):
    docs = read(spark, SF_DIR, "documents").select(
        "doc_id", "text", "lang", "n_chars"
    )
    manifest = write_arrow_shards(
        docs, workdir, key_col="doc_id", samples_per_shard=7
    ).collect()
    n_src = docs.count()
    assert sum(m.n_samples for m in manifest) == n_src
    # contiguous, non-overlapping key ranges
    spans = sorted((m.first_key, m.last_key) for m in manifest)
    for (a_lo, a_hi), (b_lo, b_hi) in zip(spans, spans[1:]):
        assert a_hi < b_lo
    back = read_arrow_shards(spark, workdir)
    src = {r.doc_id: (r.text, r.lang, r.n_chars) for r in docs.collect()}
    got = {r.doc_id: (r.text, r.lang, r.n_chars) for r in back.collect()}
    assert got == src


def test_arrow_shard_files_deterministic(spark, workdir):
    docs = read(spark, SF_DIR, "documents").select("doc_id", "text").limit(20)
    d1, d2 = os.path.join(workdir, "a"), os.path.join(workdir, "b")
    write_arrow_shards(docs, d1, samples_per_shard=8).collect()
    write_arrow_shards(docs, d2, samples_per_shard=8).collect()
    for f in sorted(os.listdir(d1)):
        with open(os.path.join(d1, f), "rb") as fa, open(
            os.path.join(d2, f), "rb"
        ) as fb:
            assert fa.read() == fb.read(), f"{f} bytes differ between runs"


def test_arrow_pyarrow_interop_and_compression(spark, workdir):
    import pyarrow.ipc as ipc

    docs = read(spark, SF_DIR, "documents").select("doc_id", "n_chars").limit(30)
    write_arrow_shards(
        docs, workdir, samples_per_shard=10, compression="zstd"
    ).collect()
    # plain pyarrow reads our shards
    total = 0
    for f in sorted(os.listdir(workdir)):
        with open(os.path.join(workdir, f), "rb") as fh:
            total += ipc.open_file(fh).read_all().num_rows
    assert total == 30
    back = read_arrow_shards(spark, workdir)
    assert back.count() == 30


def test_arrow_read_parallelism_one_task_per_shard(spark, workdir):
    docs = read(spark, SF_DIR, "documents").select("doc_id").limit(40)
    write_arrow_shards(docs, workdir, samples_per_shard=10).collect()
    n_shards = len([f for f in os.listdir(workdir) if f.endswith(".arrow")])
    assert n_shards == 4
    back = read_arrow_shards(spark, workdir, shard_col="sid")
    assert back.rdd.getNumPartitions() == n_shards
    per_task = back.groupBy(F.spark_partition_id().alias("pid")).agg(
        F.countDistinct("sid").alias("n")
    )
    assert all(r.n == 1 for r in per_task.collect())


def test_arrow_schema_drift_rejected(spark, workdir):
    docs = read(spark, SF_DIR, "documents")
    write_arrow_shards(
        docs.select("doc_id", "n_chars").limit(10), workdir, samples_per_shard=10
    ).collect()
    # overwrite a second shard with a DIFFERENT schema
    write_arrow_shards(
        docs.select("doc_id", "text").limit(10),
        workdir + "_other",
        samples_per_shard=10,
    ).collect()
    shutil.copy(
        os.path.join(workdir + "_other", "part-00000.arrow"),
        os.path.join(workdir, "part-00001.arrow"),
    )
    with pytest.raises(Exception, match="schema drift"):
        read_arrow_shards(spark, workdir).collect()


# ------------------------------------------------------------------- .npy


def test_npy_header_spec_and_numpy_interop():
    for arr in (
        np.arange(10, dtype=np.int64),
        np.linspace(0, 1, 12, dtype=np.float32).reshape(3, 4),
    ):
        buf = io.BytesIO()
        write_npy(buf, arr)
        raw = buf.getvalue()
        # spec: magic + version + header multiple of 64, ends with \n
        (hlen,) = struct.unpack("<H", raw[8:10])
        assert (10 + hlen) % 64 == 0
        assert raw[10 + hlen - 1 : 10 + hlen] == b"\n"
        # np.load reads ours
        got = np.load(io.BytesIO(raw))
        np.testing.assert_array_equal(got, arr)
        # ours reads np.save
        buf2 = io.BytesIO()
        np.save(buf2, arr)
        buf2.seek(0)
        np.testing.assert_array_equal(read_npy(buf2), arr)


def test_npy_rejects_corruption():
    arr = np.arange(6, dtype=np.int64)
    buf = io.BytesIO()
    write_npy(buf, arr)
    raw = buf.getvalue()
    with pytest.raises(ValueError, match="magic"):
        read_npy(io.BytesIO(b"JUNK" + raw[4:]))
    with pytest.raises(ValueError, match="truncated"):
        read_npy(io.BytesIO(raw[:-8]))


def test_npy_shard_roundtrip_bitexact(spark, workdir):
    emb = read(spark, SF_DIR, "embeddings")
    manifest = write_npy_shards(emb, workdir, samples_per_shard=16).collect()
    assert sum(m.n_vecs for m in manifest) == emb.count()
    assert all(m.dim == 64 for m in manifest)
    back = read_npy_shards(spark, workdir)
    src = {r.vec_id: list(r.embedding) for r in emb.collect()}
    got = {r.vec_id: list(r.embedding) for r in back.collect()}
    assert got.keys() == src.keys()
    for k in src:
        # float32 in parquet -> float32 in .npy: bit-exact
        assert got[k] == src[k], f"vector {k} changed in roundtrip"


def test_npy_shard_misalignment_detected(spark, workdir):
    emb = read(spark, SF_DIR, "embeddings").limit(20)
    write_npy_shards(emb, workdir, samples_per_shard=20).collect()
    # truncate the ids file to 19 rows to break alignment
    ids_path = os.path.join(workdir, "part-00000.ids.npy")
    with open(ids_path, "rb") as fh:
        ids = read_npy(fh)
    with open(ids_path, "wb") as fh:
        write_npy(fh, ids[:-1])
    with pytest.raises(Exception, match="misalignment"):
        read_npy_shards(spark, workdir).collect()
