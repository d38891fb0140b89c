"""WebDataset tar-shard source/sink (sources/webdataset.py): roundtrip
exactness, canonical (deterministic) tar bytes, shard contiguity, stdlib
interop, and the one-task-per-shard read shape.
"""
import hashlib
import io
import os
import shutil
import tarfile
import tempfile

import pytest
from pyspark.sql import functions as F

from my_flink_1_10_2_spark.sources.webdataset import (
    read_webdataset,
    write_webdataset,
)


@pytest.fixture()
def workdir():
    d = tempfile.mkdtemp(prefix="wds_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _sample_df(spark, n=25):
    rows = [(i, f"text of doc {i}", bytes([i % 251, 7, i % 13])) for i in range(n)]
    return spark.createDataFrame(rows, "doc_id long, text string, blob binary")


def test_roundtrip_bytes_exact_multi_column(spark, workdir):
    df = _sample_df(spark)
    write_webdataset(
        df, workdir, columns={"text": "txt", "blob": "bin"}, samples_per_shard=10
    ).collect()
    back = {
        r.key: (bytes(r.txt), bytes(r.bin))
        for r in read_webdataset(spark, workdir, extensions=["txt", "bin"]).collect()
    }
    src = {r.doc_id: (r.text.encode(), bytes(r.blob)) for r in df.collect()}
    assert back == src


def test_shards_are_contiguous_key_ranges(spark, workdir):
    manifest = write_webdataset(
        _sample_df(spark), workdir, samples_per_shard=10
    ).collect()
    rows = sorted((r.shard_id, r.n_samples, r.first_key, r.last_key) for r in manifest)
    assert rows == [(0, 10, 0, 9), (1, 10, 10, 19), (2, 5, 20, 24)]
    assert sorted(os.listdir(workdir)) == [
        "shard-000000.tar", "shard-000001.tar", "shard-000002.tar",
    ]


def test_tar_bytes_are_deterministic(spark, workdir):
    df = _sample_df(spark)
    d1, d2 = os.path.join(workdir, "a"), os.path.join(workdir, "b")
    for d in (d1, d2):
        write_webdataset(
            df, d, columns={"text": "txt", "blob": "bin"}, samples_per_shard=7
        ).collect()
    for f in sorted(os.listdir(d1)):
        h1 = hashlib.md5(open(os.path.join(d1, f), "rb").read()).hexdigest()
        h2 = hashlib.md5(open(os.path.join(d2, f), "rb").read()).hexdigest()
        assert h1 == h2, f


def test_members_sorted_and_canonical_metadata(spark, workdir):
    write_webdataset(_sample_df(spark, 5), workdir, samples_per_shard=5).collect()
    with tarfile.open(os.path.join(workdir, "shard-000000.tar")) as tar:
        infos = list(tar)
        assert [ti.name for ti in infos] == [
            f"{i:012d}.txt" for i in range(5)
        ]
        for ti in infos:
            assert (ti.mtime, ti.uid, ti.gid, ti.mode) == (0, 0, 0, 0o644)


def test_reads_external_stdlib_tar(spark, workdir):
    # A shard written by any WebDataset producer (here: plain tarfile)
    # must read back identically — format interop, not a private layout.
    path = os.path.join(workdir, "shard-000003.tar")
    with tarfile.open(path, "w") as tar:
        for key, payload in [(101, b"alpha"), (102, b"beta")]:
            ti = tarfile.TarInfo(f"{key:012d}.txt")
            ti.size = len(payload)
            tar.addfile(ti, io.BytesIO(payload))
    got = {
        r.key: (r.shard_id, bytes(r.txt))
        for r in read_webdataset(spark, workdir, extensions=["txt"]).collect()
    }
    assert got == {101: (3, b"alpha"), 102: (3, b"beta")}


def test_unknown_extensions_ignored(spark, workdir):
    write_webdataset(
        _sample_df(spark, 4), workdir,
        columns={"text": "txt", "blob": "bin"}, samples_per_shard=4,
    ).collect()
    rows = read_webdataset(spark, workdir, extensions=["txt"]).collect()
    assert sorted(r.key for r in rows) == [0, 1, 2, 3]
    assert "bin" not in rows[0].asDict()


def test_read_parallelism_is_one_task_per_shard(spark, workdir):
    write_webdataset(_sample_df(spark, 24), workdir, samples_per_shard=6).collect()
    back = read_webdataset(spark, workdir, extensions=["txt"])
    per_part = back.withColumn("p", F.spark_partition_id()) \
        .groupBy("p").agg(F.countDistinct("shard_id").alias("n")).collect()
    assert all(r.n == 1 for r in per_part)  # no task reads two shards
    assert sum(r.n for r in per_part) == 4
