"""Tests for the .jsonl.zst shard source/sink: lossless roundtrip,
deterministic bytes, third-party parseability, and shard layout."""

from __future__ import annotations

import json
import os
import shutil
import tempfile

import duckdb
import pytest

from my_flink_1_10_2_spark.queries import read
from my_flink_1_10_2_spark.sources.jsonl_zst import (
    read_jsonl_zst_shards,
    write_jsonl_zst_shards,
)
from tests.conftest import SF_DIR


@pytest.fixture()
def workdir():
    d = tempfile.mkdtemp(prefix="fl_jzst_t_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_roundtrip_exact_and_compressed(spark, workdir):
    docs = read(spark, SF_DIR, "documents").select("doc_id", "text", "lang")
    manifest = write_jsonl_zst_shards(docs, workdir, samples_per_shard=30).collect()
    assert sum(m.n_records for m in manifest) == docs.count()
    assert all(m.zst_bytes < m.raw_bytes for m in manifest), "no compression?"
    back = read_jsonl_zst_shards(
        spark, workdir, {"doc_id": "long", "text": "string", "lang": "string"}
    )
    src = {r.doc_id: (r.text, r.lang) for r in docs.collect()}
    got = {r.doc_id: (r.text, r.lang) for r in back.collect()}
    assert got == src


def test_deterministic_bytes(spark, workdir):
    docs = read(spark, SF_DIR, "documents").select("doc_id", "text").limit(20)
    d1, d2 = os.path.join(workdir, "a"), os.path.join(workdir, "b")
    write_jsonl_zst_shards(docs, d1, samples_per_shard=10).collect()
    write_jsonl_zst_shards(docs, d2, samples_per_shard=10).collect()
    for f in sorted(os.listdir(d1)):
        with open(os.path.join(d1, f), "rb") as fa, open(
            os.path.join(d2, f), "rb"
        ) as fb:
            assert fa.read() == fb.read(), f"{f} differs between runs"


def test_third_party_consumers_parse_our_shards(spark, workdir):
    """DuckDB's read_json and stdlib json both consume the shards (after
    generic zstd decompression) — proving the format is the public one,
    not a private dialect."""
    import pyarrow as pa

    docs = read(spark, SF_DIR, "documents").select("doc_id", "n_chars").limit(15)
    write_jsonl_zst_shards(docs, workdir, samples_per_shard=15).collect()
    path = os.path.join(workdir, "part-00000.jsonl.zst")
    with pa.input_stream(path, compression="zstd") as fh:
        text = fh.read().decode()
    objs = [json.loads(ln) for ln in text.splitlines()]
    assert len(objs) == 15 and all(set(o) == {"doc_id", "n_chars"} for o in objs)
    # DuckDB reads the decompressed JSONL directly
    plain = os.path.join(workdir, "plain.jsonl")
    with open(plain, "w") as fh:
        fh.write(text)
    n = duckdb.connect().execute(
        f"SELECT count(*), sum(n_chars) FROM read_json('{plain}')"
    ).fetchone()
    want = docs.agg({"n_chars": "sum"}).collect()[0][0]
    assert n == (15, want)


def test_missing_dir_and_empty(spark, workdir):
    with pytest.raises(FileNotFoundError):
        read_jsonl_zst_shards(spark, workdir, {"doc_id": "long"})
