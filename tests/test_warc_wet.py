"""WARC/WET source/sink tests: spec framing, multi-member gzip layout,
deterministic bytes, record-type skipping, and corruption rejection."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest

from my_flink_1_10_2_spark.queries import read
from my_flink_1_10_2_spark.sources.warc import (
    decode_warc_records,
    encode_warc_record,
    read_wet_shards,
    write_wet_shards,
)
from tests.conftest import SF_DIR


@pytest.fixture()
def workdir():
    d = tempfile.mkdtemp(prefix="fl_wet_t_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_record_framing_roundtrip():
    recs = [
        ("warcinfo", "info-1", b"software: x\r\n", None),
        ("conversion", "doc-1", "héllo wörld".encode(), {"WARC-Target-URI": "urn:doc:1"}),
        ("conversion", "doc-2", b"", {"WARC-Target-URI": "urn:doc:2"}),
    ]
    stream = b"".join(
        encode_warc_record(t, rid, "2026-01-01T00:00:00Z", p, extra_headers=x)
        for t, rid, p, x in recs
    )
    got = list(decode_warc_records(stream))
    assert [h["WARC-Type"] for h, _ in got] == ["warcinfo", "conversion", "conversion"]
    assert got[1][1].decode() == "héllo wörld"
    assert got[1][0]["WARC-Target-URI"] == "urn:doc:1"
    assert got[2][1] == b""
    # Content-Length is bytes, not chars
    assert int(got[1][0]["Content-Length"]) == len("héllo wörld".encode())


def test_framing_rejects_malformed():
    rec = encode_warc_record("conversion", "d", "2026-01-01T00:00:00Z", b"abc")
    with pytest.raises(ValueError, match="version"):
        list(decode_warc_records(rec.replace(b"WARC/1.0", b"WARC/9.9")))
    with pytest.raises(ValueError, match="terminator"):
        list(decode_warc_records(rec[:-2]))
    with pytest.raises(ValueError, match="truncated"):
        list(decode_warc_records(rec[: rec.index(b"abc") + 1]))


def test_wet_shards_multi_member_gzip_and_determinism(spark, workdir):
    docs = read(spark, SF_DIR, "documents").select("doc_id", "text").limit(25)
    d1, d2 = os.path.join(workdir, "a"), os.path.join(workdir, "b")
    write_wet_shards(docs, d1, samples_per_shard=10).collect()
    write_wet_shards(docs, d2, samples_per_shard=10).collect()
    files = sorted(os.listdir(d1))
    assert files == sorted(os.listdir(d2))
    for f in files:
        with open(os.path.join(d1, f), "rb") as fa, open(
            os.path.join(d2, f), "rb"
        ) as fb:
            assert fa.read() == fb.read(), f"{f} bytes differ between runs"
    # every record is its own gzip member (the Common Crawl seekable
    # layout): zlib stops at each member boundary, so counting members
    # must give n_records + 1 (warcinfo) for the first shard
    import zlib

    path = os.path.join(d1, files[0])
    with open(path, "rb") as fh:
        raw = fh.read()
    members = 0
    rest = raw
    while rest:
        dec = zlib.decompressobj(wbits=31)
        body = dec.decompress(rest)
        assert dec.eof and body.startswith(b"WARC/1.0")
        rest = dec.unused_data
        members += 1
    assert members == 11  # warcinfo + 10 conversions


def test_wet_roundtrip_and_warcinfo_skipped(spark, workdir):
    docs = read(spark, SF_DIR, "documents").select("doc_id", "text")
    manifest = write_wet_shards(docs, workdir, samples_per_shard=40).collect()
    n_src = docs.count()
    assert sum(m.n_records for m in manifest) == n_src
    back = read_wet_shards(spark, workdir, shard_col="sid").collect()
    assert len(back) == n_src  # warcinfo records skipped, no loss
    src = {f"urn:doc:{r.doc_id}": r.text for r in docs.collect()}
    got = {r.doc_uri: r.text for r in back}
    assert got == src
