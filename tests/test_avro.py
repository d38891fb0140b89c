"""Avro format: pure-Python container codec + Spark integration.

Reference surface: flink-formats/flink-avro/ (AvroInputFormat.java,
AvroOutputFormat.java, AvroRowDe/SerializationSchema.java).  The sandbox
has no spark-avro jar, so these tests exercise the spec-conformant
fallback in `sources/avro_py.py` end-to-end through `read_avro` /
`write_avro` (distributed binaryFiles read, per-partition writer).
"""

from __future__ import annotations

import datetime
import io

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from my_flink_1_10_2_spark.sources import avro_py
from my_flink_1_10_2_spark.sources.batch import read_avro, write_avro


SCHEMA = {
    "type": "record",
    "name": "r",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "name", "type": ["null", "string"]},
        {"name": "score", "type": "double"},
        {"name": "ok", "type": "boolean"},
        {"name": "d", "type": {"type": "int", "logicalType": "date"}},
        {"name": "tags", "type": {"type": "array", "items": "string"}},
        {"name": "attrs", "type": {"type": "map", "values": "long"}},
    ],
}


def _rows(n):
    return [
        {
            "id": i,
            "name": None if i % 3 == 0 else f"n{i}",
            "score": i * 0.5,
            "ok": i % 2 == 0,
            "d": datetime.date(2020, 1, 1) + datetime.timedelta(days=i % 400),
            "tags": [f"t{j}" for j in range(i % 4)],
            "attrs": {f"k{j}": i + j for j in range(i % 3)},
        }
        for i in range(n)
    ]


def test_container_roundtrip_deflate_and_null(tmp_path):
    rows = _rows(5003)
    for codec in avro_py.CODECS:
        p = str(tmp_path / f"t_{codec}.avro")
        avro_py.write_container(p, SCHEMA, rows, codec=codec, sync_interval=1000)
        schema_back, back = avro_py.read_container(p)
        assert schema_back == SCHEMA
        assert back == rows


def test_snappy_block_crc_is_checked(tmp_path):
    """The spec's per-block CRC32 (of the UNCOMPRESSED data) must be
    verified on read — flip a CRC byte and the reader must refuse."""
    rows = _rows(50)
    p = str(tmp_path / "crc.avro")
    avro_py.write_container(p, SCHEMA, rows, codec="snappy")
    raw = bytearray(open(p, "rb").read())
    # last 20 bytes = 4-byte CRC + 16-byte sync marker of the final block
    raw[-20] ^= 0xFF
    with pytest.raises(ValueError, match="CRC32"):
        avro_py.read_container_bytes(bytes(raw))


def test_split_reads_partition_blocks_exactly(tmp_path):
    """Sync-marker split protocol: for ANY cut of the file into
    contiguous byte ranges, the union of split reads is the whole file
    with no row lost or doubled — incl. cuts landing inside sync
    markers, inside block headers, and inside payloads."""
    import random

    rng = random.Random(870)
    rows = _rows(2003)
    p = str(tmp_path / "split.avro")
    avro_py.write_container(p, SCHEMA, rows, codec="deflate", sync_interval=97)
    import os

    size = os.path.getsize(p)
    for trial in range(60):
        n_cuts = rng.randint(1, 12)
        cuts = sorted(rng.sample(range(1, size), min(n_cuts, size - 1)))
        bounds = [0, *cuts, size]
        got = []
        for lo, hi in zip(bounds, bounds[1:]):
            _, part = avro_py.read_container_split(p, lo, hi)
            got.extend(part)
        assert got == rows, f"trial {trial}: cuts {cuts}"


def test_split_read_covers_all_codecs(tmp_path):
    rows = _rows(503)
    import os

    for codec in avro_py.CODECS:
        p = str(tmp_path / f"s_{codec}.avro")
        avro_py.write_container(p, SCHEMA, rows, codec=codec, sync_interval=50)
        size = os.path.getsize(p)
        mid = size // 2
        _, a = avro_py.read_container_split(p, 0, mid)
        _, b = avro_py.read_container_split(p, mid, size)
        assert a + b == rows, codec


def test_spark_read_avro_is_splittable(spark, tmp_path):
    """A single large container file must scan with MANY tasks — the
    reference's AvroInputFormat split behavior, not one-task-per-file."""
    import pandas as pd

    from my_flink_1_10_2_spark.sources.batch import read_avro

    df = spark.createDataFrame(
        pd.DataFrame({"id": range(20000), "v": [f"s{i}" * 5 for i in range(20000)]})
    )
    path = str(tmp_path / "big")
    write_avro(df.coalesce(1), path)  # ONE container file
    back = read_avro(spark, path, split_bytes=8 << 10)  # 8 KiB splits
    assert back.rdd.getNumPartitions() > 4
    assert back.count() == 20000
    assert back.agg({"id": "sum"}).first()[0] == sum(range(20000))


def test_zstandard_no_content_size_frame():
    """Zstd frames are not required to carry the decompressed size in
    the header (streaming writers omit it); the reader must stream-decode
    rather than rely on a size hint.  Build such a block by hand."""
    import pyarrow as pa

    rows = _rows(64)
    body = io.BytesIO()
    for r in rows:
        avro_py.encode_value(body, SCHEMA, r)
    payload = body.getvalue()
    # pyarrow's CompressedOutputStream writes frames WITHOUT content size
    sink = pa.BufferOutputStream()
    with pa.output_stream(sink, compression="zstd") as zout:
        zout.write(payload)
    frame = sink.getvalue().to_pybytes()
    assert avro_py._decompress_block("zstandard", frame) == payload


def test_zigzag_varint_edge_values():
    for n in (0, -1, 1, 63, 64, -64, -65, 2**31 - 1, -(2**31), 2**62, -(2**62)):
        buf = io.BytesIO()
        avro_py._write_long(buf, n)
        buf.seek(0)
        assert avro_py._read_long(buf) == n


def test_negative_count_array_blocks_decode():
    # Spec: a negative item count is followed by the block byte size.
    schema = {"type": "array", "items": "long"}
    buf = io.BytesIO()
    inner = io.BytesIO()
    for v in (7, 8, 9):
        avro_py._write_long(inner, v)
    avro_py._write_long(buf, -3)
    avro_py._write_long(buf, len(inner.getvalue()))
    buf.write(inner.getvalue())
    avro_py._write_long(buf, 0)
    buf.seek(0)
    assert avro_py.decode_value(buf, schema) == [7, 8, 9]


def test_timestamp_logical_types():
    schema = {
        "type": "record",
        "name": "t",
        "fields": [
            {"name": "ms", "type": {"type": "long", "logicalType": "timestamp-millis"}},
            {"name": "us", "type": {"type": "long", "logicalType": "timestamp-micros"}},
        ],
    }
    ts = datetime.datetime(2021, 6, 1, 12, 34, 56, 789000)
    buf = io.BytesIO()
    avro_py.encode_value(buf, schema, {"ms": ts, "us": ts})
    buf.seek(0)
    back = avro_py.decode_value(buf, schema)
    assert back == {"ms": ts, "us": ts}


def test_spark_write_read_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [
            Row(
                id=i,
                name=None if i % 3 == 0 else f"n{i}",
                score=i * 0.25,
                ok=i % 2 == 0,
                d=datetime.date(2020, 1, 1) + datetime.timedelta(days=i),
                ts=datetime.datetime(2021, 1, 1) + datetime.timedelta(seconds=i, microseconds=i),
                tags=[f"t{j}" for j in range(i % 3)],
            )
            for i in range(257)
        ]
    ).repartition(4)
    path = str(tmp_path / "spark_avro")
    write_avro(df, path)
    back = read_avro(spark, path)
    assert back.schema["id"].dataType == T.LongType()
    assert back.schema["d"].dataType == T.DateType()
    assert back.schema["ts"].dataType == T.TimestampType()
    a = sorted(df.collect(), key=lambda r: r.id)
    b = sorted(back.collect(), key=lambda r: r.id)
    assert a == b


def test_spark_read_is_distributed_per_file(spark, tmp_path):
    df = spark.range(100).withColumn("s", F.concat(F.lit("x"), F.col("id")))
    path = str(tmp_path / "many")
    write_avro(df.repartition(8), path)
    back = read_avro(spark, path)
    assert back.count() == 100
    import os

    assert len([f for f in os.listdir(path) if f.endswith(".avro")]) == 8


def test_write_modes(spark, tmp_path):
    df = spark.range(10)
    path = str(tmp_path / "modes")
    write_avro(df, path)
    write_avro(df, path, mode="append")
    assert read_avro(spark, path).count() == 20
    write_avro(df, path, mode="overwrite")
    assert read_avro(spark, path).count() == 10
    with pytest.raises(FileExistsError):
        write_avro(df, path, mode="error")
    write_avro(df, path, mode="ignore")
    assert read_avro(spark, path).count() == 10


def test_nested_struct_roundtrip(spark, tmp_path):
    schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField(
                "meta",
                T.StructType(
                    [
                        T.StructField("k", T.StringType(), True),
                        T.StructField("v", T.DoubleType(), True),
                    ]
                ),
                True,
            ),
        ]
    )
    df = spark.createDataFrame(
        [(i, {"k": f"k{i}", "v": float(i)}) for i in range(20)], schema=schema
    )
    path = str(tmp_path / "nested")
    write_avro(df, path)
    back = read_avro(spark, path)
    assert sorted((r.id, r.meta.k, r.meta.v) for r in back.collect()) == sorted(
        (r.id, r.meta.k, r.meta.v) for r in df.collect()
    )


def test_write_read_empty_dataframe(spark, tmp_path):
    """Regression: an empty write leaves a schema-carrying container so
    read-back returns an empty frame (parquet-like), not an error."""
    df = spark.range(5).where("id > 100").withColumn("s", F.lit("x"))
    path = str(tmp_path / "empty_avro")
    write_avro(df, path)
    back = read_avro(spark, path)
    assert back.count() == 0
    assert set(back.columns) == {"id", "s"}


def test_timestamp_millis_is_utc_naive():
    """Regression: millis encoding must use naive-delta arithmetic, not
    host-local datetime.timestamp()."""
    import io

    schema = {"type": "long", "logicalType": "timestamp-millis"}
    ts = datetime.datetime(2024, 1, 1, 12, 0, 0)
    buf = io.BytesIO()
    avro_py.encode_value(buf, schema, ts)
    buf.seek(0)
    raw = avro_py._read_long(buf)
    # exact epoch millis for 2024-01-01T12:00:00 (timezone-independent)
    assert raw == 1704110400000
