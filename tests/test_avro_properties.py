"""Property-based Avro codec tests (hypothesis): the hand-written binary
encoder/decoder (sources/avro_py.py) must roundtrip arbitrary values —
the same role the reference's AvroSerializerSnapshotTest /
randomized-record tests play for flink-avro.  Pure-Python, no Spark.
"""

from __future__ import annotations

import datetime
import io

from hypothesis import given, settings
from hypothesis import strategies as st

from my_flink_1_10_2_spark.sources import avro_py

SCHEMA = {
    "type": "record",
    "name": "r",
    "fields": [
        {"name": "i", "type": "long"},
        {"name": "s", "type": ["null", "string"]},
        {"name": "d", "type": "double"},
        {"name": "b", "type": "boolean"},
        {"name": "raw", "type": "bytes"},
        {"name": "day", "type": {"type": "int", "logicalType": "date"}},
        {"name": "arr", "type": {"type": "array", "items": "long"}},
        {"name": "m", "type": {"type": "map", "values": ["null", "string"]}},
    ],
}

finite_doubles = st.floats(allow_nan=False, allow_infinity=False, width=64)
text = st.text(max_size=60)  # includes surrogateless unicode, empty
rows = st.fixed_dictionaries(
    {
        "i": st.integers(min_value=-(2**63), max_value=2**63 - 1),
        "s": st.none() | text,
        "d": finite_doubles,
        "b": st.booleans(),
        "raw": st.binary(max_size=40),
        "day": st.dates(
            min_value=datetime.date(1, 1, 1), max_value=datetime.date(9999, 12, 31)
        ),
        "arr": st.lists(st.integers(min_value=-(2**62), max_value=2**62), max_size=8),
        "m": st.dictionaries(text, st.none() | text, max_size=6),
    }
)


@settings(max_examples=300, deadline=None)
@given(rows)
def test_record_roundtrip(row):
    buf = io.BytesIO()
    avro_py.encode_value(buf, SCHEMA, row)
    buf.seek(0)
    assert avro_py.decode_value(buf, SCHEMA) == row


@settings(max_examples=200, deadline=None)
@given(st.lists(rows, max_size=25), st.sampled_from(avro_py.CODECS))
def test_container_roundtrip(batch, codec):
    import os
    import tempfile

    fd, path = tempfile.mkstemp(suffix=".avro")
    os.close(fd)
    try:
        avro_py.write_container(path, SCHEMA, batch, codec=codec, sync_interval=7)
        schema, back = avro_py.read_container(path)
        assert schema == SCHEMA and back == batch
    finally:
        os.unlink(path)


@settings(max_examples=500, deadline=None)
@given(st.integers(min_value=-(2**63), max_value=2**63 - 1))
def test_varint_roundtrip(n):
    buf = io.BytesIO()
    avro_py._write_long(buf, n)
    buf.seek(0)
    assert avro_py._read_long(buf) == n
