"""Pure-Python Avro Object Container File codec (SURVEY §2.1, Avro row).

The reference ships a first-class Avro format module
(ref: flink-formats/flink-avro/src/main/java/org/apache/flink/formats/
avro/AvroRowDeserializationSchema.java, AvroRowSerializationSchema.java,
AvroInputFormat.java).  Spark's `format("avro")` datasource needs the
external spark-avro jar, which is not on this sandbox's classpath, so
`read_avro`/`write_avro` fall back to this self-contained implementation
of the public Avro 1.x spec (container format + binary encoding:
https://avro.apache.org/docs/1.11.1/specification/).

Scale design: the fallback READ path is distributed — one task per
container file via `binaryFiles` (Avro files are block-structured but
the common layout is many files of one-block-ish size; per-file
parallelism matches the reference's `AvroInputFormat` split strategy
for unsplittable-compressed inputs).  The WRITE path emits one
container file per partition directly from executors (posix paths;
object stores need the jar path).  Codecs: `null` and `deflate`
(zlib raw), matching the jars the reference bundles by default.

Supported types (both directions): boolean, int, long, float, double,
bytes, string, fixed, enum, record, array, map, unions with null,
logical date (int) and timestamp-millis/micros (long).
"""

from __future__ import annotations

import datetime
import io
import json
import os
import struct
import zlib

MAGIC = b"Obj\x01"

#: The six spec codecs.  null/deflate/bzip2/xz are pure-stdlib;
#: snappy/zstandard ride pyarrow's bundled C codecs (the same dependency
#: that already powers `sources/jsonl_zst.py`), gated behind an import-try
#: so the module stays importable without pyarrow.
CODECS = ("null", "deflate", "bzip2", "xz", "snappy", "zstandard")


def _pa_codec(name: str):
    try:
        import pyarrow as pa

        return pa.Codec(name)
    except Exception as exc:  # pragma: no cover - pyarrow is baked in here
        raise NotImplementedError(f"codec needs pyarrow: {exc}") from exc


def _snappy_uvarint(data: bytes) -> int:
    """Raw-snappy preamble: uncompressed length as an unsigned LEB128."""
    x = shift = i = 0
    while True:
        b = data[i]
        i += 1
        x |= (b & 0x7F) << shift
        if not b & 0x80:
            return x
        shift += 7


def _compress_block(codec: str, data: bytes) -> bytes:
    if codec == "deflate":
        comp = zlib.compressobj(6, zlib.DEFLATED, -15)
        return comp.compress(data) + comp.flush()
    if codec == "bzip2":
        import bz2

        return bz2.compress(data)
    if codec == "xz":
        import lzma

        # spec: xz stream format (what avro-tools writes)
        return lzma.compress(data, format=lzma.FORMAT_XZ)
    if codec == "snappy":
        # spec: raw snappy + 4-byte big-endian CRC32 of the UNCOMPRESSED data
        out = _pa_codec("snappy").compress(data, asbytes=True)
        return out + struct.pack(">I", zlib.crc32(data) & 0xFFFFFFFF)
    if codec == "zstandard":
        return _pa_codec("zstd").compress(data, asbytes=True)
    return data  # null


def _decompress_block(codec: str, payload: bytes) -> bytes:
    if codec == "deflate":
        return zlib.decompress(payload, -15)
    if codec == "bzip2":
        import bz2

        return bz2.decompress(payload)
    if codec == "xz":
        import lzma

        return lzma.decompress(payload)
    if codec == "snappy":
        if len(payload) < 5:  # ≥1-byte uvarint body + 4-byte CRC32 trailer
            raise ValueError("corrupt avro snappy block: too short")
        body, crc = payload[:-4], payload[-4:]
        try:
            out = _pa_codec("snappy").decompress(
                body, decompressed_size=_snappy_uvarint(body), asbytes=True
            )
        except OSError as exc:  # pyarrow's corrupt-data surface
            raise ValueError(f"corrupt avro snappy block: {exc}") from exc
        if struct.pack(">I", zlib.crc32(out) & 0xFFFFFFFF) != crc:
            raise ValueError("avro snappy block CRC32 mismatch")
        return out
    if codec == "zstandard":
        # Stream-decode: zstd frames need not carry the content size, so
        # size-hinted one-shot decompress is not spec-safe here.
        import pyarrow as pa

        try:
            stream = pa.input_stream(pa.BufferReader(payload), compression="zstd")
        except Exception as exc:  # pragma: no cover
            raise NotImplementedError(f"codec needs pyarrow: {exc}") from exc
        try:
            return stream.read()
        except OSError as exc:  # corrupt frame data
            raise ValueError(f"corrupt avro zstandard block: {exc}") from exc
    return payload  # null


# ---------------------------------------------------------------------------
# binary primitives


def _zigzag_encode(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _write_long(buf: io.BytesIO, n: int) -> None:
    z = _zigzag_encode(n) & 0xFFFFFFFFFFFFFFFF
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            buf.write(bytes((b | 0x80,)))
        else:
            buf.write(bytes((b,)))
            return


def _read_long(buf) -> int:
    shift = 0
    acc = 0
    while True:
        (b,) = buf.read(1)
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1)


def _write_bytes(buf: io.BytesIO, data: bytes) -> None:
    _write_long(buf, len(data))
    buf.write(data)


def _read_bytes(buf) -> bytes:
    return buf.read(_read_long(buf))


# ---------------------------------------------------------------------------
# schema-driven encode/decode

_EPOCH_DATE = datetime.date(1970, 1, 1)
_EPOCH_TS = datetime.datetime(1970, 1, 1)


def _resolve(schema):
    """Normalize a parsed Avro schema node to (kind, node)."""
    if isinstance(schema, str):
        return schema, schema
    if isinstance(schema, list):
        return "union", schema
    return schema["type"], schema


def encode_value(buf: io.BytesIO, schema, value) -> None:
    kind, node = _resolve(schema)
    if kind == "union":
        for i, branch in enumerate(node):
            bk, _ = _resolve(branch)
            if value is None and bk == "null":
                _write_long(buf, i)
                return
            if value is not None and bk != "null":
                _write_long(buf, i)
                encode_value(buf, branch, value)
                return
        raise ValueError(f"no union branch for {value!r} in {node}")
    if kind == "null":
        return
    if kind == "boolean":
        buf.write(b"\x01" if value else b"\x00")
    elif kind in ("int", "long"):
        logical = isinstance(node, dict) and node.get("logicalType")
        if logical == "date":
            value = (value - _EPOCH_DATE).days
        elif logical == "timestamp-millis":
            # naive-delta arithmetic (UTC-naive) on BOTH encode and
            # decode — never host-local `datetime.timestamp()`
            if isinstance(value, datetime.datetime):
                delta = value.replace(tzinfo=None) - _EPOCH_TS
                value = (
                    delta.days * 86400_000
                    + delta.seconds * 1000
                    + delta.microseconds // 1000
                )
        elif logical == "timestamp-micros":
            if isinstance(value, datetime.datetime):
                delta = value.replace(tzinfo=None) - _EPOCH_TS
                value = delta.days * 86400_000_000 + delta.seconds * 1_000_000 + delta.microseconds
        _write_long(buf, int(value))
    elif kind == "float":
        buf.write(struct.pack("<f", value))
    elif kind == "double":
        buf.write(struct.pack("<d", value))
    elif kind == "bytes":
        _write_bytes(buf, bytes(value))
    elif kind == "string":
        _write_bytes(buf, value.encode("utf-8"))
    elif kind == "fixed":
        data = bytes(value)
        if len(data) != node["size"]:
            raise ValueError("fixed size mismatch")
        buf.write(data)
    elif kind == "enum":
        _write_long(buf, node["symbols"].index(value))
    elif kind == "record":
        for field in node["fields"]:
            encode_value(buf, field["type"], value[field["name"]] if isinstance(value, dict) else getattr(value, field["name"]))
    elif kind == "array":
        items = list(value)
        if items:
            _write_long(buf, len(items))
            for item in items:
                encode_value(buf, node["items"], item)
        _write_long(buf, 0)
    elif kind == "map":
        entries = dict(value)
        if entries:
            _write_long(buf, len(entries))
            for k, v in entries.items():
                _write_bytes(buf, k.encode("utf-8"))
                encode_value(buf, node["values"], v)
        _write_long(buf, 0)
    else:
        raise NotImplementedError(f"avro type {kind!r}")


def decode_value(buf, schema):
    kind, node = _resolve(schema)
    if kind == "union":
        return decode_value(buf, node[_read_long(buf)])
    if kind == "null":
        return None
    if kind == "boolean":
        return buf.read(1) == b"\x01"
    if kind in ("int", "long"):
        raw = _read_long(buf)
        logical = isinstance(node, dict) and node.get("logicalType")
        if logical == "date":
            return _EPOCH_DATE + datetime.timedelta(days=raw)
        if logical == "timestamp-millis":
            return _EPOCH_TS + datetime.timedelta(milliseconds=raw)
        if logical == "timestamp-micros":
            return _EPOCH_TS + datetime.timedelta(microseconds=raw)
        return raw
    if kind == "float":
        return struct.unpack("<f", buf.read(4))[0]
    if kind == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if kind == "bytes":
        return _read_bytes(buf)
    if kind == "string":
        return _read_bytes(buf).decode("utf-8")
    if kind == "fixed":
        return buf.read(node["size"])
    if kind == "enum":
        return node["symbols"][_read_long(buf)]
    if kind == "record":
        return {f["name"]: decode_value(buf, f["type"]) for f in node["fields"]}
    if kind == "array":
        out = []
        while True:
            count = _read_long(buf)
            if count == 0:
                return out
            if count < 0:  # block-size-prefixed form (spec: skippable blocks)
                _read_long(buf)
                count = -count
            for _ in range(count):
                out.append(decode_value(buf, node["items"]))
    if kind == "map":
        out = {}
        while True:
            count = _read_long(buf)
            if count == 0:
                return out
            if count < 0:
                _read_long(buf)
                count = -count
            for _ in range(count):
                key = _read_bytes(buf).decode("utf-8")
                out[key] = decode_value(buf, node["values"])
    raise NotImplementedError(f"avro type {kind!r}")


# ---------------------------------------------------------------------------
# container files


def write_container(path: str, schema: dict, rows, codec: str = "deflate", sync_interval: int = 4000) -> None:
    """Write one Avro Object Container File.  `rows` are dicts keyed by
    the record field names (top-level schema must be a record)."""
    if codec not in CODECS:
        raise NotImplementedError(f"codec {codec!r} (supported: {CODECS})")
    schema_json = json.dumps(schema).encode("utf-8")
    # Deterministic per-file sync marker (content-derived; the spec only
    # requires 16 random-ish bytes unique within the file).
    import hashlib

    sync = hashlib.md5(schema_json + path.encode("utf-8")).digest()
    with open(path, "wb") as fh:
        header = io.BytesIO()
        header.write(MAGIC)
        _write_long(header, 2)
        _write_bytes(header, b"avro.schema")
        _write_bytes(header, schema_json)
        _write_bytes(header, b"avro.codec")
        _write_bytes(header, codec.encode())
        _write_long(header, 0)
        header.write(sync)
        fh.write(header.getvalue())

        block = io.BytesIO()
        count = 0

        def flush():
            nonlocal block, count
            if not count:
                return
            data = _compress_block(codec, block.getvalue())
            head = io.BytesIO()
            _write_long(head, count)
            _write_long(head, len(data))
            fh.write(head.getvalue())
            fh.write(data)
            fh.write(sync)
            block = io.BytesIO()
            count = 0

        for row in rows:
            encode_value(block, schema, row)
            count += 1
            if count >= sync_interval:
                flush()
        flush()


def read_container_bytes(data: bytes):
    """Decode one container file from bytes → (schema, list[dict])."""
    buf = io.BytesIO(data)
    if buf.read(4) != MAGIC:
        raise ValueError("not an Avro object container file")
    meta = {}
    while True:
        count = _read_long(buf)
        if count == 0:
            break
        if count < 0:
            _read_long(buf)
            count = -count
        for _ in range(count):
            key = _read_bytes(buf).decode("utf-8")
            meta[key] = _read_bytes(buf)
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode()
    if codec not in CODECS:
        raise NotImplementedError(f"codec {codec!r} (supported: {CODECS})")
    sync = buf.read(16)
    rows = []
    while True:
        probe = buf.read(1)
        if not probe:
            break
        buf.seek(-1, 1)
        count = _read_long(buf)
        size = _read_long(buf)
        payload = _decompress_block(codec, buf.read(size))
        pbuf = io.BytesIO(payload)
        for _ in range(count):
            rows.append(decode_value(pbuf, schema))
        if buf.read(16) != sync:
            raise ValueError("sync marker mismatch")
    return schema, rows


def read_container(path: str):
    with open(path, "rb") as fh:
        return read_container_bytes(fh.read())


def read_header(path: str):
    """Parse just the container header → (schema, codec, sync, header_len).

    Reads a 1 MiB prefix first (metadata is almost always tiny) and
    doubles the prefix on demand when a very large embedded schema
    overruns it, so an oversized header parses correctly instead of
    yielding a truncated sync marker and a confusing downstream error.
    Growth is capped at 64 MiB: past that the file is far more likely a
    corrupt header (every parse ValueError inside an incomplete prefix
    is retried as possible truncation) than a legitimately >64 MiB
    schema, and the retry loop must not read a multi-GB file into memory
    before surfacing the real error."""
    cap = 1 << 20
    max_cap = 64 << 20
    with open(path, "rb") as fh:
        while True:
            fh.seek(0)
            head = fh.read(cap)
            try:
                return _parse_header_bytes(head, complete=len(head) < cap)
            except _HeaderTruncated:
                if len(head) < cap:  # whole file read and still truncated
                    raise ValueError(f"truncated avro container header in {path}")
                if cap >= max_cap:
                    # surface the underlying parse failure instead of
                    # doubling forever on a corrupt header — naming the
                    # file and the cap (the bare re-parse can die inside
                    # _read_long with a cryptic unpack ValueError)
                    try:
                        return _parse_header_bytes(head, complete=True)
                    except ValueError as exc:
                        raise ValueError(
                            f"avro container header in {path} exceeds the "
                            f"{max_cap >> 20} MiB cap or is corrupt: {exc}"
                        ) from exc
                cap *= 2


class _HeaderTruncated(Exception):
    """Internal: the header extends past the bytes read so far."""


def _parse_header_bytes(head: bytes, complete: bool):
    buf = io.BytesIO(head)
    if buf.read(4) != MAGIC:
        raise ValueError("not an Avro object container file")
    try:
        meta = {}
        while True:
            count = _read_long(buf)
            if count == 0:
                break
            if count < 0:
                _read_long(buf)
                count = -count
            for _ in range(count):
                key = _read_bytes(buf).decode("utf-8")
                meta[key] = _read_bytes(buf)
                if not complete and buf.tell() >= len(head):
                    raise _HeaderTruncated()
    except ValueError:
        if not complete:
            raise _HeaderTruncated() from None
        raise
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode()
    sync = buf.read(16)
    if len(sync) < 16:
        if not complete:
            raise _HeaderTruncated()
        raise ValueError("truncated avro container header (short sync marker)")
    return schema, codec, sync, buf.tell()


def _read_long_at(mem, off: int):
    """Zigzag-varint long from a bytes-like at ``off`` → (value, new_off)."""
    shift = 0
    acc = 0
    while True:
        b = mem[off]
        off += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            return (acc >> 1) ^ -(acc & 1), off
        shift += 7


class _SplitWindow:
    """A sliding byte window over one file region for split decoding.

    Holds only [base, base+len(buf)) in memory; ``ensure`` extends the
    window forward in chunks and ``advance`` drops consumed bytes, so a
    split task's footprint is O(max block size + chunk), never O(file) —
    N split tasks over one multi-GB container must not each load the
    whole file."""

    CHUNK = 4 << 20

    def __init__(self, fh, base: int):
        self._fh = fh
        self.base = base
        self.buf = bytearray()
        self._eof = False
        fh.seek(base)

    def ensure(self, upto_abs: int) -> bool:
        """Grow the window so it covers absolute offset upto_abs (exclusive).
        Returns False if the file ends first."""
        need = upto_abs - self.base
        while len(self.buf) < need and not self._eof:
            chunk = self._fh.read(max(self.CHUNK, need - len(self.buf)))
            if not chunk:
                self._eof = True
                break
            self.buf += chunk
        return len(self.buf) >= need

    def advance(self, to_abs: int) -> None:
        """Drop window bytes before absolute offset to_abs."""
        drop = to_abs - self.base
        if drop > 0:
            del self.buf[:drop]
            self.base = to_abs

    def at_eof(self, abs_off: int) -> bool:
        return self._eof and abs_off - self.base >= len(self.buf)


def _find_sync_from(fh, sync: bytes, start: int, limit: int) -> int:
    """Absolute offset of the first ``sync`` occurrence starting in
    [start, limit), scanning the file in chunks (15-byte overlap so a
    marker straddling a chunk edge is still found); -1 if none."""
    fh.seek(start)
    base = start
    tail = b""
    chunk_size = 4 << 20
    while base - len(tail) < limit:
        chunk = fh.read(chunk_size)
        if not chunk:
            return -1
        hay = tail + chunk
        hit = hay.find(sync)
        if hit >= 0:
            pos = base - len(tail) + hit
            return pos if pos < limit else -1
        base += len(chunk)
        tail = hay[-(len(sync) - 1):]
    return -1


def _plausible_block_at(fh, sync: bytes, p: int, filesize: int) -> bool:
    """One-hop structural check that a SCANNED sync candidate at ``p`` is a
    real block boundary and not the marker bytes occurring inside block
    payload (the classic false-sync hazard of marker-scanned formats):
    the two varint longs after it must parse, and the implied block end
    must land exactly on another sync marker (or ``p`` is the file's
    trailing sync).  Vanilla Avro DataFileReader has no such check and
    mis-parses on a payload collision; here a rejected candidate just
    resumes the scan.  A fully valid fake block adversarially nested
    inside a payload can still fool the one-hop check — the same
    residual exposure as Avro itself."""
    if p + 16 == filesize:
        return True  # the file's trailing sync — owns no block
    fh.seek(p + 16)
    head = fh.read(20)  # two varint longs are ≤20 bytes
    try:
        count, off = _read_long_at(head, 0)
        size, off = _read_long_at(head, off)
    except IndexError:
        return False
    if count < 0 or size < 0:
        return False
    nxt = p + 16 + off + size
    if nxt + 16 > filesize:
        return False
    fh.seek(nxt)
    return fh.read(16) == sync


def read_container_split(path: str, start: int, end: int):
    """Decode the blocks of ONE input split of a container file — the
    reference's splittable-read protocol (ref: flink-formats/flink-avro/
    AvroInputFormat.java, which delegates to Avro's DataFileReader
    sync/pastSync): a split [start, end) owns exactly the blocks whose
    preceding sync marker begins at a byte offset in [start, end).
    Every block belongs to exactly one split, so a union over
    non-overlapping splits covering [0, file_size) yields each row
    exactly once.

    Ownership rule (Avro's DataFileReader sync/pastSync semantics): a
    block belongs to the split [start, end) within which its PRECEDING
    sync marker begins — the header's trailing sync for the first
    block, the previous block's trailing sync otherwise.  Sync starts
    partition the file, so each block lands in exactly one split even
    when a marker straddles a split boundary.

    I/O shape: seeks to the split, streams forward in 4 MiB chunks, and
    drops consumed bytes as it goes — memory is O(largest block), not
    O(file), and a task never touches bytes before its first owned sync
    (the last owned block may extend past ``end``; the window follows it
    on demand, exactly Avro's past-sync overread).

    Sync markers are located by byte scan; a 16-byte marker colliding
    with block payload is possible (probability ~2^-128 per position for
    random markers, but trivially constructible against a known marker).
    Scanned candidates are therefore structurally validated
    (`_plausible_block_at`) and false hits skipped — stronger than
    vanilla Avro, which mis-parses on a payload collision.  Syncs
    reached by exact block-length arithmetic are authoritative, so a
    genuinely corrupt block still fails loudly mid-split."""
    schema, codec, sync, header_len = read_header(path)
    if codec not in CODECS:
        raise NotImplementedError(f"codec {codec!r} (supported: {CODECS})")
    rows = []
    with open(path, "rb") as fh:
        fh.seek(0, 2)
        filesize = fh.tell()
        if start <= header_len - 16:
            s = header_len - 16  # the header's trailing sync, known exactly
        else:
            # Scanned candidates are heuristic: validate each structurally
            # and resume the scan past payload-collision false positives.
            s = _find_sync_from(fh, sync, start, end)
            while s >= 0 and not _plausible_block_at(fh, sync, s, filesize):
                s = _find_sync_from(fh, sync, s + 1, end)
            if s < 0:
                return schema, []
        if s >= end:
            return schema, []
        win = _SplitWindow(fh, s)
        while start <= s < end:
            pos = s + 16  # block header (count varint) after the sync
            # best-effort prefetch: two varint longs are ≤20 bytes
            win.ensure(pos + 20)
            if win.at_eof(pos):
                break  # file ends exactly at this trailing sync
            try:
                count, off = _read_long_at(win.buf, pos - win.base)
                size, off = _read_long_at(win.buf, off)
            except IndexError:
                raise ValueError(
                    f"truncated block header at offset {pos} in {path}"
                ) from None
            payload_abs = win.base + off
            if not win.ensure(payload_abs + size):
                raise ValueError(f"truncated block at offset {pos} in {path}")
            lo = payload_abs - win.base
            payload = _decompress_block(codec, bytes(win.buf[lo : lo + size]))
            pbuf = io.BytesIO(payload)
            for _ in range(count):
                rows.append(decode_value(pbuf, schema))
            s = payload_abs + size  # next sync trails this block
            if not win.ensure(s + 16) or bytes(win.buf[s - win.base : s - win.base + 16]) != sync:
                raise ValueError(f"sync marker mismatch after block at {s}")
            win.advance(s)
    return schema, rows


# ---------------------------------------------------------------------------
# Spark <-> Avro schema mapping


def spark_to_avro_schema(spark_schema, name: str = "topLevelRecord") -> dict:
    from pyspark.sql import types as T

    def conv(dt, nullable, path):
        if isinstance(dt, T.BooleanType):
            base = "boolean"
        elif isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType)):
            base = "int"
        elif isinstance(dt, T.LongType):
            base = "long"
        elif isinstance(dt, T.FloatType):
            base = "float"
        elif isinstance(dt, T.DoubleType):
            base = "double"
        elif isinstance(dt, T.StringType):
            base = "string"
        elif isinstance(dt, T.BinaryType):
            base = "bytes"
        elif isinstance(dt, T.DateType):
            base = {"type": "int", "logicalType": "date"}
        elif isinstance(dt, T.TimestampType):
            base = {"type": "long", "logicalType": "timestamp-micros"}
        elif isinstance(dt, T.ArrayType):
            base = {"type": "array", "items": conv(dt.elementType, dt.containsNull, path + "_item")}
        elif isinstance(dt, T.MapType):
            if not isinstance(dt.keyType, T.StringType):
                raise NotImplementedError("avro maps require string keys")
            base = {"type": "map", "values": conv(dt.valueType, dt.valueContainsNull, path + "_value")}
        elif isinstance(dt, T.StructType):
            base = {
                "type": "record",
                "name": path,
                "fields": [
                    {"name": f.name, "type": conv(f.dataType, f.nullable, path + "_" + f.name)}
                    for f in dt.fields
                ],
            }
        else:
            raise NotImplementedError(f"spark type {dt} has no avro mapping here")
        return ["null", base] if nullable else base

    inner = conv(spark_schema, False, name)
    return inner


def avro_to_spark_schema(schema):
    from pyspark.sql import types as T

    def conv(node):
        kind, node = _resolve(node)
        if kind == "union":
            branches = [b for b in node if _resolve(b)[0] != "null"]
            if len(branches) != 1:
                raise NotImplementedError("only unions with null are supported")
            dt, _ = conv(branches[0])
            return dt, True
        simple = {
            "boolean": T.BooleanType(),
            "int": T.IntegerType(),
            "long": T.LongType(),
            "float": T.FloatType(),
            "double": T.DoubleType(),
            "string": T.StringType(),
            "bytes": T.BinaryType(),
        }
        if isinstance(node, dict) and node.get("logicalType") == "date":
            return T.DateType(), False
        if isinstance(node, dict) and node.get("logicalType") in ("timestamp-millis", "timestamp-micros"):
            return T.TimestampType(), False
        if kind in simple:
            return simple[kind], False
        if kind == "fixed":
            return T.BinaryType(), False
        if kind == "enum":
            return T.StringType(), False
        if kind == "array":
            dt, contains_null = conv(node["items"])
            return T.ArrayType(dt, contains_null), False
        if kind == "map":
            dt, contains_null = conv(node["values"])
            return T.MapType(T.StringType(), dt, contains_null), False
        if kind == "record":
            return (
                T.StructType(
                    [T.StructField(f["name"], *_flip(conv(f["type"]))) for f in node["fields"]]
                ),
                False,
            )
        raise NotImplementedError(f"avro type {kind!r}")

    def _flip(pair):
        return pair[0], pair[1]

    dt, _ = conv(schema)
    from pyspark.sql import types as T2

    if not isinstance(dt, T2.StructType):
        raise ValueError("top-level avro schema must be a record")
    return dt
