"""Jar-free Kafka wire-protocol client for group-offset resolution.

The reference's ``group-offsets`` startup mode resumes each partition
from the offset the consumer group last committed (ref:
flink-connectors/flink-connector-kafka-base/src/main/java/org/apache/
flink/streaming/connectors/kafka/FlinkKafkaConsumerBase.java,
STARTUP_MODE_GROUP_OFFSETS; fallback for uncommitted partitions is the
consumer's ``auto.offset.reset``).  Spark's ``format("kafka")`` source
never reads group commits — but it accepts an explicit per-partition
``startingOffsets`` JSON, so this module fetches the committed offsets
over the public Kafka binary protocol (no kafka-clients jar, plain TCP)
and hands them to the source as that JSON.

Protocol messages used (all public, https://kafka.apache.org/protocol):

- Metadata (api_key 3, v1)        — partition list per topic
- FindCoordinator (api_key 10, v0)— locate the group coordinator
- OffsetFetch (api_key 9, v1)     — committed offsets (Kafka storage)

Same jar-free-public-protocol discipline as the Cassandra CQL v4 sink
(`cassandra_cql.py`) and the Kinesis/Elasticsearch HTTP shims.
"""

from __future__ import annotations

import socket
import struct

CLIENT_ID = "my-flink-spark-offset-fetch"

API_METADATA = 3
API_OFFSET_FETCH = 9
API_FIND_COORDINATOR = 10

# Kafka special offsets (per protocol spec): -1 = no committed offset.
NO_COMMITTED_OFFSET = -1
# Spark startingOffsets JSON special values.
SPARK_EARLIEST = -2
SPARK_LATEST = -1


# -- primitive codecs --------------------------------------------------------


def _enc_str(s: str | None) -> bytes:
    if s is None:
        return struct.pack(">h", -1)
    b = s.encode()
    return struct.pack(">h", len(b)) + b


class _Reader:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def take(self, n: int) -> bytes:
        b = self.buf[self.pos : self.pos + n]
        if len(b) != n:
            raise ValueError("truncated Kafka protocol response")
        self.pos += n
        return b

    def i8(self) -> int:
        return struct.unpack(">b", self.take(1))[0]

    def i16(self) -> int:
        return struct.unpack(">h", self.take(2))[0]

    def i32(self) -> int:
        return struct.unpack(">i", self.take(4))[0]

    def i64(self) -> int:
        return struct.unpack(">q", self.take(8))[0]

    def string(self) -> str | None:
        n = self.i16()
        if n == -1:
            return None
        return self.take(n).decode()


# -- request framing ----------------------------------------------------------


def _request(api_key: int, api_version: int, correlation_id: int, body: bytes) -> bytes:
    header = (
        struct.pack(">hhi", api_key, api_version, correlation_id)
        + _enc_str(CLIENT_ID)
    )
    payload = header + body
    return struct.pack(">i", len(payload)) + payload


def _read_frame(sock) -> bytes:
    size_buf = b""
    while len(size_buf) < 4:
        chunk = sock.recv(4 - len(size_buf))
        if not chunk:
            raise ConnectionError("Kafka broker closed connection mid-frame")
        size_buf += chunk
    (size,) = struct.unpack(">i", size_buf)
    body = b""
    while len(body) < size:
        chunk = sock.recv(size - len(body))
        if not chunk:
            raise ConnectionError("Kafka broker closed connection mid-frame")
        body += chunk
    return body


def _roundtrip(host: str, port: int, frames: list[bytes], timeout: float) -> list[bytes]:
    """Send request frames on one connection; return response bodies
    (correlation id stripped after being checked against send order)."""
    out: list[bytes] = []
    with socket.create_connection((host, port), timeout=timeout) as sock:
        for i, frame in enumerate(frames):
            sock.sendall(frame)
            body = _read_frame(sock)
            r = _Reader(body)
            corr = r.i32()
            if corr != i:
                raise ValueError(
                    f"Kafka correlation id mismatch: sent {i}, got {corr}"
                )
            out.append(body[r.pos :])
    return out


def _call(host: str, port: int, api_key: int, api_version: int, body: bytes,
          timeout: float) -> bytes:
    return _roundtrip(
        host, port, [_request(api_key, api_version, 0, body)], timeout
    )[0]


# -- protocol messages --------------------------------------------------------


def _metadata_partitions(
    host: str, port: int, topics: list[str], timeout: float
) -> dict[str, list[int]]:
    """Metadata v1 → {topic: sorted partition ids}."""
    body = struct.pack(">i", len(topics)) + b"".join(_enc_str(t) for t in topics)
    r = _Reader(_call(host, port, API_METADATA, 1, body, timeout))
    n_brokers = r.i32()
    for _ in range(n_brokers):
        r.i32()  # node_id
        r.string()  # host
        r.i32()  # port
        r.string()  # rack (nullable, v1)
    r.i32()  # controller_id
    out: dict[str, list[int]] = {}
    n_topics = r.i32()
    for _ in range(n_topics):
        t_err = r.i16()
        name = r.string() or ""
        r.i8()  # is_internal
        n_parts = r.i32()
        parts: list[int] = []
        for _ in range(n_parts):
            r.i16()  # partition error_code
            parts.append(r.i32())
            r.i32()  # leader
            for _ in range(r.i32()):  # replicas
                r.i32()
            for _ in range(r.i32()):  # isr
                r.i32()
        if t_err:
            raise RuntimeError(
                f"Kafka Metadata error {t_err} for topic {name!r} "
                "(3=UNKNOWN_TOPIC_OR_PARTITION)"
            )
        out[name] = sorted(parts)
    missing = set(topics) - set(out)
    if missing:
        raise RuntimeError(f"Kafka Metadata returned no data for {sorted(missing)}")
    return out


def _find_coordinator(
    host: str, port: int, group_id: str, timeout: float
) -> tuple[str, int]:
    """FindCoordinator v0 → (coordinator host, port)."""
    r = _Reader(
        _call(host, port, API_FIND_COORDINATOR, 0, _enc_str(group_id), timeout)
    )
    err = r.i16()
    if err:
        raise RuntimeError(
            f"Kafka FindCoordinator error {err} for group {group_id!r} "
            "(15=COORDINATOR_NOT_AVAILABLE)"
        )
    r.i32()  # node_id
    c_host = r.string() or ""
    c_port = r.i32()
    return c_host, c_port


def _offset_fetch(
    host: str,
    port: int,
    group_id: str,
    partitions: dict[str, list[int]],
    timeout: float,
) -> dict[str, dict[int, int]]:
    """OffsetFetch v1 (Kafka-stored commits) → {topic: {partition: offset}}
    with -1 for partitions the group never committed."""
    body = _enc_str(group_id) + struct.pack(">i", len(partitions))
    for topic, parts in partitions.items():
        body += _enc_str(topic) + struct.pack(">i", len(parts))
        body += b"".join(struct.pack(">i", p) for p in parts)
    r = _Reader(_call(host, port, API_OFFSET_FETCH, 1, body, timeout))
    out: dict[str, dict[int, int]] = {}
    for _ in range(r.i32()):
        topic = r.string() or ""
        per: dict[int, int] = {}
        for _ in range(r.i32()):
            part = r.i32()
            offset = r.i64()
            r.string()  # metadata
            err = r.i16()
            if err:
                raise RuntimeError(
                    f"Kafka OffsetFetch error {err} on {topic}-{part} "
                    "(16=NOT_COORDINATOR, 22=ILLEGAL_GENERATION)"
                )
            per[part] = offset
        out[topic] = per
    return out


# -- public entry -------------------------------------------------------------


def _parse_bootstrap(bootstrap_servers: str) -> list[tuple[str, int]]:
    out = []
    for entry in filter(None, (e.strip() for e in bootstrap_servers.split(","))):
        host, _, port = entry.rpartition(":")
        if not host:
            raise ValueError(f"malformed bootstrap server {entry!r} (need host:port)")
        out.append((host, int(port)))
    return out


def fetch_group_offsets(
    bootstrap_servers: str,
    group_id: str,
    topics: list[str],
    *,
    fallback: str = "latest",
    timeout: float = 30.0,
) -> dict[str, dict[str, int]]:
    """Resolve a consumer group's committed offsets into the exact
    per-partition mapping Spark's ``startingOffsets`` JSON expects.

    Mirrors the reference's group-offsets startup
    (FlinkKafkaConsumerBase.java STARTUP_MODE_GROUP_OFFSETS): committed
    offsets pass through verbatim (a Kafka commit is "next record to
    read", which is exactly Spark's inclusive starting offset); partitions
    the group never committed fall back to ``fallback`` — the analog of
    the consumer's ``auto.offset.reset`` — encoded as Spark's special
    values (-2 earliest / -1 latest).  ``fallback='none'`` raises, like a
    Kafka consumer with ``auto.offset.reset=none``.

    Spark requires the JSON to cover EVERY partition of every subscribed
    topic, so the partition list comes from a Metadata request first.
    """
    if fallback not in ("earliest", "latest", "none"):
        raise ValueError(f"unknown fallback {fallback!r} (auto.offset.reset values)")
    last_err: Exception | None = None
    for host, port in _parse_bootstrap(bootstrap_servers):
        try:
            parts = _metadata_partitions(host, port, topics, timeout)
            c_host, c_port = _find_coordinator(host, port, group_id, timeout)
            committed = _offset_fetch(c_host, c_port, group_id, parts, timeout)
            break
        except (OSError, ConnectionError) as exc:  # try the next bootstrap node
            last_err = exc
    else:
        raise ConnectionError(
            f"no bootstrap server reachable in {bootstrap_servers!r}: {last_err}"
        )
    fb = SPARK_EARLIEST if fallback == "earliest" else SPARK_LATEST
    out: dict[str, dict[str, int]] = {}
    for topic, partitions in parts.items():
        per: dict[str, int] = {}
        for p in partitions:
            off = committed.get(topic, {}).get(p, NO_COMMITTED_OFFSET)
            if off == NO_COMMITTED_OFFSET:
                if fallback == "none":
                    raise RuntimeError(
                        f"group {group_id!r} has no committed offset for "
                        f"{topic}-{p} and auto.offset.reset=none"
                    )
                off = fb
            per[str(p)] = off
        out[topic] = per
    return out


# -- read_committed Fetch (transaction-outcome probe) --------------------------
#
# The exactly-once sink resolves "did transaction X commit?" after a
# crash by scanning its small tracking topic at read_committed — the
# jar-free counterpart of the reference's resumeTransaction recovery
# (ref: flink-connectors/flink-connector-kafka/src/main/java/org/apache/
# flink/streaming/connectors/kafka/FlinkKafkaProducer.java, resume/
# recoverAndCommit).  Fetch v4 (api_key 1) with isolation_level=1
# returns the last stable offset plus the aborted-transaction index;
# client-side filtering follows the protocol spec: skip records of
# aborted producer ids until their ABORT control marker, skip control
# batches, stop at the LSO.

API_FETCH = 1

_CTRL_ABORT = 0
_CTRL_COMMIT = 1


def _uvarint(buf: bytes, pos: int) -> tuple[int, int]:
    """Unsigned varint → (value, new_pos)."""
    shift = 0
    out = 0
    while True:
        b = buf[pos]
        pos += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, pos
        shift += 7
        if shift > 63:
            raise ValueError("varint too long in Kafka record")


def _varint(buf: bytes, pos: int) -> tuple[int, int]:
    """Zigzag-encoded signed varint → (value, new_pos)."""
    u, pos = _uvarint(buf, pos)
    return (u >> 1) ^ -(u & 1), pos


def _parse_records_v2(batch_body: bytes, n_records: int) -> list[tuple[int, bytes | None, bytes | None]]:
    """Uncompressed RecordBatch v2 record section →
    [(offset_delta, key, value)]."""
    out = []
    pos = 0
    for _ in range(n_records):
        rec_len, pos = _varint(batch_body, pos)
        end = pos + rec_len
        pos += 1  # record attributes (unused)
        _, pos = _varint(batch_body, pos)  # timestamp delta
        offset_delta, pos = _varint(batch_body, pos)
        klen, pos = _varint(batch_body, pos)
        key = None
        if klen >= 0:
            key = batch_body[pos : pos + klen]
            pos += klen
        vlen, pos = _varint(batch_body, pos)
        value = None
        if vlen >= 0:
            value = batch_body[pos : pos + vlen]
            pos += vlen
        out.append((offset_delta, key, value))
        pos = end  # headers skipped
    return out


class _Batch:
    __slots__ = ("base_offset", "producer_id", "transactional", "control", "records")

    def __init__(self, base_offset, producer_id, transactional, control, records):
        self.base_offset = base_offset
        self.producer_id = producer_id
        self.transactional = transactional
        self.control = control
        self.records = records


def _parse_batches(record_set: bytes) -> list[_Batch]:
    """RecordBatch v2 stream → [_Batch].  A trailing partial batch (the
    broker may truncate at max_bytes) is dropped, matching client
    behavior."""
    out: list[_Batch] = []
    pos = 0
    while pos + 12 <= len(record_set):
        (base_offset,) = struct.unpack(">q", record_set[pos : pos + 8])
        (batch_len,) = struct.unpack(">i", record_set[pos + 8 : pos + 12])
        end = pos + 12 + batch_len
        if end > len(record_set):
            break  # truncated trailing batch
        body = record_set[pos + 12 : end]
        magic = body[4]
        if magic != 2:
            raise RuntimeError(
                f"unsupported Kafka record batch magic {magic} "
                "(the probe speaks RecordBatch v2 only)"
            )
        (attributes,) = struct.unpack(">h", body[9:11])
        codec = attributes & 0x07
        if codec:
            raise RuntimeError(
                "compressed record batches are not supported by the "
                "jar-free read_committed probe — produce the tracking "
                "topic uncompressed"
            )
        transactional = bool(attributes & 0x10)
        control = bool(attributes & 0x20)
        # layout after batchLength: epoch[0:4] magic[4] crc[5:9]
        # attrs[9:11] lastOffsetDelta[11:15] firstTs[15:23] maxTs[23:31]
        # producerId[31:39] producerEpoch[39:41] baseSeq[41:45] count[45:49]
        (producer_id,) = struct.unpack(">q", body[31:39])
        (n_records,) = struct.unpack(">i", body[45:49])
        records = _parse_records_v2(body[49:], n_records)
        out.append(_Batch(base_offset, producer_id, transactional, control, records))
        pos = end
    return out


def _fetch_partition(
    host: str, port: int, topic: str, partition: int, fetch_offset: int,
    timeout: float, max_bytes: int = 4 << 20,
) -> tuple[int, list[tuple[int, int]], bytes]:
    """Fetch v4, isolation_level=1 (read_committed) for one partition →
    (last_stable_offset, aborted [(producer_id, first_offset)], record_set)."""
    body = struct.pack(">iiii", -1, 500, 1, max_bytes)  # replica, wait, min, max
    body += struct.pack(">b", 1)  # isolation_level = read_committed
    body += struct.pack(">i", 1) + _enc_str(topic)
    body += struct.pack(">i", 1)
    body += struct.pack(">iqi", partition, fetch_offset, max_bytes)
    r = _Reader(_call(host, port, API_FETCH, 4, body, timeout))
    r.i32()  # throttle_time_ms
    n_topics = r.i32()
    if n_topics != 1:
        raise RuntimeError(f"Kafka Fetch returned {n_topics} topics, expected 1")
    r.string()  # topic
    n_parts = r.i32()
    if n_parts != 1:
        raise RuntimeError(f"Kafka Fetch returned {n_parts} partitions, expected 1")
    r.i32()  # partition
    err = r.i16()
    if err:
        raise RuntimeError(
            f"Kafka Fetch error {err} on {topic}-{partition} "
            "(1=OFFSET_OUT_OF_RANGE, 3=UNKNOWN_TOPIC_OR_PARTITION)"
        )
    r.i64()  # high watermark
    lso = r.i64()
    n_aborted = r.i32()
    aborted = []
    for _ in range(max(n_aborted, 0)):
        aborted.append((r.i64(), r.i64()))
    set_len = r.i32()
    record_set = r.take(set_len) if set_len > 0 else b""
    return lso, aborted, record_set


def read_committed_records(
    bootstrap_servers: str,
    topic: str,
    *,
    timeout: float = 30.0,
) -> list[tuple[bytes | None, bytes | None]]:
    """Every COMMITTED (key, value) in ``topic`` from the beginning, at
    read_committed isolation: aborted transactions' records and control
    markers are filtered client-side per the protocol's
    aborted-transaction index, and consumption stops at each partition's
    last stable offset.  Intended for SMALL topics (the exactly-once
    sink's tracking topic); it reads the whole log."""
    last_err: Exception | None = None
    for host, port in _parse_bootstrap(bootstrap_servers):
        try:
            parts = _metadata_partitions(host, port, [topic], timeout)
            break
        except (OSError, ConnectionError) as exc:
            last_err = exc
    else:
        raise ConnectionError(
            f"no bootstrap server reachable in {bootstrap_servers!r}: {last_err}"
        )
    out: list[tuple[bytes | None, bytes | None]] = []
    for partition in parts[topic]:
        fetch_offset = 0
        aborted_pids: set[int] = set()
        # Dedup by (producer_id, first_offset): the broker may return a
        # SPANNING aborted-txn entry again on a later fetch round, and a
        # sorted list with a persistent consumed cursor would sort the
        # duplicate into the already-consumed prefix and skip it —
        # leaking an aborted transaction's records into committed output.
        seen_aborted: set[tuple[int, int]] = set()
        inactive: list[tuple[int, int]] = []  # (first_offset, producer_id)
        while True:
            before = fetch_offset
            lso, aborted, record_set = _fetch_partition(
                host, port, topic, partition, fetch_offset, timeout
            )
            for prod_id, first_off in aborted:
                if (prod_id, first_off) not in seen_aborted:
                    seen_aborted.add((prod_id, first_off))
                    inactive.append((first_off, prod_id))
            batches = _parse_batches(record_set)
            if not batches:
                break
            for b in batches:
                if inactive:
                    still_inactive = []
                    for first_off, prod_id in inactive:
                        if first_off <= b.base_offset:
                            aborted_pids.add(prod_id)
                        else:
                            still_inactive.append((first_off, prod_id))
                    inactive = still_inactive
                if b.control:
                    # one marker record per control batch; key = version+type
                    for _, key, _v in b.records:
                        if key is not None and len(key) >= 4:
                            (_ver, ctype) = struct.unpack(">hh", key[:4])
                            if ctype == _CTRL_ABORT:
                                aborted_pids.discard(b.producer_id)
                elif not (b.transactional and b.producer_id in aborted_pids):
                    for delta, key, value in b.records:
                        if b.base_offset + delta < lso:
                            out.append((key, value))
                fetch_offset = max(
                    fetch_offset,
                    b.base_offset + max((d for d, _, _ in b.records), default=0) + 1,
                )
            if fetch_offset >= lso or fetch_offset == before:
                break
    return out


def read_committed_keys(
    bootstrap_servers: str, topic: str, *, timeout: float = 30.0
) -> set[str]:
    """Committed record KEYS of ``topic`` (utf-8) — the exactly-once
    sink's transaction-outcome resolution set."""
    return {
        k.decode()
        for k, _ in read_committed_records(bootstrap_servers, topic, timeout=timeout)
        if k is not None
    }
