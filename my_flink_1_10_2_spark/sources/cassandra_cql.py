"""Cassandra sink speaking the CQL native protocol v4 — the jar-free
functional path (ref: flink-connectors/flink-connector-cassandra/.../
CassandraSink.java, CassandraRowWriteAheadSink.java, CassandraPojoSink
upsert semantics).

The wire format is the PUBLIC Apache Cassandra spec
(``doc/native_protocol_v4.spec`` in the Cassandra source tree): a 9-byte
frame header (version, flags, stream, opcode, length) followed by a
typed body.  This module implements the minimal client subset a sink
needs — STARTUP/READY handshake, SASL-PLAIN AUTH_RESPONSE, and UNLOGGED
BATCHes of INSERT statements with inline CQL literals — nothing else.

Delivery contract: INSERTs are primary-key upserts, so replayed
micro-batches converge (at-least-once, exactly the reference sink's
non-WAL mode; the WAL exactly-once mode is gated loudly in
``connectors.cassandra_sink_options``).

Scale shape: one connection per PARTITION (not per row), statements
batched ``batch_max_statements`` per frame; the driver never sees the
data.  At 1000 executors this is the same fan-out discipline as the
reference's per-subtask session.
"""

from __future__ import annotations

import struct

from pyspark.sql import DataFrame

# opcodes (native_protocol_v4.spec §2.4)
OP_ERROR = 0x00
OP_STARTUP = 0x01
OP_READY = 0x02
OP_AUTHENTICATE = 0x03
OP_QUERY = 0x07
OP_RESULT = 0x08
OP_BATCH = 0x0D
OP_AUTH_RESPONSE = 0x0F
OP_AUTH_SUCCESS = 0x10

# error codes (native_protocol_v4.spec §9)
ERR_WRITE_TIMEOUT = 0x1100

CONSISTENCY = {
    "ANY": 0x0000,
    "ONE": 0x0001,
    "TWO": 0x0002,
    "THREE": 0x0003,
    "QUORUM": 0x0004,
    "ALL": 0x0005,
    "LOCAL_QUORUM": 0x0006,
    "EACH_QUORUM": 0x0007,
    "LOCAL_ONE": 0x000A,
}


def _string(s: str) -> bytes:
    b = s.encode()
    return struct.pack(">H", len(b)) + b


def _long_string(s: str) -> bytes:
    b = s.encode()
    return struct.pack(">i", len(b)) + b


def _string_map(d: dict[str, str]) -> bytes:
    out = struct.pack(">H", len(d))
    for k, v in d.items():
        out += _string(k) + _string(v)
    return out


def frame(opcode: int, body: bytes, stream: int = 0) -> bytes:
    """A v4 REQUEST frame: version 0x04, flags 0, int16 stream id."""
    return struct.pack(">BBhBi", 0x04, 0x00, stream, opcode, len(body)) + body


def read_frame(sock) -> tuple[int, bytes]:
    """Read one RESPONSE frame → (opcode, body).  Blocking, exact."""
    header = b""
    while len(header) < 9:
        chunk = sock.recv(9 - len(header))
        if not chunk:
            raise ConnectionError("cassandra connection closed mid-frame")
        header += chunk
    _ver, _flags, _stream, opcode, length = struct.unpack(">BBhBi", header)
    body = b""
    while len(body) < length:
        chunk = sock.recv(length - len(body))
        if not chunk:
            raise ConnectionError("cassandra connection closed mid-body")
        body += chunk
    return opcode, body


def _error_text(body: bytes) -> str:
    (code,) = struct.unpack(">i", body[:4])
    (n,) = struct.unpack(">H", body[4:6])
    return f"code=0x{code:04x} {body[6 : 6 + n].decode(errors='replace')}"


def cql_literal(v) -> str:
    """Inline CQL literal for a Python value — strings quote-escaped,
    bytes as blob hex, timestamps as epoch-millis BIGINTs (the CQL
    timestamp literal form), lists recursively.  Floats use repr()
    (shortest round-trip, value-exact)."""
    import datetime as _dt

    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        # CQL's non-finite keywords are Infinity/-Infinity/NaN; Python's
        # repr emits 'inf'/'-inf' which the server rejects.
        import math as _math

        if _math.isinf(v):
            return "Infinity" if v > 0 else "-Infinity"
        if _math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, int):
        return repr(v)
    if isinstance(v, (bytes, bytearray)):
        return "0x" + bytes(v).hex()
    if isinstance(v, _dt.datetime):
        # Aware values must be measured against the UTC epoch — anchoring
        # the epoch at the value's own zone shifts the millis by that
        # zone's 1970 offset.  Naive values are treated as UTC.
        if v.tzinfo is not None:
            return str(int(v.timestamp() * 1000))
        epoch = _dt.datetime(1970, 1, 1)
        return str(int((v - epoch).total_seconds() * 1000))
    if isinstance(v, _dt.date):
        return f"'{v.isoformat()}'"
    if isinstance(v, (list, tuple)):
        return "[" + ", ".join(cql_literal(x) for x in v) + "]"
    if isinstance(v, dict):
        return (
            "{"
            + ", ".join(f"{cql_literal(k)}: {cql_literal(x)}" for k, x in v.items())
            + "}"
        )
    return "'" + str(v).replace("'", "''") + "'"


def _tcp_connect(host: str, port: int):
    import socket

    return socket.create_connection((host, port), timeout=30)


class CassandraCqlSink:
    """foreachBatch sink writing INSERT upserts over CQL native v4.

    ``connect_factory(host, port) -> socket-like`` is injectable (tests
    run an in-process protocol server; production uses a TCP socket).
    ``username``/``password`` drive the SASL-PLAIN exchange when the
    server responds AUTHENTICATE; without credentials that response
    fails loudly.
    """

    def __init__(
        self,
        host: str,
        keyspace: str,
        table: str,
        *,
        port: int = 9042,
        username: str | None = None,
        password: str | None = None,
        consistency: str = "ONE",
        batch_max_statements: int = 64,
        connect_factory=None,
        max_retries: int = 0,
        retry_delay_s: float = 0.1,
    ):
        if not host:
            raise ValueError("a Cassandra contact host is required")
        if consistency not in CONSISTENCY:
            raise ValueError(
                f"unknown consistency {consistency!r}; one of {tuple(CONSISTENCY)}"
            )
        if (username is None) != (password is None):
            raise ValueError("credentials need both username and password")
        self.host = host
        self.port = port
        self.keyspace = keyspace
        self.table = table
        self.username = username
        self.password = password
        self.consistency = CONSISTENCY[consistency]
        self.batch_max_statements = batch_max_statements
        self.connect_factory = connect_factory or _tcp_connect
        self.max_retries = max_retries
        self.retry_delay_s = retry_delay_s

    # -- protocol steps -----------------------------------------------------

    def _handshake(self, sock) -> None:
        sock.sendall(frame(OP_STARTUP, _string_map({"CQL_VERSION": "3.0.0"})))
        opcode, body = read_frame(sock)
        if opcode == OP_AUTHENTICATE:
            if self.username is None:
                raise RuntimeError(
                    "cassandra requires authentication "
                    f"({_string_body(body)}) but no credentials were given"
                )
            token = b"\x00" + self.username.encode() + b"\x00" + self.password.encode()
            sock.sendall(
                frame(OP_AUTH_RESPONSE, struct.pack(">i", len(token)) + token)
            )
            opcode, body = read_frame(sock)
            if opcode != OP_AUTH_SUCCESS:
                raise RuntimeError(
                    "cassandra authentication failed: "
                    + (_error_text(body) if opcode == OP_ERROR else hex(opcode))
                )
        elif opcode != OP_READY:
            raise RuntimeError(
                "cassandra STARTUP rejected: "
                + (_error_text(body) if opcode == OP_ERROR else hex(opcode))
            )

    def _send_batch(self, sock, statements: list[str]) -> None:
        """Send one UNLOGGED batch; on WriteTimeout, resend the SAME
        batch up to ``max_retries`` times.  Whole-batch retry is correct
        here because every statement is a primary-key upsert (idempotent)
        — the exact condition under which the public DataStax
        DefaultRetryPolicy#onWriteTimeout retries; re-applying a
        statement that already landed converges to the same row.
        Non-timeout errors stay fatal (they are not transient)."""
        import time as _time

        body = struct.pack(">BH", 0x01, len(statements))  # UNLOGGED batch
        for stmt in statements:
            body += b"\x00" + _long_string(stmt) + struct.pack(">H", 0)
        body += struct.pack(">HB", self.consistency, 0x00)
        attempt = 0
        while True:
            sock.sendall(frame(OP_BATCH, body))
            opcode, rbody = read_frame(sock)
            if opcode == OP_RESULT:
                return
            code = struct.unpack(">i", rbody[:4])[0] if opcode == OP_ERROR else None
            if code == ERR_WRITE_TIMEOUT and attempt < self.max_retries:
                attempt += 1
                _time.sleep(self.retry_delay_s)
                continue
            raise RuntimeError(
                "cassandra BATCH failed: "
                + (_error_text(rbody) if opcode == OP_ERROR else hex(opcode))
            )

    def _insert_cql(self, doc: dict) -> str:
        cols = ", ".join(doc)
        vals = ", ".join(cql_literal(v) for v in doc.values())
        return (
            f"INSERT INTO {self.keyspace}.{self.table} ({cols}) VALUES ({vals})"
        )

    # -- spark glue ---------------------------------------------------------

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        sink = self

        def send_partition(rows):
            rows = iter(rows)
            try:
                first = next(rows)
            except StopIteration:
                return  # empty partition: no connection at all
            import itertools

            sock = sink.connect_factory(sink.host, sink.port)
            try:
                sink._handshake(sock)
                buf: list[str] = []
                for row in itertools.chain([first], rows):
                    buf.append(sink._insert_cql(row.asDict(recursive=True)))
                    if len(buf) >= sink.batch_max_statements:
                        sink._send_batch(sock, buf)
                        buf = []
                if buf:
                    sink._send_batch(sock, buf)
            finally:
                sock.close()

        batch_df.foreachPartition(send_partition)


def _string_body(body: bytes) -> str:
    (n,) = struct.unpack(">H", body[:2])
    return body[2 : 2 + n].decode(errors="replace")


def cassandra_cql_sink(df: DataFrame, checkpoint: str, **kwargs):
    """Streaming writer using :class:`CassandraCqlSink` — the functional,
    jar-free Cassandra path (`connectors.cassandra_sink_options` keeps
    the spark-cassandra-connector jar path for clusters that ship it)."""
    sink = CassandraCqlSink(**kwargs)
    return df.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint
    )


# -- in-process emulator -------------------------------------------------------


class InMemoryCqlServer:
    """In-process CQL native-protocol v4 server emulator (write path):
    READY handshake + UNLOGGED BATCH decoding into the statement strings
    the executors sent over the live socket.  Development/testing
    utility (the InMemoryHBaseRestServer precedent): lets the sink be
    oracle-graded over a REAL TCP transport without a Cassandra
    install."""

    def __init__(self, fail_each_batch_once: bool = False):
        import socket as _socket
        import threading as _threading

        self.statements: list[str] = []
        #: upsert view — last-writer-wins per (table, first-column literal),
        #: the Cassandra primary-key semantics the sink's retry relies on
        self.upserts: dict[tuple[str, str], dict[str, str]] = {}
        #: WriteTimeout errors injected (fail_each_batch_once mode)
        self.failed_batches = 0
        self._fail_once = fail_each_batch_once
        self._seen_batches: set[bytes] = set()
        self._lock = _threading.Lock()
        self._srv = _socket.socket(_socket.AF_INET, _socket.SOCK_STREAM)
        self._srv.setsockopt(_socket.SOL_SOCKET, _socket.SO_REUSEADDR, 1)
        self._srv.bind(("127.0.0.1", 0))
        self._srv.listen(64)
        self.port = self._srv.getsockname()[1]
        self._stop = False
        _threading.Thread(target=self._serve, daemon=True).start()

    def _serve(self):
        import threading as _threading

        while not self._stop:
            try:
                conn, _ = self._srv.accept()
            except OSError:
                return
            _threading.Thread(
                target=self._handle, args=(conn,), daemon=True
            ).start()

    def _handle(self, conn):
        def resp(opcode: int, body: bytes) -> bytes:
            return struct.pack(">BBhBi", 0x84, 0x00, 0, opcode, len(body)) + body

        try:
            while True:
                opcode, body = read_frame(conn)
                if opcode == OP_STARTUP:
                    conn.sendall(resp(OP_READY, b""))
                elif opcode == OP_BATCH:
                    if self._fail_once:
                        import hashlib as _hashlib

                        sig = _hashlib.md5(body).digest()
                        with self._lock:
                            fresh = sig not in self._seen_batches
                            if fresh:
                                self._seen_batches.add(sig)
                                self.failed_batches += 1
                        if fresh:
                            # WriteTimeout per native_protocol_v4.spec §9:
                            # code, message, consistency, received,
                            # blockfor, writeType
                            err = struct.pack(">i", ERR_WRITE_TIMEOUT)
                            err += _string("Operation timed out")
                            err += struct.pack(">Hii", 0x0001, 0, 1)
                            err += _string("BATCH")
                            conn.sendall(resp(OP_ERROR, err))
                            continue
                    stmts = self._decode_batch(body)
                    with self._lock:
                        self.statements.extend(stmts)
                        for stmt in stmts:
                            table, vals = parse_insert(stmt)
                            pk = next(iter(vals.values()))
                            self.upserts[(table, pk)] = vals
                    conn.sendall(resp(OP_RESULT, struct.pack(">i", 1)))
                else:
                    err = struct.pack(">i", 0x000A)
                    err += struct.pack(">H", 0)
                    conn.sendall(resp(OP_ERROR, err))
        except (ConnectionError, OSError):
            pass
        finally:
            conn.close()

    @staticmethod
    def _decode_batch(body: bytes) -> list[str]:
        btype, n = struct.unpack(">BH", body[:3])
        if btype != 0x01:
            raise ValueError(f"expected UNLOGGED batch, got type {btype}")
        off = 3
        out = []
        for _ in range(n):
            if body[off] != 0:  # CQL string, not a prepared id
                raise ValueError("unexpected prepared statement in batch")
            (ln,) = struct.unpack(">i", body[off + 1 : off + 5])
            out.append(body[off + 5 : off + 5 + ln].decode())
            off += 5 + ln
            (n_values,) = struct.unpack(">H", body[off : off + 2])
            off += 2
            if n_values:
                raise ValueError("inline-literal sink should send no values")
        return out

    def close(self):
        self._stop = True
        self._srv.close()


def parse_insert(stmt: str) -> tuple[str, dict[str, str]]:
    """Decode one ``INSERT INTO ks.table (c1, c2) VALUES (l1, l2)``
    statement (as produced by :class:`CassandraCqlSink`) back into
    (table, {column: literal-string}) — literals split at top-level
    commas, string quotes kept.  The read-back half of the emulator
    roundtrip."""
    import re as _re

    m = _re.match(r"INSERT INTO (\S+) \((.*?)\) VALUES \((.*)\)\s*$", stmt)
    if not m:
        raise ValueError(f"unparseable INSERT: {stmt[:120]!r}")
    cols = [c.strip() for c in m.group(2).split(",")]
    vals, depth, in_str, cur = [], 0, False, []
    s = m.group(3)
    i = 0
    while i < len(s):
        ch = s[i]
        if in_str:
            if ch == "'":
                if i + 1 < len(s) and s[i + 1] == "'":
                    cur.append("''")
                    i += 2
                    continue
                in_str = False
            cur.append(ch)
        elif ch == "'":
            in_str = True
            cur.append(ch)
        elif ch in "([{":
            depth += 1
            cur.append(ch)
        elif ch in ")]}":
            depth -= 1
            cur.append(ch)
        elif ch == "," and depth == 0:
            vals.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
        i += 1
    vals.append("".join(cur).strip())
    if len(cols) != len(vals):
        raise ValueError(f"column/value arity mismatch in {stmt[:120]!r}")
    return m.group(1), dict(zip(cols, vals))
