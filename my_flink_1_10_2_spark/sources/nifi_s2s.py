"""NiFi connector speaking Site-to-Site over HTTP — the jar-free
functional path (ref: flink-connectors/flink-connector-nifi/.../
NiFiSource.java, NiFiSink.java, NiFiDataPacket.java,
StandardNiFiDataPacket.java).

The reference wraps Apache NiFi's SiteToSiteClient; the HTTP transport
of that protocol is PUBLIC (NiFi REST API, ``/nifi-api/data-transfer``):

- create:  ``POST {base}/nifi-api/data-transfer/{input-ports|output-ports}
  /{portId}/transactions`` → 201 with the transaction id
- send:    ``POST .../transactions/{txId}/flow-files`` with a binary
  data-packet stream; the server answers the stream's CRC32 checksum
- receive: ``GET  .../transactions/{txId}/flow-files`` → the binary
  stream; the client computes the CRC32
- confirm: ``DELETE .../transactions/{txId}?responseCode=12&checksum=N``
  (12 = CONFIRM_TRANSACTION) — two-phase: data is only committed/
  dequeued when the checksums agree

Data-packet wire format (the site-to-site client's packet codec): per
flowfile a big-endian ``int32`` attribute count, then per attribute
``int32``-length-prefixed UTF-8 key and value, then an ``int64``
content length and the content bytes — exactly the (attributes,
content) pair the reference surfaces as ``NiFiDataPacket``.

Scale shape: one transaction per PARTITION on the sink, one consumer
task per transaction on the source (NiFi distributes across its own
cluster nodes behind the port); rows never touch the driver.
"""

from __future__ import annotations

import struct
import zlib


# -- data-packet codec ----------------------------------------------------------


def encode_data_packets(packets) -> bytes:
    """``[(attributes: dict[str,str], content: bytes), ...]`` → stream."""
    out = bytearray()
    for attrs, content in packets:
        out += struct.pack(">i", len(attrs))
        for k, v in attrs.items():
            kb, vb = str(k).encode(), str(v).encode()
            out += struct.pack(">i", len(kb)) + kb
            out += struct.pack(">i", len(vb)) + vb
        content = bytes(content)
        out += struct.pack(">q", len(content)) + content
    return bytes(out)


def decode_data_packets(buf: bytes) -> list[tuple[dict, bytes]]:
    """Inverse of :func:`encode_data_packets` — loud on truncation."""
    packets, off = [], 0
    while off < len(buf):
        (n_attrs,) = struct.unpack_from(">i", buf, off)
        off += 4
        attrs = {}
        for _ in range(n_attrs):
            (kl,) = struct.unpack_from(">i", buf, off)
            k = buf[off + 4 : off + 4 + kl].decode()
            off += 4 + kl
            (vl,) = struct.unpack_from(">i", buf, off)
            attrs[k] = buf[off + 4 : off + 4 + vl].decode()
            off += 4 + vl
        (clen,) = struct.unpack_from(">q", buf, off)
        off += 8
        if off + clen > len(buf):
            raise ValueError("truncated NiFi data-packet stream")
        packets.append((attrs, buf[off : off + clen]))
        off += clen
    return packets


# -- HTTP transaction protocol ---------------------------------------------------

CONFIRM_TRANSACTION = 12  # ResponseCode.CONFIRM_TRANSACTION


def _http(url: str, method: str, body: bytes | None = None) -> tuple[int, bytes, dict]:
    import urllib.error
    import urllib.request

    req = urllib.request.Request(url, data=body, method=method)
    if body is not None:
        req.add_header("Content-Type", "application/octet-stream")
    try:
        with urllib.request.urlopen(req, timeout=60) as resp:
            return resp.status, resp.read(), dict(resp.headers)
    except urllib.error.HTTPError as err:
        raise RuntimeError(
            f"NiFi S2S {method} {url.split('/nifi-api/')[-1]} failed: "
            f"HTTP {err.code} {err.read()[:200]!r}"
        ) from err


def _create_transaction(base_url: str, port_kind: str, port_id: str) -> str:
    status, body, _hdrs = _http(
        f"{base_url.rstrip('/')}/nifi-api/data-transfer/{port_kind}/"
        f"{port_id}/transactions",
        "POST",
        b"",
    )
    if status not in (200, 201):
        raise RuntimeError(f"NiFi transaction create answered HTTP {status}")
    import json as _json

    return _json.loads(body)["transactionId"]


def _confirm(base_url, port_kind, port_id, tx_id, checksum: int) -> None:
    status, _body, _h = _http(
        f"{base_url.rstrip('/')}/nifi-api/data-transfer/{port_kind}/{port_id}"
        f"/transactions/{tx_id}?responseCode={CONFIRM_TRANSACTION}"
        f"&checksum={checksum}",
        "DELETE",
    )
    if status != 200:
        raise RuntimeError(f"NiFi transaction confirm answered HTTP {status}")


class NiFiS2SSink:
    """foreachBatch sink shipping rows to a NiFi INPUT port as
    data packets over S2S-HTTP (ref: NiFiSink.java + the reference's
    NiFiDataPacketBuilder): content from ``body_field`` (string/binary)
    or the JSON row, attributes from ``attribute_fields``.  One
    two-phase transaction per partition — create → send → confirm with
    the server's CRC32 — so a failed partition leaves nothing
    committed (the reference's transaction.confirm()/complete())."""

    def __init__(
        self,
        base_url: str,
        port_id: str,
        *,
        body_field: str | None = None,
        attribute_fields: tuple[str, ...] = (),
        batch_max_packets: int = 500,
    ):
        if not port_id:
            raise ValueError("a NiFi input-port id is required")
        self.base_url = base_url
        self.port_id = port_id
        self.body_field = body_field
        self.attribute_fields = tuple(attribute_fields)
        self.batch_max_packets = batch_max_packets

    def _packet(self, row) -> tuple[dict, bytes]:
        import json as _json

        doc = row.asDict(recursive=True)
        attrs = {f: str(doc[f]) for f in self.attribute_fields}
        if self.body_field is not None:
            v = doc[self.body_field]
            content = v if isinstance(v, (bytes, bytearray)) else str(v).encode()
        else:
            content = _json.dumps(doc, sort_keys=True, default=str).encode()
        return attrs, bytes(content)

    def __call__(self, batch_df, batch_id: int) -> None:
        sink = self

        def send_partition(rows):
            buf = []
            for row in rows:
                buf.append(sink._packet(row))
                if len(buf) >= sink.batch_max_packets:
                    sink._ship(buf)
                    buf = []
            if buf:
                sink._ship(buf)

        batch_df.foreachPartition(send_partition)

    def _ship(self, packets) -> None:
        stream = encode_data_packets(packets)
        tx = _create_transaction(self.base_url, "input-ports", self.port_id)
        _status, body, _h = _http(
            f"{self.base_url.rstrip('/')}/nifi-api/data-transfer/input-ports/"
            f"{self.port_id}/transactions/{tx}/flow-files",
            "POST",
            stream,
        )
        server_crc = int(body.strip() or b"0")
        local_crc = zlib.crc32(stream)
        if server_crc != local_crc:
            raise RuntimeError(
                f"NiFi S2S checksum mismatch: sent crc32={local_crc}, "
                f"server saw {server_crc}"
            )
        _confirm(self.base_url, "input-ports", self.port_id, tx, local_crc)


def nifi_s2s_sink(df, checkpoint: str, **kwargs):
    """Streaming writer using :class:`NiFiS2SSink`."""
    sink = NiFiS2SSink(**kwargs)
    return df.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint
    )


def nifi_s2s_source(
    spark,
    base_url: str,
    port_id: str,
    *,
    consumers: int = 4,
):
    """Drain a NiFi OUTPUT port → DataFrame ``(attributes
    map<string,string>, content binary)`` (ref: NiFiSource.java).  Each
    consumer task loops create → GET flow-files → CRC32-confirm until
    the port answers empty (HTTP 204 on create or an empty stream);
    the confirm is what dequeues server-side, so an executor crash
    mid-transaction redelivers (at-least-once, the reference's
    transactional receive)."""
    base, pid = base_url, port_id

    def drain(_idx_iter):
        while True:
            import json as _json
            import urllib.error
            import urllib.request

            req = urllib.request.Request(
                f"{base.rstrip('/')}/nifi-api/data-transfer/output-ports/"
                f"{pid}/transactions",
                data=b"",
                method="POST",
            )
            with urllib.request.urlopen(req, timeout=60) as resp:
                if resp.status == 204:
                    return  # port empty
                tx = _json.loads(resp.read())["transactionId"]
            _status, stream, _h = _http(
                f"{base.rstrip('/')}/nifi-api/data-transfer/output-ports/"
                f"{pid}/transactions/{tx}/flow-files",
                "GET",
            )
            if not stream:
                _confirm(base, "output-ports", pid, tx, 0)
                return
            _confirm(base, "output-ports", pid, tx, zlib.crc32(stream))
            for attrs, content in decode_data_packets(stream):
                yield (attrs, bytearray(content))

    rdd = spark.sparkContext.parallelize(range(consumers), consumers).mapPartitions(
        drain
    )
    # Transactions CONFIRM (dequeue server-side) inside the drain: pin
    # the rows executor-side NOW so recomputation never re-drains an
    # already-confirmed (empty) port.
    return spark.createDataFrame(
        rdd, "attributes map<string,string>, content binary"
    ).localCheckpoint(eager=True)


# -- in-process emulator -------------------------------------------------------


class InMemoryNiFiS2SServer:
    """In-process S2S-HTTP emulator: transaction create/send/receive/
    confirm on one port that is both input (sink target) and output
    (source origin), with two-phase semantics — received data only
    dequeues, and sent data only commits, on a checksum-matching
    confirm.  Development/testing utility (the InMemoryPubSubServer
    precedent)."""

    def __init__(self, *, batch_packets: int = 100):
        import re
        import threading
        from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

        self.queue: list[tuple[dict, bytes]] = []  # the port's flowfiles
        self.confirmed_sends = 0
        self.confirmed_receives = 0
        self._tx: dict[str, dict] = {}
        self._seq = 0
        self._lock = threading.Lock()
        self._batch = batch_packets
        srv = self
        tx_route = re.compile(
            r"^/nifi-api/data-transfer/(input-ports|output-ports)/([^/]+)"
            r"/transactions(?:/([^/?]+))?(?:/flow-files)?(?:\?(.*))?$"
        )

        class Handler(BaseHTTPRequestHandler):
            protocol_version = "HTTP/1.1"

            def log_message(self, *a):
                pass

            def _reply(self, status: int, body: bytes = b""):
                self.send_response(status)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                if body:
                    self.wfile.write(body)

            def do_POST(self):
                m = tx_route.match(self.path)
                if not m:
                    return self._reply(404)
                kind, _port, tx_id, _qs = m.groups()
                n = int(self.headers.get("Content-Length", 0))
                body = self.rfile.read(n) if n else b""
                if tx_id is None:  # create
                    with srv._lock:
                        if kind == "output-ports" and not srv.queue:
                            return self._reply(204)
                        srv._seq += 1
                        new_id = f"tx-{srv._seq}"
                        tx = {"kind": kind, "data": b"", "leased": []}
                        if kind == "output-ports":
                            take = srv.queue[: srv._batch]
                            srv.queue = srv.queue[srv._batch :]
                            tx["leased"] = take
                            tx["data"] = encode_data_packets(take)
                        srv._tx[new_id] = tx
                    return self._reply(
                        201, b'{"transactionId": "' + new_id.encode() + b'"}'
                    )
                # send leg: stream arrives, answer its checksum
                with srv._lock:
                    tx = srv._tx.get(tx_id)
                    if tx is None or tx["kind"] != "input-ports":
                        return self._reply(404)
                    tx["data"] = body
                return self._reply(200, str(zlib.crc32(body)).encode())

            def do_GET(self):
                m = tx_route.match(self.path)
                if not m:
                    return self._reply(404)
                _kind, _port, tx_id, _qs = m.groups()
                with srv._lock:
                    tx = srv._tx.get(tx_id)
                    if tx is None or tx["kind"] != "output-ports":
                        return self._reply(404)
                    data = tx["data"]
                return self._reply(200, data)

            def do_DELETE(self):
                from urllib.parse import parse_qs, urlparse

                parsed = urlparse(self.path)
                m = tx_route.match(parsed.path)
                if not m:
                    return self._reply(404)
                _kind, _port, tx_id, _ = m.groups()
                qs = parse_qs(parsed.query)
                code = int(qs.get("responseCode", ["0"])[0])
                checksum = int(qs.get("checksum", ["-1"])[0])
                with srv._lock:
                    tx = srv._tx.pop(tx_id, None)
                    if tx is None:
                        return self._reply(404)
                    ok = code == CONFIRM_TRANSACTION and checksum == zlib.crc32(
                        tx["data"]
                    )
                    if not ok:
                        # rollback: leased flowfiles return to the port
                        if tx["kind"] == "output-ports":
                            srv.queue = tx["leased"] + srv.queue
                        return self._reply(400, b"checksum mismatch")
                    if tx["kind"] == "input-ports":
                        srv.queue.extend(decode_data_packets(tx["data"]))
                        srv.confirmed_sends += 1
                    else:
                        srv.confirmed_receives += 1
                return self._reply(200)

        self.httpd = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self.url = f"http://127.0.0.1:{self.httpd.server_port}"
        threading.Thread(target=self.httpd.serve_forever, daemon=True).start()

    def abandon_open_transactions(self) -> int:
        """Drop every in-flight transaction WITHOUT confirm (an executor
        crash): output leases return to the queue, input data is lost
        uncommitted — the two-phase guarantee under test."""
        with self._lock:
            n = len(self._tx)
            for tx in self._tx.values():
                if tx["kind"] == "output-ports":
                    self.queue = tx["leased"] + self.queue
            self._tx.clear()
        return n

    def close(self):
        self.httpd.shutdown()
        self.httpd.server_close()
