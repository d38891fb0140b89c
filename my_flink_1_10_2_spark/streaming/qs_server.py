"""Out-of-process queryable-state SERVER — the network half of the
reference's queryable-state stack (ref: flink-queryable-state/
flink-queryable-state-runtime/.../KvStateServerImpl.java and
flink-queryable-state-client-java/.../QueryableStateClient.java): an
external process can point-query a running job's keyed state by
(state name, key) without touching the job.

The reference speaks a custom Netty binary protocol; here the transport
is HTTP/JSON (the part of the design that is transport, not semantics):

    GET /state/<name>?<keyCol>=<value>[&<keyCol2>=...]  → JSON row | 404
    GET /state/<name>                                   → JSON rows (snapshot)
    GET /health                                         → {"states": [...]}

Serving reads the same latest-committed aggregate the in-process
:class:`~my_flink_1_10_2_spark.streaming.stream.QueryableStateHandle`
reads (memory-sink table in local mode; on a cluster the identical
server fronts the Delta/parquet sink the handle documents).  Queries
are driver-side lookups against a keyed aggregate that is tiny by
construction (one row per key) — the same state-size contract the
reference's KvState server has.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qsl, urlparse


class QueryableStateServer:
    """HTTP server exposing registered QueryableStateHandles.

    >>> server = QueryableStateServer()
    >>> server.register(handle)          # a KeyedStream.as_queryable_state handle
    >>> port = server.start()            # 127.0.0.1:<port>
    ... GET http://127.0.0.1:<port>/state/<handle.name>?user_id=7
    >>> server.stop()
    """

    def __init__(self, host: str = "127.0.0.1", port: int = 0):
        self._host, self._port = host, port
        self._handles: dict[str, object] = {}
        self._httpd: ThreadingHTTPServer | None = None
        self._thread: threading.Thread | None = None

    def register(self, handle) -> None:
        self._handles[handle.name] = handle

    # -- request handling ---------------------------------------------------

    def _lookup(self, name: str, filters: dict[str, str]):
        handle = self._handles.get(name)
        if handle is None:
            return 404, {"error": f"unknown state {name!r}"}
        df = handle.snapshot()
        if filters:
            unknown = set(filters) - set(df.columns)
            if unknown:
                return 400, {"error": f"unknown key columns {sorted(unknown)}"}
            for col, val in filters.items():
                df = df.where(df[col].cast("string") == val)
        rows = [r.asDict() for r in df.collect()]
        if filters and not rows:
            return 404, {"error": "no state for key", "key": filters}
        return 200, rows[0] if filters and len(rows) == 1 else rows

    def _make_handler(server_self):
        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet test output
                pass

            def do_GET(self):
                parsed = urlparse(self.path)
                parts = [p for p in parsed.path.split("/") if p]
                if parts == ["health"]:
                    code, body = 200, {"states": sorted(server_self._handles)}
                elif len(parts) == 2 and parts[0] == "state":
                    code, body = server_self._lookup(
                        parts[1], dict(parse_qsl(parsed.query))
                    )
                else:
                    code, body = 404, {"error": "routes: /health, /state/<name>"}
                payload = json.dumps(body, default=str).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(payload)))
                self.end_headers()
                self.wfile.write(payload)

        return Handler

    # -- lifecycle ----------------------------------------------------------

    def start(self) -> int:
        """Bind and serve on a daemon thread; returns the bound port."""
        if self._httpd is not None:
            raise RuntimeError("server already started")
        self._httpd = ThreadingHTTPServer(
            (self._host, self._port), self._make_handler()
        )
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )
        self._thread.start()
        return self._httpd.server_address[1]

    def stop(self) -> None:
        if self._httpd is not None:
            self._httpd.shutdown()
            self._httpd.server_close()
            self._httpd = None
            self._thread = None
