"""Streaming-HTTP line source — the jar-free functional path for the
Twitter connector (ref: flink-connectors/flink-connector-twitter/.../
TwitterSource.java).

The reference wraps the hosebird client around Twitter's public
streaming HTTP API: one long-lived chunked HTTP response carrying
newline-delimited JSON statuses, emitted downstream as raw strings
(the ``SimpleStringSchema`` default).  That transport shape — GET an
endpoint, read the chunked body line by line — is generic, so the
module exposes it as ``http_line_stream_source`` and ``twitter_source``
is the bearer-authenticated specialization.

Parallelism parity: the reference source opens ONE stream per subtask;
``streams`` here is one executor task per connection, each given the
same or distinct endpoint URLs (filtered rules / partitions of the
backfill).  Rows surface executor-side; the driver never sees bodies.
"""

from __future__ import annotations


def _iter_lines(url: str, headers: dict | None, max_lines: int | None):
    import urllib.request

    req = urllib.request.Request(url)
    for k, v in (headers or {}).items():
        req.add_header(k, v)
    n = 0
    with urllib.request.urlopen(req, timeout=300) as resp:
        buf = b""
        while True:
            chunk = resp.read(8192)
            if not chunk:
                break
            buf += chunk
            while b"\n" in buf:
                line, buf = buf.split(b"\n", 1)
                line = line.strip()
                if not line:
                    continue  # keep-alive newlines per the streaming API
                yield line.decode("utf-8", errors="replace")
                n += 1
                if max_lines is not None and n >= max_lines:
                    return
        if buf.strip():
            yield buf.strip().decode("utf-8", errors="replace")


def http_line_stream_source(
    spark,
    urls,
    *,
    headers: dict | None = None,
    max_lines: int | None = None,
):
    """Read newline-delimited text over streaming HTTP → DataFrame
    ``(stream_id int, line string)``.  ``urls`` is one endpoint per
    parallel stream (a single string opens one stream).  ``max_lines``
    bounds each stream (None = run to EOF — endless for live APIs, so
    bound it in batch jobs)."""
    if isinstance(urls, str):
        urls = [urls]
    urls = list(urls)
    hdrs, cap = dict(headers or {}), max_lines

    def drain(idx_iter):
        for idx in idx_iter:
            for line in _iter_lines(urls[idx], hdrs, cap):
                yield (idx, line)

    rdd = spark.sparkContext.parallelize(range(len(urls)), len(urls)).mapPartitions(
        drain
    )
    # A live stream read is not replayable: pin the rows executor-side
    # NOW so recomputation never re-opens the endpoint.
    return spark.createDataFrame(
        rdd, "stream_id int, line string"
    ).localCheckpoint(eager=True)


def twitter_source(
    spark,
    url: str,
    *,
    bearer_token: str | None = None,
    max_lines: int | None = None,
    streams: int = 1,
):
    """ref: TwitterSource.java — the sample/filter streaming endpoint as
    newline-delimited JSON statuses, one connection per subtask, each
    status emitted as its raw string.  Returns ``(stream_id, line)``;
    parse with ``F.get_json_object``/``from_json`` downstream exactly
    like the reference's deserialization schema."""
    headers = {}
    if bearer_token:
        headers["Authorization"] = f"Bearer {bearer_token}"
    return http_line_stream_source(
        spark, [url] * streams, headers=headers, max_lines=max_lines
    )


class InMemoryLineStreamServer:
    """In-process chunked-HTTP line-stream emulator: serves the given
    lines as a newline-delimited body with keep-alive blank lines
    interleaved (the streaming-API idle signal) and records request
    headers.  Development/testing utility (the InMemoryPubSubServer
    precedent)."""

    def __init__(self, lines: list[str], *, keepalive_every: int = 0):
        import threading
        from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

        srv = self
        self.lines = list(lines)
        self.seen_headers: list[dict] = []
        self._ka = keepalive_every

        class Handler(BaseHTTPRequestHandler):
            protocol_version = "HTTP/1.1"

            def log_message(self, *a):
                pass

            def do_GET(self):
                srv.seen_headers.append(dict(self.headers))
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Transfer-Encoding", "chunked")
                self.end_headers()

                def chunk(b: bytes):
                    self.wfile.write(f"{len(b):x}\r\n".encode() + b + b"\r\n")

                for i, line in enumerate(srv.lines):
                    if srv._ka and i and i % srv._ka == 0:
                        chunk(b"\n")  # keep-alive
                    chunk(line.encode() + b"\n")
                self.wfile.write(b"0\r\n\r\n")

        self.httpd = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self.url = f"http://127.0.0.1:{self.httpd.server_port}"
        threading.Thread(target=self.httpd.serve_forever, daemon=True).start()

    def close(self):
        self.httpd.shutdown()
        self.httpd.server_close()
