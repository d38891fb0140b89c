"""Live socketTextStream test (ref:
StreamExecutionEnvironment.socketTextStream:1396): an in-process TCP
server feeds lines to Spark's socket source."""

from __future__ import annotations

import socket
import threading
import time
import uuid

from my_flink_1_10_2_spark.streaming import StreamExecutionEnvironment

LINES = ["alpha", "beta", "gamma"]


def test_socket_text_stream_reads_lines(spark):
    server = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    server.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    server.bind(("127.0.0.1", 0))
    port = server.getsockname()[1]
    server.listen(1)
    stop = threading.Event()

    def serve():
        conn, _ = server.accept()
        try:
            conn.sendall(("\n".join(LINES) + "\n").encode())
            # keep the connection open until the reader has the rows —
            # Spark treats a closed socket as end-of-stream failure
            stop.wait(timeout=60)
        finally:
            conn.close()
            server.close()

    t = threading.Thread(target=serve, daemon=True)
    t.start()

    env = StreamExecutionEnvironment(spark)
    stream = env.socket_text_stream("127.0.0.1", port)
    name = f"sock_{uuid.uuid4().hex[:8]}"
    q = (
        stream.df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .start()
    )
    try:
        deadline = time.monotonic() + 60
        while time.monotonic() < deadline:
            if spark.table(name).count() >= len(LINES):
                break
            time.sleep(0.5)
        got = sorted(r["value"] for r in spark.table(name).collect())
        assert got == sorted(LINES)
    finally:
        q.stop()
        stop.set()
        t.join(timeout=10)
