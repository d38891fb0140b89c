"""GCP Pub/Sub connector speaking the PUBLIC REST/JSON API — the
jar-free functional path (ref: flink-connectors/flink-connector-gcp-pubsub/
.../PubSubSource.java, PubSubSink.java, common/AcknowledgeOnCheckpoint.java).

Endpoints (cloud.google.com/pubsub/docs/reference/rest — also what the
Google-supplied emulator serves):

- ``POST {base}/v1/projects/{p}/topics/{t}:publish``
  ``{"messages": [{"data": <base64>, "attributes": {...}}]}``
- ``POST {base}/v1/projects/{p}/subscriptions/{s}:pull``
  ``{"maxMessages": N}`` → ``{"receivedMessages": [{"ackId", "message":
  {"data", "messageId", "attributes"}}]}``
- ``POST {base}/v1/projects/{p}/subscriptions/{s}:acknowledge``
  ``{"ackIds": [...]}``

Reference-semantics parity:

- ``PubSubRestSink`` (PubSubSink.java): serialized row bytes as the
  message data; per-PARTITION HTTP session; API-limit chunking (1000
  messages per publish call).  The reference blocks the checkpoint on
  pending publish futures — here the micro-batch is the checkpoint and
  every publish is synchronous-acked before the batch completes.
- ``pubsub_pull_source`` (PubSubSource.java, a ParallelSourceFunction):
  N parallel pull workers, each pulling until the subscription answers
  empty and ACKING after the pull succeeds — the reference's
  acknowledge-on-checkpoint, with the micro-batch as the checkpoint.
  Pub/Sub is at-least-once: redeliveries keep their messageId, so
  ``dedup_on_message_id=True`` drops them exactly where the reference
  relies on downstream idempotence.

Scale shape: subscriptions fan out to any number of pullers (Pub/Sub's
own competing-consumer model) — ``consumers=N`` is one executor task
per puller, rows never touch the driver.
"""

from __future__ import annotations

import base64
import json


def _http_post_json(url: str, doc: dict, token: str | None = None) -> dict:
    """One POST, JSON in/out, loud on HTTP errors (stdlib-only so it
    runs inside executors without extra deps)."""
    import urllib.error
    import urllib.request

    payload = json.dumps(doc).encode()
    req = urllib.request.Request(
        url, data=payload, headers={"Content-Type": "application/json"}
    )
    if token:
        req.add_header("Authorization", f"Bearer {token}")
    try:
        with urllib.request.urlopen(req, timeout=60) as resp:
            body = resp.read()
    except urllib.error.HTTPError as err:
        raise RuntimeError(
            f"pubsub call {url.rsplit('/', 1)[-1]} failed: "
            f"HTTP {err.code} {err.read()[:200]!r}"
        ) from err
    return json.loads(body) if body.strip() else {}


class PubSubRestSink:
    """foreachBatch sink publishing rows to a Pub/Sub topic over REST
    (ref: PubSubSink.java).  Rows serialize to JSON unless ``body_field``
    names a string/binary column to publish raw (the SerializationSchema
    analog); ``attribute_fields`` map named columns into message
    attributes (stringified)."""

    API_MAX_MESSAGES = 1000  # publish-call limit per the public API

    def __init__(
        self,
        base_url: str,
        project: str,
        topic: str,
        *,
        body_field: str | None = None,
        attribute_fields: tuple[str, ...] = (),
        token: str | None = None,
        batch_max_messages: int = API_MAX_MESSAGES,
    ):
        if not project or not topic:
            raise ValueError("a Pub/Sub project and topic are required")
        if batch_max_messages > self.API_MAX_MESSAGES:
            raise ValueError(
                f"publish accepts at most {self.API_MAX_MESSAGES} messages"
            )
        self.url = (
            f"{base_url.rstrip('/')}/v1/projects/{project}/topics/{topic}:publish"
        )
        self.body_field = body_field
        self.attribute_fields = tuple(attribute_fields)
        self.token = token
        self.batch_max_messages = batch_max_messages

    def _message(self, row) -> dict:
        doc = row.asDict(recursive=True)
        if self.body_field is not None:
            v = doc[self.body_field]
            body = v if isinstance(v, (bytes, bytearray)) else str(v).encode()
        else:
            body = json.dumps(doc, sort_keys=True, default=str).encode()
        msg = {"data": base64.b64encode(bytes(body)).decode()}
        if self.attribute_fields:
            msg["attributes"] = {f: str(doc[f]) for f in self.attribute_fields}
        return msg

    def __call__(self, batch_df, batch_id: int) -> None:
        sink = self

        def send_partition(rows):
            buf = []
            for row in rows:
                buf.append(sink._message(row))
                if len(buf) >= sink.batch_max_messages:
                    sink._publish(buf)
                    buf = []
            if buf:
                sink._publish(buf)

        batch_df.foreachPartition(send_partition)

    def _publish(self, messages: list[dict]) -> None:
        out = _http_post_json(self.url, {"messages": messages}, self.token)
        ids = out.get("messageIds", [])
        if len(ids) != len(messages):
            raise RuntimeError(
                f"pubsub publish acked {len(ids)}/{len(messages)} messages"
            )


def pubsub_rest_sink(df, checkpoint: str, **kwargs):
    """Streaming writer using :class:`PubSubRestSink`."""
    sink = PubSubRestSink(**kwargs)
    return df.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint
    )


def pubsub_pull_source(
    spark,
    base_url: str,
    project: str,
    subscription: str,
    *,
    consumers: int = 4,
    max_messages: int = 500,
    max_pulls: int | None = None,
    ack: bool = True,
    dedup_on_message_id: bool = False,
    token: str | None = None,
):
    """Drain a subscription with N parallel pullers → DataFrame
    ``(message_id string, attributes map<string,string>, body binary)``
    (ref: PubSubSource.java pull + acknowledge-on-checkpoint).  Each
    puller loops ``:pull`` until an empty reply (or ``max_pulls``
    calls), acking each non-empty batch after it is locally secured.
    ``dedup_on_message_id`` drops at-least-once redeliveries on the
    server-assigned id."""
    sub_url = f"{base_url.rstrip('/')}/v1/projects/{project}/subscriptions/{subscription}"
    n, tok, cap = max_messages, token, max_pulls

    def drain(_idx_iter):
        pulls = 0
        while cap is None or pulls < cap:
            pulls += 1
            out = _http_post_json(f"{sub_url}:pull", {"maxMessages": n}, tok)
            received = out.get("receivedMessages", [])
            if not received:
                return
            for rm in received:
                msg = rm["message"]
                yield (
                    msg.get("messageId"),
                    dict(msg.get("attributes") or {}),
                    bytearray(base64.b64decode(msg.get("data", ""))),
                )
            if ack:
                _http_post_json(
                    f"{sub_url}:acknowledge",
                    {"ackIds": [rm["ackId"] for rm in received]},
                    tok,
                )

    rdd = spark.sparkContext.parallelize(range(consumers), consumers).mapPartitions(
        drain
    )
    df = spark.createDataFrame(
        rdd, "message_id string, attributes map<string,string>, body binary"
    )
    # The pull loop is SIDE-EFFECTING (leases taken, acks sent): pin the
    # rows executor-side NOW so recomputation never re-pulls.
    df = df.localCheckpoint(eager=True)
    if dedup_on_message_id:
        df = df.dropDuplicates(["message_id"])
    return df


# -- in-process emulator -------------------------------------------------------


class InMemoryPubSubServer:
    """In-process Pub/Sub REST emulator: topic→subscription fan-out on
    :publish, lease-tracking :pull, :acknowledge.  Unacked messages
    return to the queue via :meth:`expire_leases` (the ack-deadline
    redelivery).  Development/testing utility (the InMemoryAmqpBroker
    precedent) — lets the sink AND source be oracle-graded over REAL
    HTTP without gcloud."""

    def __init__(self):
        import re
        import threading
        from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

        self.topics: dict[str, list[str]] = {}  # topic -> subscription names
        self.queues: dict[str, list[dict]] = {}  # subscription -> messages
        self.leased: dict[str, tuple[str, dict]] = {}  # ackId -> (sub, message)
        self.acked = 0
        self.published = 0
        self._seq = 0
        self._lock = threading.Lock()
        srv = self
        route = re.compile(
            r"^/v1/projects/([^/]+)/(topics|subscriptions)/([^/:]+):(\w+)$"
        )

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def do_POST(self):
                nbytes = int(self.headers.get("Content-Length", 0))
                doc = json.loads(self.rfile.read(nbytes) or b"{}")
                m = route.match(self.path)
                if not m:
                    return self._reply(404, {"error": "no such resource"})
                _proj, kind, name, verb = m.groups()
                if (kind, verb) == ("topics", "publish"):
                    return self._reply(200, srv._publish(name, doc))
                if (kind, verb) == ("subscriptions", "pull"):
                    return self._reply(200, srv._pull(name, doc))
                if (kind, verb) == ("subscriptions", "acknowledge"):
                    return self._reply(200, srv._ack(doc))
                return self._reply(404, {"error": f"unsupported {verb}"})

            def _reply(self, status: int, doc: dict):
                body = json.dumps(doc).encode()
                self.send_response(status)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

        self.httpd = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self.url = f"http://127.0.0.1:{self.httpd.server_port}"
        threading.Thread(target=self.httpd.serve_forever, daemon=True).start()

    def create_subscription(self, topic: str, subscription: str) -> None:
        with self._lock:
            self.topics.setdefault(topic, []).append(subscription)
            self.queues.setdefault(subscription, [])

    def _publish(self, topic: str, doc: dict) -> dict:
        ids = []
        with self._lock:
            subs = self.topics.get(topic, [])
            for msg in doc.get("messages", []):
                self._seq += 1
                mid = str(self._seq)
                stored = {
                    "data": msg.get("data", ""),
                    "attributes": msg.get("attributes", {}),
                    "messageId": mid,
                }
                for s in subs:
                    self.queues[s].append(dict(stored))
                ids.append(mid)
                self.published += 1
        return {"messageIds": ids}

    def _pull(self, subscription: str, doc: dict) -> dict:
        want = int(doc.get("maxMessages", 100))
        out = []
        with self._lock:
            q = self.queues.setdefault(subscription, [])
            batch, self.queues[subscription] = q[:want], q[want:]
            for msg in batch:
                self._seq += 1
                ack_id = f"ack-{self._seq}"
                self.leased[ack_id] = (subscription, msg)
                out.append({"ackId": ack_id, "message": msg})
        return {"receivedMessages": out}

    def _ack(self, doc: dict) -> dict:
        with self._lock:
            for ack_id in doc.get("ackIds", []):
                if self.leased.pop(ack_id, None) is not None:
                    self.acked += 1
        return {}

    def expire_leases(self) -> int:
        """Return every leased-but-unacked message to its queue (the
        ack-deadline timeout) — redelivered with the SAME messageId."""
        with self._lock:
            n = len(self.leased)
            for sub, msg in self.leased.values():
                self.queues[sub].append(msg)
            self.leased.clear()
        return n

    def close(self):
        self.httpd.shutdown()
        self.httpd.server_close()
