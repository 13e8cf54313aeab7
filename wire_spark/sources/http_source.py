"""HTTP/webhook source: push-based ingestion into a Spark file stream.

The reference's README promises an HTTP/webhook source (README.md:
67-75) but ships no implementation (docs-only, SURVEY.md §2.1). Here
it is real, using the standard landing-zone pattern: an embedded HTTP
endpoint accepts POSTed JSON events and spools each request as an
atomically-renamed JSON-lines file; a Structured Streaming file
source tails the spool directory. The write side is a control-plane
HTTP server (same stdlib machinery as wire_spark/api.py); the read
side is Spark's checkpointed, replayable file stream — so webhook
ingestion inherits exactly-once delivery downstream, which a socket
source cannot offer.

Scale notes: one file per POST is correct for webhook-rate traffic
(10s-100s of events/sec); for higher rates, batching POSTs or a
Kafka front is the answer — the read side is unchanged either way.
The atomic tmp-write + rename guarantees the stream never reads a
partially-written file.
"""

from __future__ import annotations

import json
import os
import threading
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from pyspark.sql import DataFrame, SparkSession


class HttpWebhookSource:
    """POST /webhook {json} (single object or array) -> spooled
    JSON-lines -> streaming DataFrame via ``read(spark, schema)``."""

    def __init__(self, spool_dir: str):
        self.spool_dir = spool_dir
        os.makedirs(spool_dir, exist_ok=True)
        self._server: ThreadingHTTPServer | None = None
        self._thread: threading.Thread | None = None
        self.received = 0

    # -- write side (the webhook endpoint) ---------------------------

    def _land(self, docs: list[dict]) -> None:
        """Spool a batch of documents as one JSON-lines file; tmp-write
        + rename so the file stream only ever sees complete files."""
        fname = f"batch-{uuid.uuid4().hex}.json"
        tmp = os.path.join(self.spool_dir, f".tmp-{fname}")
        with open(tmp, "w") as f:
            for d in docs:
                f.write(json.dumps(d) + "\n")
        os.rename(tmp, os.path.join(self.spool_dir, fname))
        self.received += len(docs)

    def start(self, port: int = 0) -> int:
        source = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *args):  # quiet
                pass

            def do_POST(self):
                length = int(self.headers.get("Content-Length", 0))
                raw = self.rfile.read(length)
                try:
                    body = json.loads(raw.decode("utf-8"))
                except (ValueError, UnicodeDecodeError):
                    self.send_response(400)
                    self.end_headers()
                    self.wfile.write(b'{"error": "invalid json"}')
                    return
                docs = body if isinstance(body, list) else [body]
                source._land(docs)
                self.send_response(200)
                self.end_headers()
                self.wfile.write(
                    json.dumps({"accepted": len(docs)}).encode("utf-8")
                )

        self._server = ThreadingHTTPServer(("127.0.0.1", port), Handler)
        self._thread = threading.Thread(target=self._server.serve_forever, daemon=True)
        self._thread.start()
        return self._server.server_address[1]

    def stop(self) -> None:
        if self._server:
            self._server.shutdown()
            self._server.server_close()

    # -- read side (the Spark stream) --------------------------------

    def read(self, spark: SparkSession, schema: str) -> DataFrame:
        """Streaming DataFrame over the spool (schema required — a
        webhook has no sample files to infer from at t=0)."""
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "100")
            .json(self.spool_dir)
        )
