"""HTTP facade: the reference's rqlite-style API surface.

Mirrors internal/http/service.go routes (:484-580):

- ``POST /connector``            create + start a pipeline
  (service.go:1801-1875: parse source/sink configs, persist raw body
  under key 'config', run).
- ``GET/POST/DELETE /key``       raw KV access (service.go:513-517,
  :1785-1799 — the StoreInDatabase path).
- ``POST /db/execute``           statements (SET/DELETE), rqlite
  request shape: JSON array of statement strings; response
  ``{"results": [{"rows_affected": n}], "time": t}``.
  ``?queue`` switches to the queued-write path
  (service.go:1106-1159 queuedExecute): statements are enqueued and
  the response carries the batch ``sequence_number`` instead of
  per-statement results; ``&wait`` blocks until the batch is applied
  (``&timeout=<sec>``, default 30 — exceeded -> 408 "queue wait
  timeout", the reference's StatusRequestTimeout).
- ``POST /db/query``             GET statements -> QueryRows JSON
  (plain or ``?associative`` — encoding/json.go:27-160 shapes).
- ``GET /status`` ``GET /readyz`` diagnostics (service.go:508-511).
- ``POST /boot``                 bulk store restore (service.go:801-819
  handleBoot — the reference returns a hardcoded 503 with the actual
  load commented out; here the promised load is implemented through
  the KV last-writer-wins log).
- ``GET /nodes``                 node roster (service.go:975-1022,
  handleNodes). Single-node analog: exactly one entry, keyed by the
  Spark application id, always reachable and leader — there is no
  Raft roster to test, but the *shape* (id -> {api_addr, reachable,
  leader, time}) matches so dashboards built on the reference work
  unchanged.
- ``GET /debug/vars``            expvar metrics (service.go:1416-1436,
  handleExpvar): per-route request counters plus engine gauges
  (active streaming queries, live KV keys), with the same ``?key=``
  single-variable filter.

No auth/TLS/cluster-redirect tier: there is no leader to redirect to
(SURVEY.md §7.3) — any API node can serve any request because state
lives in Spark + table storage, which is the point of the re-design.

Built on stdlib ThreadingHTTPServer: the API is a control plane (a
few requests/sec); the data plane is Spark.
"""

from __future__ import annotations

import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

from pyspark.sql import SparkSession

from wire_spark.kv import KVStore
from wire_spark.model import SinkConfig, SourceConfig
from wire_spark.pipeline import PipelineRegistry


class WireService:
    """Engine context served over HTTP."""

    def __init__(self, spark: SparkSession, kv: KVStore | None = None):
        self.spark = spark
        self.kv = kv or KVStore(spark)
        self.registry = PipelineRegistry(spark)
        self._server: ThreadingHTTPServer | None = None
        self._thread: threading.Thread | None = None
        self._started = time.time()
        # expvar-style per-route hit counters (service.go's stats.Add
        # calls); exposed verbatim through /debug/vars
        self._stats: dict[str, int] = {}
        self._stats_lock = threading.Lock()
        # queued-write path: KV drain thread started lazily on the
        # first /db/execute?queue request, stopped with the service
        self._queue_lock = threading.Lock()
        self._queue_started = False

    def _count(self, name: str) -> None:
        with self._stats_lock:
            self._stats[name] = self._stats.get(name, 0) + 1

    # -- handlers ----------------------------------------------------

    def create_pipeline(self, body: dict) -> dict:
        src = body["source"]
        snk = body["sink"]
        key = src.get("key") or snk.get("key")
        self.registry.add_source(
            SourceConfig(name=src.get("name", key), type=src["type"], key=key,
                         config=src.get("config", {}))
        )
        self.registry.add_sink(
            SinkConfig(name=snk.get("name", key), type=snk["type"], key=key,
                       config=snk.get("config", {}))
        )
        self.registry.create(key)
        # persist raw body under 'config' (service.go:1870)
        self.kv.put("config", json.dumps(body, sort_keys=True))
        if body.get("run", True):
            self.registry.run(key, available_now=body.get("available_now", False))
        return {"key": key, "pipeline": self.registry.show()[key]}

    def execute(self, statements: list[str]) -> dict:
        if not statements:
            # empty/absent body is a 400, never a vacuous success
            # (request_parser.go:14 ErrNoStatements)
            raise ValueError("no statements")
        t0 = time.perf_counter()
        results = []
        for s in statements:
            r = self.kv.execute(s)
            results.append(
                {"rows_affected": r.rows_affected} if r.error is None else {"error": r.error}
            )
        return {"results": results, "time": time.perf_counter() - t0}

    def queued_execute(
        self, statements: list[str], wait: bool = False, timeout: float = 30.0
    ) -> dict:
        """The rqlite queued-write path (service.go:1106-1159
        queuedExecute + queue.Write): enqueue the whole request as one
        batch and return its sequence number; the drain thread applies
        batches in enqueue order, so sequence numbers are monotone with
        apply order.  ``wait`` blocks until THIS batch is applied
        (FlushChannel analog); a timeout raises ``TimeoutError``, which
        the HTTP layer maps to 408 like the reference's
        StatusRequestTimeout."""
        if not statements:
            # reject before touching the queue: an empty batch would
            # return sequence_number 0, which wait=true then treats
            # as already-applied — a degenerate success for a request
            # the reference 400s (request_parser.go:14
            # ErrNoStatements)
            raise ValueError("no statements")
        self._count("num_queued_executions")
        t0 = time.perf_counter()
        with self._queue_lock:
            if not self._queue_started:
                self.kv.start_queue()
                self._queue_started = True
            seq = 0
            for s in statements:
                seq = self.kv.queue_execute(s)
        if wait:
            self._count("num_queued_executions_wait")
            if not self.kv.queue_wait(seq, timeout=timeout):
                self._count("num_queued_executions_wait_timeout")
                raise TimeoutError("queue wait timeout")
        return {
            "results": [],
            "sequence_number": seq,
            "time": time.perf_counter() - t0,
        }

    def query(self, statements: list[str], associative: bool = False) -> dict:
        if not statements:
            # same contract as execute/queued_execute: empty body is
            # a 400, never a vacuous success (request_parser.go:14)
            raise ValueError("no statements")
        t0 = time.perf_counter()
        results = []
        for s in statements:
            try:
                rows = self.kv.query(s)
                results.append(rows.to_json_dict(associative=associative))
            except Exception as e:
                results.append({"error": str(e)})
        return {"results": results, "time": time.perf_counter() - t0}

    def status(self) -> dict:
        return {
            "node": {"uptime": True},
            "store": {"keys_live": self.kv.state().count()},
            "pipelines": self.registry.show(),
            "active": self.registry.active(),
            "spark": {"version": self.spark.version},
        }

    def boot(self, records: list[dict]) -> dict:
        """service.go:801-819 handleBoot analog. The reference
        PROMISES booting the node from an uploaded store file but
        ships a hardcoded 503 (`http.Error(... StatusServiceUnavailable)`
        with the ReadFrom call commented out); here the promise is
        kept: a JSON array of {key, value} records loads into the KV
        store through the normal last-writer-wins log, so a /boot
        replay is idempotent and coexists with live writes. Restores
        beyond control-plane size should ship a parquet log to
        ``persist_path`` instead — this endpoint is for config-store
        sized state, which the KV tier is (SURVEY §2.5)."""
        n = 0
        for rec in records:
            self.kv.put(str(rec["key"]), str(rec["value"]))
            n += 1
        return {"loaded": n}

    def nodes(self) -> dict:
        """service.go:975-1022 handleNodes analog. The reference
        walks the Raft roster and pings each voter; here the roster
        is exactly this driver, always reachable, always the leader
        (SURVEY §7.3: no replica tier). Same response shape
        (id -> node record) so reference-built tooling parses it."""
        sc = self.spark.sparkContext
        addr = None
        if self._server is not None:
            host, port = self._server.server_address[:2]
            addr = f"{host}:{port}"
        return {
            sc.applicationId: {
                "api_addr": addr,
                "addr": addr,
                "reachable": True,
                "leader": True,
                "voter": True,
                "time": round(time.time() - self._started, 3),
            }
        }

    def expvar(self, key: str | None = None) -> dict:
        """service.go:1416-1436 handleExpvar analog: route-hit
        counters plus engine gauges, with the reference's ``?key=``
        single-variable filter. Gauges that cost a Spark job
        (kv_keys_live) or registry walk are computed ONLY when
        actually requested — /debug/vars is a polling endpoint, and a
        scraper asking for one counter must not trigger driver jobs
        for values it throws away."""
        gauges = {
            "uptime_seconds": lambda: round(time.time() - self._started, 3),
            "active_streaming_queries": lambda: len(
                [q for q in self.spark.streams.active if q.isActive]
            ),
            "pipelines": lambda: len(self.registry.show()),
            "kv_keys_live": lambda: self.kv.state().count(),
        }
        with self._stats_lock:
            counters: dict = dict(self._stats)
        if key is not None:
            if key in counters:
                return {key: counters[key]}
            if key in gauges:
                return {key: gauges[key]()}
            return {}
        out = counters
        for name, fn in gauges.items():
            out[name] = fn()
        return out

    # -- server lifecycle --------------------------------------------

    def serve(self, port: int = 0) -> int:
        service = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *args):  # quiet
                pass

            def _send(self, code: int, payload: dict) -> None:
                body = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def _body(self):
                n = int(self.headers.get("Content-Length", 0))
                return json.loads(self.rfile.read(n)) if n else None

            def do_GET(self):
                u = urlparse(self.path)
                qs = parse_qs(u.query, keep_blank_values=True)
                # same JSON-error contract as do_POST: /status,
                # /nodes, /debug/vars and /key all touch Spark/KV
                # state that can fail (stopped context, job error) —
                # the client must get the rqlite-style error shape,
                # never a dropped connection
                try:
                    if u.path == "/readyz":
                        service._count("num_readyz")
                        self._send(200, {"ready": True})
                    elif u.path == "/status":
                        service._count("num_status")
                        self._send(200, service.status())
                    elif u.path == "/nodes":
                        service._count("num_nodes")
                        self._send(200, service.nodes())
                    elif u.path == "/debug/vars":
                        self._send(
                            200, service.expvar(key=qs.get("key", [None])[0])
                        )
                    elif u.path == "/key":
                        key = qs.get("key", [None])[0]
                        if key is None:
                            self._send(400, {"error": "missing key"})
                            return
                        v = service.kv.get(key)
                        self._send(200, {"key": key, "value": v})
                    else:
                        self._send(404, {"error": "not found"})
                except Exception as e:
                    self._send(500, {"error": str(e)})

            def do_POST(self):
                u = urlparse(self.path)
                qs = parse_qs(u.query, keep_blank_values=True)
                try:
                    if u.path.startswith("/connector"):
                        self._send(200, service.create_pipeline(self._body()))
                    elif u.path == "/db/execute":
                        if "queue" in qs:
                            try:
                                self._send(200, service.queued_execute(
                                    self._body(),
                                    wait="wait" in qs,
                                    timeout=float(qs.get("timeout", ["30"])[0]),
                                ))
                            except TimeoutError as te:
                                self._send(408, {"error": str(te)})
                        else:
                            self._send(200, service.execute(self._body()))
                    elif u.path == "/db/query":
                        self._send(
                            200,
                            service.query(
                                self._body(), associative="associative" in qs
                            ),
                        )
                    elif u.path == "/boot":
                        service._count("num_boot")
                        self._send(200, service.boot(self._body()))
                    elif u.path == "/key":
                        body = self._body()
                        service.kv.put(body["key"], body["value"])
                        self._send(200, {"ok": True})
                    else:
                        self._send(404, {"error": "not found"})
                except Exception as e:  # rqlite returns JSON errors
                    self._send(400, {"error": str(e)})

            def do_DELETE(self):
                u = urlparse(self.path)
                qs = parse_qs(u.query, keep_blank_values=True)
                if u.path == "/key":
                    key = qs.get("key", [None])[0]
                    if key is None:
                        self._send(400, {"error": "missing key"})
                        return
                    service.kv.execute(f"DELETE {key}")
                    self._send(200, {"ok": True})
                else:
                    self._send(404, {"error": "not found"})

        self._server = ThreadingHTTPServer(("127.0.0.1", port), Handler)
        self._thread = threading.Thread(target=self._server.serve_forever, daemon=True)
        self._thread.start()
        return self._server.server_address[1]

    def shutdown(self) -> None:
        if self._server is not None:
            self._server.shutdown()
            self._server.server_close()
        with self._queue_lock:
            if self._queue_started:
                self.kv.stop_queue()  # drains, then joins the thread
                self._queue_started = False
        self.registry.close_all()
