"""MongoDB and HTTP/webhook sink analogs.

The reference README promises mongodb, http, and webhook sinks
(README.md:77-87) but ships none of them (docs-only; sinks/ holds
only file/kafka/elasticsearch). Spark-first shapes:

- ``MongoSink``: per-micro-batch bulk insert. Rows are rendered to
  JSON documents JVM-side (``to_json(struct(*))``); executors chunk
  them (``bulk_size`` docs per round trip) through a pluggable
  transport — the same distribution shape as the Elasticsearch bulk
  sink (one transport call per chunk per partition). The default
  transport uses pymongo if installed (not in this environment) and
  raises a clear error otherwise; tests inject a recording transport.
  A real cluster deployment would instead use the mongo-spark
  connector (``format("mongodb")``), which this sink's option surface
  mirrors (connection/database/collection).

- ``WebhookSink``: per-micro-batch HTTP delivery. ``batch_size=1``
  POSTs each row's JSON document individually (classic webhook
  contract); larger values POST JSON arrays (the scale form — at
  100 TB you never want an HTTP round trip per row). Same pluggable
  transport pattern; the default POSTs with urllib. Covers both the
  README's ``http`` ("Send via HTTP") and ``webhook`` ("Send
  webhooks") sink types.
"""

from __future__ import annotations

import json
from collections.abc import Callable, Iterator
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: transport(connection, database, collection, [doc_json, ...]) -> n inserted
MongoTransport = Callable[[str, str, str, list], int]

#: transport(url, body_str, headers) -> HTTP status code
HttpTransport = Callable[[str, str, dict], int]


def pymongo_transport(connection: str, database: str, collection: str,
                      docs: list) -> int:
    """Default Mongo transport: insert_many via pymongo (absent in
    this container — deployments either install it or use the
    mongo-spark connector)."""
    try:
        import pymongo  # noqa: F401
    except ImportError as e:  # pragma: no cover - env has no pymongo
        raise ImportError(
            "MongoSink's default transport needs pymongo; install it or "
            "pass transport= (deployments on a real cluster should prefer "
            "the mongo-spark connector, format('mongodb'))"
        ) from e
    client = pymongo.MongoClient(connection)  # pragma: no cover
    try:  # pragma: no cover
        res = client[database][collection].insert_many(
            [json.loads(d) for d in docs]
        )
        return len(res.inserted_ids)
    finally:  # pragma: no cover
        client.close()


def urllib_transport(url: str, body: str, headers: dict | None = None) -> int:
    """Default webhook transport: POST JSON, return status code."""
    import urllib.request

    req = urllib.request.Request(
        url,
        data=body.encode("utf-8"),
        headers=headers or {"Content-Type": "application/json"},
        method="POST",
    )
    with urllib.request.urlopen(req) as resp:  # noqa: S310 (caller-supplied URL)
        return resp.status


class MongoRecordingTransport:
    """Test double: appends each bulk-insert request to a file in
    ``directory`` instead of talking to a server. Picklable (path
    only), so it ships to executors — same pattern as the ES/Redis
    recording transports."""

    def __init__(self, directory: str):
        self.directory = directory

    def __call__(self, connection: str, database: str, collection: str,
                 docs: list) -> int:
        import os
        import uuid

        # uuid component: hash(payload) alone would make two calls
        # with identical payloads overwrite each other's recording
        # (PYTHONHASHSEED is pinned under PySpark), silently
        # undercounting deliveries in tests
        fname = os.path.join(
            self.directory,
            f"mongo_{os.getpid()}_{uuid.uuid4().hex}.jsonl",
        )
        with open(fname, "w") as f:
            f.write(json.dumps(
                {"connection": connection, "database": database,
                 "collection": collection}) + "\n")
            for d in docs:
                f.write(d + "\n")
        return len(docs)


class WebhookRecordingTransport:
    """Test double: writes each delivery (URL, headers, body) to a
    file instead of POSTing."""

    def __init__(self, directory: str):
        self.directory = directory

    def __call__(self, url: str, body: str, headers: dict | None = None) -> int:
        import os
        import uuid

        fname = os.path.join(
            self.directory, f"hook_{os.getpid()}_{uuid.uuid4().hex}.json"
        )
        with open(fname, "w") as f:
            f.write(url + "\n")
            f.write(json.dumps(headers or {}) + "\n")
            f.write(body)
        return 200


@dataclass
class MongoSink:
    """Bulk document inserter: each row becomes one JSON document."""

    connection: str
    database: str
    collection: str
    bulk_size: int = 500
    transport: MongoTransport = None  # None -> pymongo_transport

    def write_batch(self, df: DataFrame) -> int:
        rendered = df.select(
            F.to_json(F.struct(*df.columns)).alias("__doc")
        )
        conn, db, coll = self.connection, self.database, self.collection
        bulk_size = self.bulk_size
        transport = self.transport or pymongo_transport

        def send(batches: Iterator) -> Iterator:
            import pandas as pd

            sent = 0
            chunk: list = []
            for pdf in batches:
                for doc in pdf["__doc"]:
                    chunk.append(doc)
                    if len(chunk) >= bulk_size:
                        sent += transport(conn, db, coll, chunk)
                        chunk = []
            if chunk:
                sent += transport(conn, db, coll, chunk)
            yield pd.DataFrame({"sent": [sent]})

        counts = rendered.mapInPandas(send, schema="sent long")
        return int(counts.agg(F.sum("sent")).first()[0] or 0)

    def foreach_batch(self):
        def apply(batch_df: DataFrame, batch_id: int) -> None:
            self.write_batch(batch_df)

        return apply


@dataclass
class WebhookSink:
    """HTTP delivery of row documents: one POST per row
    (``batch_size=1``) or per JSON-array chunk (``batch_size>1``)."""

    url: str
    batch_size: int = 1
    headers: dict | None = None
    transport: HttpTransport = None  # None -> urllib_transport

    def write_batch(self, df: DataFrame) -> int:
        rendered = df.select(
            F.to_json(F.struct(*df.columns)).alias("__doc")
        )
        url, batch_size = self.url, self.batch_size
        headers = dict(self.headers or {"Content-Type": "application/json"})
        transport = self.transport or urllib_transport

        def send(batches: Iterator) -> Iterator:
            import pandas as pd

            sent = 0
            chunk: list = []
            for pdf in batches:
                for doc in pdf["__doc"]:
                    if batch_size <= 1:
                        transport(url, doc, headers)
                        sent += 1
                        continue
                    chunk.append(doc)
                    if len(chunk) >= batch_size:
                        transport(url, "[" + ",".join(chunk) + "]", headers)
                        sent += len(chunk)
                        chunk = []
            if chunk:
                transport(url, "[" + ",".join(chunk) + "]", headers)
                sent += len(chunk)
            yield pd.DataFrame({"sent": [sent]})

        counts = rendered.mapInPandas(send, schema="sent long")
        return int(counts.agg(F.sum("sent")).first()[0] or 0)

    def foreach_batch(self):
        def apply(batch_df: DataFrame, batch_id: int) -> None:
            self.write_batch(batch_df)

        return apply
