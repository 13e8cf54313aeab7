"""Elasticsearch sink: bulk-REST indexing via foreachBatch.

Reference: ``ElasticSink`` (sinks/elasticsearch.go:61-135) — each
incoming JSON document is wrapped as ``{"doc": <original>}``, the
document id is extracted from ``doc._id`` (records without one are
skipped, log-and-continue), and the wrapped body is indexed into
``index_name`` with ``refresh`` so it is immediately searchable. The
reference indexes one-request-per-document synchronously; here each
micro-batch partition streams its rows through the ES ``_bulk`` API in
``bulk_size`` chunks — the idiomatic Spark shape (and what the es-
hadoop connector does under the hood with ``es.mapping.id``).

The HTTP layer is a pluggable ``transport`` callable so the sink is
unit-testable without a live cluster (no ES in this environment); the
default transport POSTs NDJSON to ``{url}/_bulk`` with urllib.

Scale notes: serialization (``to_json(struct(*))``) is JVM-side; the
Python layer only concatenates pre-rendered strings into NDJSON
chunks inside ``mapInPandas`` (Arrow-batched, one transport round-trip
per ``bulk_size`` docs per partition). Parallelism = #partitions of
the micro-batch; back-pressure comes from micro-batch pacing.
"""

from __future__ import annotations

import json
from collections.abc import Callable, Iterator
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: transport(url, ndjson_body_str, headers) -> response dict (_bulk shape)
Transport = Callable[[str, str, dict], dict]


def http_transport(url: str, body: str, headers: dict | None = None) -> dict:
    """Default transport: POST NDJSON to the ES bulk endpoint with the
    sink-supplied headers (Content-Type + optional ApiKey auth)."""
    import urllib.request

    req = urllib.request.Request(
        url,
        data=body.encode("utf-8"),
        headers=headers or {"Content-Type": "application/x-ndjson"},
        method="POST",
    )
    with urllib.request.urlopen(req) as resp:  # noqa: S310 (caller-supplied URL)
        return json.loads(resp.read().decode("utf-8"))


class RecordingTransport:
    """Dry-run transport: writes each bulk request (URL + NDJSON body)
    to a file in ``directory`` instead of POSTing it — the audit/debug
    analog of the factory's console/noop sinks, and the unit-test
    double for environments without an ES cluster. Picklable (holds
    only the directory path), so it ships to executors."""

    def __init__(self, directory: str):
        self.directory = directory

    def __call__(self, url: str, body: str, headers: dict | None = None) -> dict:
        import os
        import uuid

        # uuid, not hash(body): identical payloads must not overwrite
        # each other's recording (delivery counts would silently drop)
        fname = os.path.join(
            self.directory, f"bulk_{os.getpid()}_{uuid.uuid4().hex}.ndjson"
        )
        with open(fname, "w") as f:
            f.write(url + "\n")
            f.write(json.dumps(headers or {}) + "\n")
            f.write(body)
        return {"errors": False, "items": []}


@dataclass
class ElasticsearchSink:
    """Bulk indexer for DataFrames whose rows are the documents.

    ``id_field``: column holding the document id (the reference's
    ``doc._id``); rows where it is NULL are skipped, mirroring the
    reference's missing-``_id`` log-and-continue.
    """

    index: str
    url: str = "http://localhost:9200"
    api_key: str | None = None
    id_field: str = "_id"
    bulk_size: int = 500
    refresh: bool = True
    transport: Transport = None  # None -> http_transport

    def _bulk_url(self) -> str:
        refresh = "true" if self.refresh else "false"
        return f"{self.url.rstrip('/')}/_bulk?refresh={refresh}"

    def write_batch(self, df: DataFrame) -> int:
        """Index every row of ``df``; returns docs actually sent
        (rows lacking ``id_field`` are skipped)."""
        if self.id_field not in df.columns:
            raise ValueError(
                f"id column {self.id_field!r} not in DataFrame; the reference "
                "extracts the document id from doc._id (elasticsearch.go:99-104)"
            )
        rendered = df.select(
            F.col(self.id_field).cast("string").alias("__es_id"),
            # the reference wraps the original document as {"doc": ...}
            # (elasticsearch.go:75) and indexes the wrapped body
            F.to_json(F.struct(F.struct(*df.columns).alias("doc"))).alias("__es_body"),
        )
        index, bulk_size = self.index, self.bulk_size
        transport = self.transport or http_transport
        url = self._bulk_url()
        # auth travels as a pre-built header set — the reference passes
        # APIKey into its ES client config (elasticsearch.go:35,46)
        headers = {"Content-Type": "application/x-ndjson"}
        if self.api_key:
            headers["Authorization"] = f"ApiKey {self.api_key}"

        def send(batches: Iterator) -> Iterator:
            import pandas as pd

            sent = 0
            actions: list[str] = []
            for pdf in batches:
                for es_id, body in zip(pdf["__es_id"], pdf["__es_body"]):
                    if es_id is None:
                        continue  # missing _id -> skip (go:101-104)
                    actions.append(
                        json.dumps({"index": {"_index": index, "_id": es_id}})
                    )
                    actions.append(body)
                    if len(actions) >= 2 * bulk_size:
                        transport(url, "\n".join(actions) + "\n", headers)
                        sent += len(actions) // 2
                        actions = []
            if actions:
                transport(url, "\n".join(actions) + "\n", headers)
                sent += len(actions) // 2
            yield pd.DataFrame({"sent": [sent]})

        counts = rendered.mapInPandas(send, schema="sent long")
        return int(counts.agg(F.sum("sent")).first()[0] or 0)

    def foreach_batch(self):
        """Adapter for ``writeStream.foreachBatch`` — the streaming
        path the reference's channel loop corresponds to."""

        def apply(batch_df: DataFrame, batch_id: int) -> None:
            self.write_batch(batch_df)

        return apply
