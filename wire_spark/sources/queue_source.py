"""Queue sources (SQS / RabbitMQ): pull-based ingestion into a Spark
file stream.

The reference README promises sqs and rabbitmq sources (README.md:
70-71, AGENTS.md:112-117) but ships neither (docs-only; sources/
holds file/kafka/mongo). Neither protocol has a first-party Spark
connector, so the correct Spark shape is the same landing-zone
pattern as the HTTP/webhook source (sources/http_source.py): a
poller thread drains the queue and spools message batches as
atomically-renamed JSON-lines files; a checkpointed Structured
Streaming file source tails the spool. Delivery is at-least-once
end-to-end: a message is acknowledged (SQS DeleteMessage / AMQP
basic.ack) only AFTER its spool file is durably renamed, so a crash
between receive and ack redelivers rather than loses.

The broker protocol lives behind a pluggable ``QueuePoller``
(receive/ack pair) because this environment has no boto3/pika and no
broker; ``sqs_poller``/``rabbitmq_poller`` construct the real ones
when the client libraries exist, and tests drive the contract with
an in-memory fake. Config keys map from the reference's YAML shapes:
SQS ``queue_url``/``region``/``max_messages``/``wait_seconds``;
RabbitMQ ``host``/``port``/``queue``/``prefetch``.

Scale notes: one poller per pipeline is the control plane; the data
plane (the file stream) scales with Spark. For queue rates beyond a
single poller (~10k msg/s), run N pipeline replicas — both SQS and
AMQP distribute messages across competing consumers natively, and
the spool/checkpoint design needs no change.
"""

from __future__ import annotations

import json
import os
import threading
import uuid
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QueueMessage:
    """One in-flight message: ``body`` is the JSON payload text;
    ``receipt`` is whatever token the broker needs to ack it (SQS
    ReceiptHandle, AMQP delivery-tag)."""

    body: str
    receipt: object = None


class QueuePoller:
    """Broker protocol contract.

    ``receive(max_n)`` returns up to ``max_n`` messages (possibly
    empty — long-poll timeouts are the poller's business);
    ``ack(receipts)`` confirms them after the spool write. Both run
    on the single poller thread, never on executors.
    """

    def receive(self, max_n: int) -> list[QueueMessage]:  # pragma: no cover
        raise NotImplementedError

    def ack(self, receipts: list) -> None:  # pragma: no cover
        raise NotImplementedError


def sqs_poller(c: dict) -> QueuePoller:
    """Reference-style SQS config -> a boto3-backed poller.

    Needs boto3 (absent in this container); the config mapping is the
    tested contract, the boto3 calls are the standard
    receive_message/delete_message_batch pair."""
    try:
        import boto3  # noqa: F401
    except ImportError as e:  # pragma: no cover - env has no boto3
        raise ImportError(
            "sqs source needs boto3; install it or inject poller= "
            "(the QueueSource spool/ack contract is broker-agnostic)"
        ) from e

    class _Sqs(QueuePoller):  # pragma: no cover - needs live AWS
        def __init__(self):
            self.client = boto3.client("sqs", region_name=c.get("region"))
            self.queue_url = c["queue_url"]
            self.wait = int(c.get("wait_seconds", 10))

        def receive(self, max_n: int) -> list[QueueMessage]:
            resp = self.client.receive_message(
                QueueUrl=self.queue_url,
                MaxNumberOfMessages=min(max_n, 10),  # SQS API cap
                WaitTimeSeconds=self.wait,
            )
            return [
                QueueMessage(body=m["Body"], receipt=m["ReceiptHandle"])
                for m in resp.get("Messages", [])
            ]

        def ack(self, receipts: list) -> None:
            for i in range(0, len(receipts), 10):  # batch API cap
                self.client.delete_message_batch(
                    QueueUrl=self.queue_url,
                    Entries=[
                        {"Id": str(j), "ReceiptHandle": r}
                        for j, r in enumerate(receipts[i : i + 10])
                    ],
                )

    return _Sqs()


def rabbitmq_poller(c: dict) -> QueuePoller:
    """Reference-style RabbitMQ config -> a pika-backed poller
    (basic_get + basic_ack). Needs pika (absent here)."""
    try:
        import pika  # noqa: F401
    except ImportError as e:  # pragma: no cover - env has no pika
        raise ImportError(
            "rabbitmq source needs pika; install it or inject poller= "
            "(the QueueSource spool/ack contract is broker-agnostic)"
        ) from e

    class _Amqp(QueuePoller):  # pragma: no cover - needs live broker
        def __init__(self):
            params = pika.ConnectionParameters(
                host=c.get("host", "localhost"), port=int(c.get("port", 5672))
            )
            self.conn = pika.BlockingConnection(params)
            self.chan = self.conn.channel()
            self.chan.basic_qos(prefetch_count=int(c.get("prefetch", 100)))
            self.queue = c["queue"]

        def receive(self, max_n: int) -> list[QueueMessage]:
            out = []
            for _ in range(max_n):
                method, _props, body = self.chan.basic_get(self.queue)
                if method is None:
                    break
                out.append(
                    QueueMessage(body=body.decode("utf-8"),
                                 receipt=method.delivery_tag)
                )
            return out

        def ack(self, receipts: list) -> None:
            for tag in receipts:
                self.chan.basic_ack(tag)

    return _Amqp()


class QueueSource:
    """Poller-driven spool source: ``start()`` launches the drain
    loop; ``read(spark, schema)`` is the checkpointed file stream
    over the spool — the same read side as HttpWebhookSource."""

    def __init__(self, spool_dir: str, poller: QueuePoller,
                 batch_size: int = 100,
                 poll_interval: float = 0.05,
                 on_error: Callable[[Exception], None] | None = None):
        self.spool_dir = spool_dir
        os.makedirs(spool_dir, exist_ok=True)
        self.poller = poller
        self.batch_size = batch_size
        self.poll_interval = poll_interval
        self.on_error = on_error
        self.received = 0
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None

    # -- write side (the drain loop) ---------------------------------

    def _land(self, messages: list[QueueMessage]) -> None:
        """Spool one batch as a JSON-lines file (tmp-write + atomic
        rename, so the stream never reads a partial file), THEN ack —
        the order that makes delivery at-least-once instead of
        at-most-once."""
        fname = f"queue-{uuid.uuid4().hex}.json"
        tmp = os.path.join(self.spool_dir, f".tmp-{fname}")
        with open(tmp, "w") as f:
            for m in messages:
                # non-JSON bodies are wrapped, not dropped: the DLQ
                # decision belongs downstream, not in the ingest loop.
                # Valid JSON is RE-serialized, never written verbatim:
                # a pretty-printed (newline-containing) body would
                # otherwise span multiple physical lines of the
                # line-delimited spool and corrupt records that are
                # already acked.
                try:
                    f.write(json.dumps(json.loads(m.body)) + "\n")
                except ValueError:
                    f.write(json.dumps({"_raw": m.body}) + "\n")
        os.rename(tmp, os.path.join(self.spool_dir, fname))
        self.poller.ack([m.receipt for m in messages])
        self.received += len(messages)

    def drain_once(self) -> int:
        """One receive -> spool -> ack round; returns messages landed.
        Public so tests (and cron-style batch ingestion) can run the
        loop body synchronously."""
        messages = self.poller.receive(self.batch_size)
        if messages:
            self._land(messages)
        return len(messages)

    def _loop(self) -> None:
        while not self._stop.is_set():
            try:
                n = self.drain_once()
            except Exception as e:  # keep polling; surface via hook
                if self.on_error is not None:
                    self.on_error(e)
                n = 0
            if n == 0:
                self._stop.wait(self.poll_interval)

    def start(self) -> None:
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=10)

    # -- read side (the Spark stream) --------------------------------

    def read(self, spark: SparkSession, schema: str) -> DataFrame:
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "100")
            .json(self.spool_dir)
        )
