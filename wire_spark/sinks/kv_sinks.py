"""Redis and S3 sink analogs.

The reference README promises redis and s3 sinks (README.md:78-87)
but ships neither (docs-only). Here:

- ``RedisSink``: per-micro-batch SET of each row (key from
  ``id_field``, value = row JSON) speaking real RESP over a pluggable
  transport — the pipelined MSET-style cache-fill shape. Rows are
  rendered to RESP *on executors* (mapInPandas, same distribution
  shape as the Elasticsearch bulk sink); the default transport opens
  one TCP connection per partition chunk.
- S3 needs no bespoke sink in Spark: an object-store path IS a file
  sink. ``s3_sink_config`` maps the reference-style config (bucket/
  prefix/credentials) onto the file sink's path + per-bucket hadoop
  configs (fs.s3a.*) — wiring that is contract-tested; the actual
  s3a filesystem needs the hadoop-aws jars of a real deployment.
"""

from __future__ import annotations

import json
from collections.abc import Callable, Iterator
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: transport(host, port, resp_payload_bytes) -> number of commands acked
RedisTransport = Callable[[str, int, bytes], int]


def encode_resp_set(key: str, value: str) -> bytes:
    """RESP encoding of SET key value (the real wire protocol)."""
    k = key.encode("utf-8")
    v = value.encode("utf-8")
    return (
        b"*3\r\n$3\r\nSET\r\n"
        + b"$" + str(len(k)).encode() + b"\r\n" + k + b"\r\n"
        + b"$" + str(len(v)).encode() + b"\r\n" + v + b"\r\n"
    )


def socket_transport(host: str, port: int, payload: bytes) -> int:
    """Default transport: one pipelined TCP round-trip; counts +OK acks."""
    import socket

    n_cmds = payload.count(b"*3\r\n")
    with socket.create_connection((host, port), timeout=30) as s:
        s.sendall(payload)
        acked = 0
        buf = b""
        while acked < n_cmds:
            chunk = s.recv(65536)
            if not chunk:
                break
            buf += chunk
            acked = buf.count(b"+OK\r\n")
        return acked


class RespRecordingTransport:
    """Dry-run transport: writes each pipelined RESP payload to a file
    instead of a socket (test double / audit, like the Elasticsearch
    RecordingTransport). Picklable — holds only the directory."""

    def __init__(self, directory: str):
        self.directory = directory

    def __call__(self, host: str, port: int, payload: bytes) -> int:
        import os

        fname = os.path.join(
            self.directory, f"p_{os.getpid()}_{abs(hash(payload)) % 10**12}.resp"
        )
        with open(fname, "wb") as f:
            f.write(payload)
        return payload.count(b"*3\r\n")


@dataclass
class RedisSink:
    """SET one key per row, pipelined per partition chunk."""

    host: str = "localhost"
    port: int = 6379
    id_field: str = "_id"
    key_prefix: str = ""
    pipeline_size: int = 500
    transport: RedisTransport = None  # None -> socket_transport

    def write_batch(self, df: DataFrame) -> int:
        if self.id_field not in df.columns:
            raise ValueError(f"id column {self.id_field!r} not in DataFrame")
        rendered = df.select(
            F.col(self.id_field).cast("string").alias("__key"),
            F.to_json(F.struct(*df.columns)).alias("__value"),
        )
        host, port = self.host, self.port
        prefix, chunk_n = self.key_prefix, self.pipeline_size
        transport = self.transport or socket_transport

        def send(batches: Iterator) -> Iterator:
            import pandas as pd

            sent = 0
            payload: list[bytes] = []
            for pdf in batches:
                for key, value in zip(pdf["__key"], pdf["__value"]):
                    if key is None:
                        continue
                    payload.append(encode_resp_set(prefix + key, value))
                    if len(payload) >= chunk_n:
                        sent += transport(host, port, b"".join(payload))
                        payload = []
            if payload:
                sent += transport(host, port, b"".join(payload))
            yield pd.DataFrame({"sent": [sent]})

        counts = rendered.mapInPandas(send, schema="sent long")
        return int(counts.agg(F.sum("sent")).first()[0] or 0)

    def foreach_batch(self):
        def apply(batch_df: DataFrame, batch_id: int) -> None:
            self.write_batch(batch_df)

        return apply


def s3_sink_config(c: dict) -> tuple[str, dict]:
    """Reference-style s3 sink config -> (path, hadoop_confs).

    ``bucket``/``prefix`` -> the s3a path the file sink writes;
    credentials/endpoint -> per-bucket fs.s3a.* settings (per-bucket
    so one session can write multiple stores). ``format`` stays with
    the file sink (json-lines default, like the reference file sink).
    """
    bucket = c["bucket"]
    path = f"s3a://{bucket}/{c.get('prefix', '').strip('/')}"
    hconf = {}
    if "access_key" in c:
        hconf[f"fs.s3a.bucket.{bucket}.access.key"] = c["access_key"]
    if "secret_key" in c:
        hconf[f"fs.s3a.bucket.{bucket}.secret.key"] = c["secret_key"]
    if "endpoint" in c:
        hconf[f"fs.s3a.bucket.{bucket}.endpoint"] = c["endpoint"]
    return path, hconf
