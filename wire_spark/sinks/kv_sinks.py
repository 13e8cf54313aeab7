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


def count_resp_commands(payload: bytes) -> int:
    """Count top-level commands by walking the RESP framing itself
    (array headers + length-prefixed bulk strings) — immune to key or
    value bytes that happen to contain the literal ``*3\\r\\n``."""
    i, n, size = 0, 0, len(payload)
    while i < size:
        if payload[i : i + 1] != b"*":
            raise ValueError(f"malformed RESP command frame at byte {i}")
        j = payload.index(b"\r\n", i)
        n_items = int(payload[i + 1 : j])
        i = j + 2
        for _ in range(n_items):
            if payload[i : i + 1] != b"$":
                raise ValueError(f"expected bulk string at byte {i}")
            j = payload.index(b"\r\n", i)
            i = j + 2 + int(payload[i + 1 : j]) + 2  # skip declared bytes + CRLF
        n += 1
    return n


def parse_resp_replies(buf: bytes) -> tuple[int, int, list[str], bytes]:
    """Parse complete RESP replies from ``buf``.

    Returns ``(n_complete, n_ok, errors, rest)``: total complete
    replies consumed, how many were non-error (+simple/:int/$bulk),
    the error-reply messages, and the unconsumed tail (a partial
    reply awaiting more bytes).
    """
    i, n_complete, n_ok = 0, 0, 0
    errors: list[str] = []
    size = len(buf)
    while i < size:
        t = buf[i : i + 1]
        j = buf.find(b"\r\n", i)
        if j < 0:
            break  # partial reply — need more bytes
        if t in (b"+", b":"):
            n_ok += 1
            i = j + 2
        elif t == b"-":
            errors.append(buf[i + 1 : j].decode("utf-8", "replace"))
            i = j + 2
        elif t == b"$":
            blen = int(buf[i + 1 : j])
            if blen == -1:
                n_ok += 1
                i = j + 2
            else:
                end = j + 2 + blen + 2
                if size < end:
                    break
                n_ok += 1
                i = end
        else:
            raise ValueError(f"unexpected RESP reply type {t!r} at byte {i}")
        n_complete += 1
    return n_complete, n_ok, errors, buf[i:]


def socket_transport(host: str, port: int, payload: bytes) -> int:
    """Default transport: one pipelined TCP round-trip.

    Replies are parsed as real RESP (not substring-counted), so
    values containing protocol-lookalike bytes cannot skew the
    expected count, and ``-ERR`` replies fail fast with context
    instead of blocking the task until the socket timeout.
    """
    import socket

    n_cmds = count_resp_commands(payload)
    with socket.create_connection((host, port), timeout=30) as s:
        s.sendall(payload)
        replied, acked = 0, 0
        errors: list[str] = []
        buf = b""
        while replied < n_cmds:
            chunk = s.recv(65536)
            if not chunk:
                break  # server closed early; report what we got
            buf += chunk
            done, ok, errs, buf = parse_resp_replies(buf)
            replied += done
            acked += ok
            errors.extend(errs)
        if errors:
            shown = "; ".join(errors[:3])
            raise RuntimeError(
                f"redis rejected {len(errors)}/{n_cmds} commands "
                f"(first errors: {shown})"
            )
        return acked


class RespRecordingTransport:
    """Dry-run transport: writes each pipelined RESP payload to a file
    instead of a socket (test double / audit, like the Elasticsearch
    RecordingTransport). Picklable — holds only the directory."""

    def __init__(self, directory: str):
        self.directory = directory

    def __call__(self, host: str, port: int, payload: bytes) -> int:
        import os
        import uuid

        fname = os.path.join(
            self.directory, f"p_{os.getpid()}_{uuid.uuid4().hex}.resp"
        )
        with open(fname, "wb") as f:
            f.write(payload)
        return count_resp_commands(payload)


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
