"""Connector contract tests: Kafka option/serialization wiring and the
Elasticsearch bulk sink, exercised without a broker/cluster (none in
this environment) via pure option mappings and a recording transport.
These fail if topic/offset/value wiring or the bulk/doc-id protocol
regresses."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from wire_spark.model import SinkConfig, SourceConfig
from wire_spark.sinks.elasticsearch import ElasticsearchSink, RecordingTransport
from wire_spark.sinks.factory import data_sink_factory, kafka_frame, kafka_write_options
from wire_spark.sources.factory import data_source_factory, kafka_read_options


# --------------------------------------------------------------------
# kafka: option mapping + value serialization contracts
# --------------------------------------------------------------------

def test_kafka_read_option_contract():
    """Reference consumer semantics (sources/kafka.go:30-67,185-193):
    topic subscription, broker list, and load_initial_data -> replay
    from earliest."""
    opts = kafka_read_options(
        {"bootstrap_servers": "b1:9092,b2:9092", "topic": "events"}
    )
    assert opts == {
        "kafka.bootstrap.servers": "b1:9092,b2:9092",
        "subscribe": "events",
        "startingOffsets": "earliest",  # default load_initial_data=true
    }
    assert kafka_read_options(
        {"bootstrap_servers": "b", "topic": "t", "load_initial_data": "false"}
    )["startingOffsets"] == "latest"


def test_kafka_write_option_contract():
    opts = kafka_write_options({"bootstrap_servers": "b:9092", "topic": "out"})
    assert opts == {"kafka.bootstrap.servers": "b:9092", "topic": "out"}


def test_kafka_frame_wire_format_roundtrip(spark):
    """The sink serializes rows to a single `value` JSON column (the
    reference produces raw JSON bytes, sinks/kafka.go:62-76); values
    must round-trip through from_json losslessly."""
    df = spark.createDataFrame([(1, "a"), (2, "b")], ["id", "name"])
    framed = kafka_frame(df)
    assert framed.columns == ["value"]  # kafka writer contract
    back = framed.select(
        F.from_json("value", "id bigint, name string").alias("r")
    ).select("r.*")
    assert sorted(map(tuple, back.collect())) == [(1, "a"), (2, "b")]
    # already-framed input passes through untouched
    assert kafka_frame(framed) is framed


def test_kafka_source_sink_factory_accept_config():
    src = data_source_factory(
        SourceConfig(name="s", type="kafka", key="k",
                     config={"bootstrap_servers": "b:9092", "topic": "t"})
    )
    assert src.cfg.type == "kafka"
    sink = data_sink_factory(
        SinkConfig(name="s", type="kafka", key="k",
                   config={"bootstrap_servers": "b:9092", "topic": "t"})
    )
    assert sink.cfg.type == "kafka"


# --------------------------------------------------------------------
# elasticsearch: bulk protocol against a recording transport
# --------------------------------------------------------------------

def _read_requests(directory: str):
    """RecordingTransport file layout: url line, headers-json line,
    then NDJSON body lines."""
    reqs = []
    for fname in sorted(os.listdir(directory)):
        with open(os.path.join(directory, fname)) as f:
            lines = f.read().splitlines()
        reqs.append((lines[0], lines[2:]))
    return reqs


def _read_headers(directory: str):
    headers = []
    for fname in sorted(os.listdir(directory)):
        with open(os.path.join(directory, fname)) as f:
            headers.append(json.loads(f.read().splitlines()[1]))
    return headers


def test_es_sink_bulk_protocol(spark, tmp_path):
    """Doc-id extraction from _id, {"doc": ...} body wrapping, bulk
    NDJSON framing, refresh flag — sinks/elasticsearch.go:61-135."""
    rec_dir = str(tmp_path / "reqs")
    os.makedirs(rec_dir)
    df = spark.createDataFrame(
        [("d1", "alpha", 1), ("d2", "beta", 2), (None, "skipped", 3)],
        ["_id", "name", "rank"],
    ).repartition(1)
    sink = ElasticsearchSink(
        index="docs", url="http://es:9200", transport=RecordingTransport(rec_dir)
    )
    sent = sink.write_batch(df)
    assert sent == 2  # NULL _id row skipped, log-and-continue parity

    reqs = _read_requests(rec_dir)
    assert len(reqs) == 1
    url, lines = reqs[0]
    assert url == "http://es:9200/_bulk?refresh=true"  # go:117 Refresh
    assert len(lines) == 4  # 2 docs x (action + body)
    actions = [json.loads(lines[i]) for i in (0, 2)]
    bodies = [json.loads(lines[i]) for i in (1, 3)]
    assert {a["index"]["_id"] for a in actions} == {"d1", "d2"}
    assert all(a["index"]["_index"] == "docs" for a in actions)
    # body wraps the original document as {"doc": {...}} (go:75)
    by_id = {b["doc"]["_id"]: b["doc"] for b in bodies}
    assert by_id["d1"]["name"] == "alpha" and by_id["d1"]["rank"] == 1


def test_es_sink_bulk_chunking(spark, tmp_path):
    """bulk_size bounds each request: 7 docs at bulk_size=3 on one
    partition -> requests of 3+3+1."""
    rec_dir = str(tmp_path / "reqs2")
    os.makedirs(rec_dir)
    df = (
        spark.range(7)
        .select(F.concat(F.lit("id"), "id").alias("_id"), F.col("id").alias("n"))
        .repartition(1)
    )
    sink = ElasticsearchSink(
        index="i", transport=RecordingTransport(rec_dir), bulk_size=3
    )
    assert sink.write_batch(df) == 7
    sizes = sorted(len(lines) // 2 for _, lines in _read_requests(rec_dir))
    assert sizes == [1, 3, 3]


def test_es_sink_missing_id_column_raises(spark):
    df = spark.createDataFrame([("x",)], ["name"])
    with pytest.raises(ValueError, match="_id"):
        ElasticsearchSink(index="i", transport=lambda u, b, h=None: {}).write_batch(df)


def test_es_sink_api_key_authorization_header(spark, tmp_path):
    """A configured api_key must reach the wire as an Authorization
    header — the reference passes APIKey into its ES client config
    (sinks/elasticsearch.go:35,46); without the header every bulk
    write against a secured cluster fails 401."""
    rec_dir = str(tmp_path / "reqs_auth")
    os.makedirs(rec_dir)
    df = spark.createDataFrame([("d1", 1)], ["_id", "v"]).repartition(1)
    ElasticsearchSink(
        index="i", api_key="c2VjcmV0", transport=RecordingTransport(rec_dir)
    ).write_batch(df)
    (headers,) = _read_headers(rec_dir)
    assert headers["Authorization"] == "ApiKey c2VjcmV0"
    assert headers["Content-Type"] == "application/x-ndjson"
    # and no api_key -> no Authorization header at all
    rec2 = str(tmp_path / "reqs_noauth")
    os.makedirs(rec2)
    ElasticsearchSink(index="i", transport=RecordingTransport(rec2)).write_batch(df)
    (h2,) = _read_headers(rec2)
    assert "Authorization" not in h2


def test_es_sink_streaming_foreach_batch(spark, tmp_path):
    """The factory's elasticsearch type drives foreachBatch end-to-end
    on a real (file) stream."""
    rec_dir = str(tmp_path / "reqs3")
    os.makedirs(rec_dir)
    src_dir = str(tmp_path / "in")
    os.makedirs(src_dir)
    with open(os.path.join(src_dir, "a.json"), "w") as f:
        f.write('{"_id": "s1", "v": 10}\n{"_id": "s2", "v": 20}\n')

    src = data_source_factory(
        SourceConfig(name="src", type="json", key="k", config={"path": src_dir})
    ).read(spark)
    sink = data_sink_factory(
        SinkConfig(
            name="es", key="k", type="elasticsearch",
            config={
                "index_name": "stream_docs",
                "transport": RecordingTransport(rec_dir),
                "checkpoint": str(tmp_path / "ckpt"),
            },
        )
    )
    q = sink.write(src, "es_stream", available_now=True)
    q.awaitTermination(60)

    ids = set()
    for _, lines in _read_requests(rec_dir):
        for i in range(0, len(lines), 2):
            ids.add(json.loads(lines[i])["index"]["_id"])
    assert ids == {"s1", "s2"}


# --------------------------------------------------------------------
# http/webhook source: POST -> spool -> stream
# --------------------------------------------------------------------

def test_http_webhook_source_end_to_end(spark, tmp_path):
    """POSTed JSON events land atomically in the spool and arrive
    through a checkpointed file stream (the reference README promises
    an HTTP source, README.md:67-75; docs-only there)."""
    import urllib.request

    from wire_spark.sources.http_source import HttpWebhookSource

    spool = str(tmp_path / "spool")
    src = HttpWebhookSource(spool)
    port = src.start()
    try:
        def post(payload):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/webhook",
                data=json.dumps(payload).encode(),
                headers={"Content-Type": "application/json"},
                method="POST",
            )
            with urllib.request.urlopen(req) as r:
                return json.loads(r.read())

        assert post({"user": "u1", "n": 1}) == {"accepted": 1}
        assert post([{"user": "u2", "n": 2}, {"user": "u3", "n": 3}]) == {"accepted": 2}
        assert src.received == 3

        # malformed json -> 400, nothing lands
        bad = urllib.request.Request(
            f"http://127.0.0.1:{port}/webhook", data=b"{not json",
            method="POST",
        )
        try:
            urllib.request.urlopen(bad)
            raise AssertionError("expected HTTP 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400

        stream = src.read(spark, "user STRING, n BIGINT")
        assert stream.isStreaming
        q = (
            stream.writeStream.format("memory")
            .queryName("webhook_rows")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(60)
        rows = {(r.user, r.n) for r in spark.sql("SELECT * FROM webhook_rows").collect()}
        assert rows == {("u1", 1), ("u2", 2), ("u3", 3)}
    finally:
        src.stop()


def test_http_source_via_factory(spark, tmp_path):
    from wire_spark.sources.http_source import HttpWebhookSource

    spool = str(tmp_path / "spool2")
    src_obj = HttpWebhookSource(spool)
    df = data_source_factory(
        SourceConfig(name="wh", type="webhook", key="k",
                     config={"spool_dir": spool, "schema": "a STRING",
                             "_source": src_obj})
    ).read(spark)
    assert df.isStreaming and df.columns == ["a"]


# --------------------------------------------------------------------
# redis sink: RESP protocol against a recording transport
# --------------------------------------------------------------------

def test_redis_resp_encoding():
    from wire_spark.sinks.kv_sinks import encode_resp_set

    assert encode_resp_set("k", "v") == b"*3\r\n$3\r\nSET\r\n$1\r\nk\r\n$1\r\nv\r\n"
    # length-prefixed, so values with CRLF/unicode survive
    assert b"$6\r\na\r\nb\xc3\xa9\r\n" in encode_resp_set("x", "a\r\nb\xe9")


def test_redis_sink_pipelined_sets(spark, tmp_path):
    from wire_spark.sinks.kv_sinks import RedisSink, RespRecordingTransport

    rec_dir = str(tmp_path / "resp")
    os.makedirs(rec_dir)
    df = spark.createDataFrame(
        [("a", 1), ("b", 2), ("c", 3)], ["_id", "n"]
    ).repartition(1)
    sink = RedisSink(key_prefix="doc:", transport=RespRecordingTransport(rec_dir))
    assert sink.write_batch(df) == 3

    blobs = b"".join(
        open(os.path.join(rec_dir, f), "rb").read() for f in sorted(os.listdir(rec_dir))
    )
    assert blobs.count(b"*3\r\n$3\r\nSET\r\n") == 3
    assert b"doc:a" in blobs and b"doc:c" in blobs
    assert b'{"_id":"a","n":1}' in blobs


def test_resp_command_count_immune_to_lookalike_bytes():
    """Command counting must walk RESP framing: a VALUE containing the
    literal b'*3\\r\\n' must not inflate the expected reply count."""
    from wire_spark.sinks.kv_sinks import count_resp_commands, encode_resp_set

    payload = encode_resp_set("k1", "evil *3\r\n$3\r\nSET\r\n value") + \
        encode_resp_set("k2", "plain")
    assert count_resp_commands(payload) == 2
    assert payload.count(b"*3\r\n") == 3  # the naive count would hang the recv loop


def test_resp_reply_parser_counts_and_errors():
    from wire_spark.sinks.kv_sinks import parse_resp_replies

    done, ok, errs, rest = parse_resp_replies(
        b"+OK\r\n-ERR wrong type\r\n:1\r\n$2\r\nhi\r\n$-1\r\n+OK"
    )
    assert (done, ok) == (5, 4)
    assert errs == ["ERR wrong type"]
    assert rest == b"+OK"  # partial reply preserved for the next recv


def test_socket_transport_against_fake_redis():
    """End-to-end over a real socket: a fake Redis acks each framed
    command; error replies raise with context instead of hanging."""
    import socket
    import threading

    from wire_spark.sinks.kv_sinks import (
        count_resp_commands,
        encode_resp_set,
        socket_transport,
    )

    def serve(listener, replies):
        conn, _ = listener.accept()
        with conn:
            buf = b""
            expected = None
            while True:
                chunk = conn.recv(65536)
                if not chunk:
                    return
                buf += chunk
                try:
                    expected = count_resp_commands(buf)
                except (ValueError, IndexError):
                    continue  # partial frame
                conn.sendall(b"".join(replies(expected)))
                return

    def run(payload, replies):
        listener = socket.socket()
        listener.bind(("127.0.0.1", 0))
        listener.listen(1)
        port = listener.getsockname()[1]
        t = threading.Thread(target=serve, args=(listener, replies), daemon=True)
        t.start()
        try:
            return socket_transport("127.0.0.1", port, payload)
        finally:
            t.join(timeout=10)
            listener.close()

    payload = encode_resp_set("a", "has *3\r\n inside") + encode_resp_set("b", "v")
    assert run(payload, lambda n: [b"+OK\r\n"] * n) == 2

    with pytest.raises(RuntimeError, match="rejected 1/2.*READONLY"):
        run(payload, lambda n: [b"+OK\r\n", b"-READONLY replica\r\n"])


def test_s3_sink_config_mapping(spark, tmp_path):
    """s3 config -> s3a path + per-bucket credentials; streaming write
    proven via the path override (no hadoop-aws jars in the sandbox)."""
    from wire_spark.sinks.kv_sinks import s3_sink_config

    path, hconf = s3_sink_config(
        {"bucket": "corpus", "prefix": "v1/docs", "access_key": "AK",
         "secret_key": "SK", "endpoint": "http://minio:9000"}
    )
    assert path == "s3a://corpus/v1/docs"
    assert hconf == {
        "fs.s3a.bucket.corpus.access.key": "AK",
        "fs.s3a.bucket.corpus.secret.key": "SK",
        "fs.s3a.bucket.corpus.endpoint": "http://minio:9000",
    }

    out_dir = str(tmp_path / "out")
    src_dir = str(tmp_path / "in")
    os.makedirs(src_dir)
    with open(os.path.join(src_dir, "a.json"), "w") as f:
        f.write('{"x": 1}\n')
    src = data_source_factory(
        SourceConfig(name="s", type="json", key="k", config={"path": src_dir})
    ).read(spark)
    sink = data_sink_factory(
        SinkConfig(name="s3", key="k", type="s3",
                   config={"bucket": "corpus", "prefix": "v1/docs",
                           "access_key": "AK", "secret_key": "SK",
                           "path_override": out_dir,
                           "checkpoint": str(tmp_path / "ck")})
    )
    q = sink.write(src, "s3_stream", available_now=True)
    q.awaitTermination(60)
    rows = spark.read.json(out_dir).collect()
    assert [r.x for r in rows] == [1]
    # credentials landed in the hadoop conf
    jconf = spark._jsc.hadoopConfiguration()
    assert jconf.get("fs.s3a.bucket.corpus.access.key") == "AK"
