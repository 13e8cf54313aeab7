"""Streaming pipeline lifecycle, mirroring pipeline_test.go:103-485:
create/run/show/close, error paths, and data flow through a running
pipeline — file source -> transform -> sink with availableNow."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from wire_spark.model import SinkConfig, SourceConfig
from wire_spark.pipeline import Pipeline, PipelineRegistry, repartition_stage
from wire_spark.sinks import data_sink_factory
from wire_spark.sources import data_source_factory
from wire_spark.transforms import uppercase_json_string
from wire_spark.streaming.windows import tumbling_agg


def _write_jsonl(path, rows):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


@pytest.fixture()
def events_dir(tmp_path):
    d = str(tmp_path / "in")
    _write_jsonl(
        os.path.join(d, "batch0.json"),
        [
            {"id": 1, "name": "alice", "eventTime": "2024-03-01T10:00:00Z", "v": 1.5},
            {"id": 2, "name": "bob", "eventTime": "2024-03-01T10:30:00Z", "v": 2.5},
            {"id": 3, "name": "carol", "eventTime": "2024-03-01T11:10:00Z", "v": 3.0},
        ],
    )
    return d


def test_pipeline_end_to_end_file_to_file(spark, events_dir, tmp_path):
    """The reference's only real pipeline: source -> uppercase ->
    JSON-lines file sink (pipeline.go:169 + sinks/file.go:75-123)."""
    out_dir = str(tmp_path / "out")
    src = data_source_factory(
        SourceConfig(name="files-in", type="file", key="p1", config={"path": events_dir})
    )
    snk = data_sink_factory(
        SinkConfig(
            name="files-out", type="file", key="p1",
            config={"path": out_dir, "checkpoint": str(tmp_path / "ckpt")},
        )
    )
    pipe = Pipeline(source=src, sink=snk, key="p1")
    pipe.add_operation(
        lambda df: df.withColumn("name", F.upper("name"))
    ).add_operation(repartition_stage(2, "id"))

    assert pipe.show() == "files-in -> files-out"

    q = pipe.run(spark, available_now=True)
    q.awaitTermination(60)
    assert not pipe.is_active

    out = spark.read.json(out_dir)
    names = {r.name for r in out.select("name").collect()}
    assert names == {"ALICE", "BOB", "CAROL"}


def test_pipeline_uppercase_json_payload(spark, tmp_path):
    """Schemaless payload path: JSON strings through the pandas-UDF
    recursive uppercase (the Beam ParDo analog, transform.go:192-215)."""
    in_dir = str(tmp_path / "in")
    _write_jsonl(
        os.path.join(in_dir, "a.json"),
        [{"payload": json.dumps({"msg": "hello", "tags": ["a", "b"]})}],
    )
    src = data_source_factory(
        SourceConfig(name="s", type="file", key="k", config={"path": in_dir})
    )
    df = src.read(spark)
    out_q = (
        df.select(uppercase_json_string("payload").alias("payload"))
        .writeStream.format("memory")
        .queryName("upper_mem")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    out_q.awaitTermination(60)
    rows = spark.sql("SELECT * FROM upper_mem").collect()
    assert json.loads(rows[0].payload) == {"msg": "HELLO", "tags": ["A", "B"]}


def test_registry_lifecycle(spark, events_dir, tmp_path):
    """Key pairing, duplicate-key update, close-by-key
    (config.go:90-214); missing-half errors (pipeline_test.go error
    paths)."""
    reg = PipelineRegistry(spark)
    reg.add_source(SourceConfig(name="src-a", type="file", key="k1", config={"path": events_dir}))
    with pytest.raises(KeyError):
        reg.create("k1")  # sink missing
    with pytest.raises(KeyError):
        reg.create("nope")  # source missing
    reg.add_sink(
        SinkConfig(name="sink-a", type="memory", key="k1",
                   config={"checkpoint": str(tmp_path / "c1")})
    )
    reg.create("k1")
    assert reg.show() == {"k1": "src-a -> sink-a"}

    # duplicate-key registration updates the mapping (config.go:99-114)
    reg.add_sink(
        SinkConfig(name="sink-b", type="memory", key="k1",
                   config={"checkpoint": str(tmp_path / "c2")})
    )
    reg.create("k1")
    assert reg.show() == {"k1": "src-a -> sink-b"}

    q = reg.run("k1", available_now=True)
    q.awaitTermination(60)
    reg.close("k1")
    assert reg.active() == {}


def test_registry_persistence_roundtrip(spark, events_dir):
    """Config persisted under key 'config' in the KV store
    (service.go:1870) and restored."""
    from wire_spark.kv import KVStore

    kv = KVStore(spark)
    reg = PipelineRegistry(spark)
    reg.add_source(SourceConfig(name="s", type="file", key="k", config={"path": events_dir}))
    reg.add_sink(SinkConfig(name="d", type="noop", key="k", config={}))
    reg.persist(kv)

    reg2 = PipelineRegistry.restore(spark, kv)
    reg2.create("k")
    assert reg2.show() == {"k": "s -> d"}


def test_unknown_factory_types(spark):
    with pytest.raises(ValueError):
        data_source_factory(SourceConfig(name="x", type="mystery", key="k"))
    with pytest.raises(ValueError):
        data_sink_factory(SinkConfig(name="x", type="mystery", key="k"))


def test_streaming_tumbling_window_watermark(spark, events_dir, tmp_path):
    """Watermarked event-time tumbling agg on a stream
    (ROADMAP.md:96-99)."""
    src = data_source_factory(
        SourceConfig(name="s", type="file", key="k", config={"path": events_dir})
    )
    df = src.read(spark).withColumn("event_time", F.to_timestamp("eventTime"))
    agg = tumbling_agg(
        df, "event_time", "1 hour",
        aggs=[F.count(F.lit(1)).alias("n"), F.round(F.sum("v"), 2).alias("sv")],
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("tumb_mem")
        .outputMode("complete")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.awaitTermination(60)
    rows = {
        r.window_start.isoformat(): (r.n, r.sv)
        for r in spark.sql("SELECT * FROM tumb_mem").collect()
    }
    assert rows == {
        "2024-03-01T10:00:00": (2, 4.0),
        "2024-03-01T11:00:00": (1, 3.0),
    }


def test_stateful_running_counter(spark, tmp_path):
    """Custom stateful op across micro-batches
    (applyInPandasWithState; ROADMAP.md:100)."""
    in_dir = str(tmp_path / "in")
    _write_jsonl(
        os.path.join(in_dir, "b0.json"),
        [
            {"user_id": 1, "value": 2.0},
            {"user_id": 1, "value": 3.0},
            {"user_id": 2, "value": 5.0},
        ],
    )
    from wire_spark.streaming.stateful import running_counter

    src = data_source_factory(
        SourceConfig(name="s", type="file", key="k", config={"path": in_dir})
    )
    df = src.read(spark)
    # foreachBatch sink: supports update output mode AND checkpoint
    # recovery (the memory sink supports neither recovery nor resume)
    collected: list[tuple] = []

    def collect_batch(bdf, _epoch):
        collected.extend((r.key, r.n_events, r.sum_value) for r in bdf.collect())

    def run_once():
        q = (
            running_counter(df)
            .writeStream.foreachBatch(collect_batch)
            .outputMode("update")
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "ck"))
            .start()
        )
        q.awaitTermination(120)

    run_once()
    got = {k: (n, s) for k, n, s in collected}
    assert got == {1: (2, 5.0), 2: (1, 5.0)}

    # second batch arrives: state persists across restarts via the
    # checkpointed state store (the Raft-snapshot analog, SURVEY §1.3)
    _write_jsonl(os.path.join(in_dir, "b1.json"), [{"user_id": 1, "value": 10.0}])
    collected.clear()
    run_once()
    got2 = {k: (n, s) for k, n, s in collected}
    # only user 1 appears in the new batch, with accumulated state
    assert got2 == {1: (3, 15.0)}


def test_stateful_running_counter_v2(spark, tmp_path):
    """Same running counter on the Spark 4 state-v2 API
    (transformWithStateInPandas); outputs must match the v1 operator
    including state persistence across restarts. The v2 driver worker
    speaks protobuf to the JVM state server; skip when the env lacks
    google.protobuf (no pip installs allowed here)."""
    pytest.importorskip("google.protobuf.descriptor")
    prev_provider = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", None
    )
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    in_dir = str(tmp_path / "in")
    _write_jsonl(
        os.path.join(in_dir, "b0.json"),
        [
            {"user_id": 1, "value": 2.0},
            {"user_id": 1, "value": 3.0},
            {"user_id": 2, "value": 5.0},
        ],
    )
    from wire_spark.streaming.stateful import running_counter_v2

    src = data_source_factory(
        SourceConfig(name="s", type="file", key="k", config={"path": in_dir})
    )
    df = src.read(spark)
    collected: list[tuple] = []

    def collect_batch(bdf, _epoch):
        collected.extend((r.key, r.n_events, r.sum_value) for r in bdf.collect())

    def run_once():
        q = (
            running_counter_v2(df)
            .writeStream.foreachBatch(collect_batch)
            .outputMode("update")
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "ck_v2"))
            .start()
        )
        q.awaitTermination(120)

    run_once()
    assert {k: (n, s) for k, n, s in collected} == {1: (2, 5.0), 2: (1, 5.0)}

    try:
        _write_jsonl(os.path.join(in_dir, "b1.json"), [{"user_id": 1, "value": 10.0}])
        collected.clear()
        run_once()
        assert {k: (n, s) for k, n, s in collected} == {1: (3, 15.0)}
    finally:
        if prev_provider is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev_provider
            )
