"""Streaming CDF source over txn tables (sources/txn_cdf.py —
Spark 4 Python Data Source API): offsets are manifest versions,
partitions are moved buckets, batches arrive in the CDC envelope
shape and drive the pipeline's existing consumers unchanged."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from wire_spark.operators.txn import txn_create, txn_merge


def _register(spark):
    from wire_spark.sources.txn_cdf import ensure_registered
    ensure_registered(spark)


def _mk(spark, n=40):
    return spark.range(n).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("val"))


def _drain(spark, t, ckpt, sink, timeout=120):
    """Run the CDF stream until idle (availableNow), foreachBatch
    appending collected rows into ``sink``."""
    q = (spark.readStream.format("txn_cdf").option("path", t).load()
         .writeStream.foreachBatch(
             lambda b, bid: sink.append((bid, b.collect())))
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination(timeout)


def test_cdf_source_emits_envelope_and_resumes_from_checkpoint(
        spark, tmp_path):
    """First drain ships the v1->v2 net envelope (tombstones NULL);
    a merge after the stream stopped is picked up by a RESTART from
    the same checkpoint, which must ship ONLY the new version window
    — offsets are manifest versions, replay-deterministic."""
    _register(spark)
    t = str(tmp_path / "t")
    ckpt = str(tmp_path / "ck")
    txn_create(_mk(spark), t, "k", n_buckets=4)              # v1
    txn_merge(spark, t, spark.createDataFrame(
        [(3, -1), (100, 7)], "k LONG, val LONG"),
        delete_keys=spark.createDataFrame([(5,)], "k LONG"))  # v2

    sink = []
    _drain(spark, t, ckpt, sink)
    rows = [r for _, batch in sink for r in batch]
    got = {(r.operation_type, r.document_id, r.full_document,
            r.cluster_time) for r in rows}
    assert got == {("update", 3, -1, 2), ("insert", 100, 7, 2),
                   ("delete", 5, None, 2)}
    assert all(r.resume_token == "t" + str(r.document_id).zfill(18)
               for r in rows)

    # stream stopped; new commit lands; restart ships only v2->v3
    txn_merge(spark, t, spark.createDataFrame(
        [(3, -2)], "k LONG, val LONG"))                      # v3
    sink2 = []
    _drain(spark, t, ckpt, sink2)
    rows2 = [r for _, batch in sink2 for r in batch]
    got2 = {(r.operation_type, r.document_id, r.full_document,
             r.cluster_time) for r in rows2}
    assert got2 == {("update", 3, -2, 3)}


def test_cdf_source_array_payload_feeds_cdc_consumers(spark, tmp_path):
    """Array-typed payload (the vector-store case): the streamed
    envelope folds through fold_vector_delta exactly like a Mongo
    change stream — the store is a drop-in CDC source."""
    from wire_spark.operators.vector_index import fold_vector_delta

    _register(spark)
    t = str(tmp_path / "vt")
    ckpt = str(tmp_path / "vck")
    vecs = spark.range(20).select(
        F.col("id").alias("vec_id"),
        F.transform(F.sequence(F.lit(1), F.lit(4)),
                    lambda x: (x + F.col("id")).cast("double")).alias("v"))
    txn_create(vecs, t, "vec_id", n_buckets=4)               # v1
    ups = vecs.filter(F.col("vec_id") % 5 == 0).select(
        "vec_id", F.transform("v", lambda x: -x).alias("v"))
    txn_merge(spark, t, ups,
              delete_keys=spark.createDataFrame([(7,)], "vec_id LONG"))

    sink = []
    _drain(spark, t, ckpt, sink)
    env = None
    for _, batch in sink:
        if batch:
            df = spark.createDataFrame(
                batch, spark.readStream.format("txn_cdf")
                .option("path", t).load().schema)
            env = df if env is None else env.unionByName(df)
    assert env is not None
    folded = {(r.vec_id, r.op, tuple(r.v) if r.v is not None else None)
              for r in fold_vector_delta(env).collect()}
    want = {(int(i), "update", tuple(-(x + 1.0 + i) for x in range(4)))
            for i in range(0, 20, 5)}
    want.add((7, "delete", None))
    assert folded == want


def test_cdf_source_empty_window_yields_no_batch_rows(spark, tmp_path):
    """A drain with no new versions ships zero rows (and does not
    error on the empty-offset range)."""
    _register(spark)
    t = str(tmp_path / "e")
    ckpt = str(tmp_path / "eck")
    txn_create(_mk(spark, 10), t, "k", n_buckets=2)
    sink = []
    _drain(spark, t, ckpt, sink)       # v1 only: window (1,1] empty
    assert sum(len(b) for _, b in sink) == 0
    time.sleep(0.2)
    _drain(spark, t, ckpt, sink)       # still nothing
    assert sum(len(b) for _, b in sink) == 0


def test_cdf_stream_drives_index_maintenance_with_restart(spark, tmp_path):
    """Capstone loop: vectors live in a txn table; the table's OWN
    readStream (format txn_cdf) drives merge_index_update in
    foreachBatch.  Drain, STOP, commit more changes, RESTART from
    the same checkpoint (only the new version window replays) — the
    stored index must equal a frozen-codebook rebuild of the final
    snapshot.  Store -> streaming change feed -> index, all through
    the real source, with checkpoint recovery."""
    from wire_spark.operators.txn import txn_read
    from wire_spark.operators.upsert import read_table
    from wire_spark.operators.vector_index import (
        assign_cells, build_index, fold_vector_delta, merge_index_update,
        pq_encode)

    _register(spark)
    t = str(tmp_path / "vs")
    ckpt = str(tmp_path / "ck")
    idx = str(tmp_path / "idx")
    vecs = spark.range(40).select(
        F.col("id").alias("vec_id"),
        F.transform(F.sequence(F.lit(1), F.lit(8)),
                    lambda x: ((x * 7 + F.col("id") * 3) % 11 + x)
                    .cast("double")).alias("v"))
    txn_create(vecs, t, "vec_id", n_buckets=4)                # v1
    build_index(txn_read(spark, t, version=1)
                .select("vec_id", F.col("v").alias("embedding")), idx)

    def apply_batch(batch, _bid):
        if batch.isEmpty():
            return
        merge_index_update(batch.sparkSession, idx,
                           fold_vector_delta(batch))

    def drain():
        (spark.readStream.format("txn_cdf").option("path", t).load()
         .writeStream.foreachBatch(apply_batch)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start().awaitTermination(180))

    # wave 1: updates
    txn_merge(spark, t, vecs.filter(F.col("vec_id") % 5 == 0).select(
        "vec_id", F.transform("v", lambda x: -x).alias("v")))  # v2
    drain()
    # stream stopped; wave 2: deletes + inserts land
    txn_merge(spark, t,
              vecs.filter(F.col("vec_id") % 9 == 0).select(
                  (F.col("vec_id") + F.lit(1000)).alias("vec_id"),
                  F.reverse("v").alias("v")),
              delete_keys=spark.createDataFrame(
                  [(13,), (26,)], "vec_id LONG"))              # v3
    drain()  # restart from checkpoint: only v2->v3 replays

    post = txn_read(spark, t)
    cent = spark.read.parquet(idx + "/centroids").withColumn(
        "cn", F.sqrt(F.aggregate(F.zip_with("cv", "cv", lambda a, b: a * b),
                                 F.lit(0.0), lambda a, b: a + b)))
    cw = spark.read.parquet(idx + "/codebook")
    got_cells = {(r.vec_id, r.cid)
                 for r in read_table(spark, idx + "/cells").collect()}
    want_cells = {(r.vec_id, r.cid)
                  for r in assign_cells(post, cent).collect()}
    assert got_cells == want_cells
    got_codes = {(r.vec_id, r.m, r.code)
                 for r in spark.read.parquet(idx + "/codes")
                 .select("vec_id", "m", "code").collect()}
    want_codes = {(r.vec_id, r.m, r.code)
                  for r in pq_encode(post, cw).collect()}
    assert got_codes == want_codes


def test_factory_dispatches_txn_cdf_streaming_and_batch(spark, tmp_path):
    """Pipeline-config surface: type 'txn_cdf' resolves to the
    streaming Python Data Source, and the batch path returns the
    one-shot envelope catch-up between versions."""
    from wire_spark.model import SourceConfig
    from wire_spark.sources.factory import data_source_factory

    t = str(tmp_path / "ft")
    txn_create(_mk(spark, 12), t, "k", n_buckets=2)
    txn_merge(spark, t, spark.createDataFrame(
        [(1, -1)], "k LONG, val LONG"))

    cfg = SourceConfig(name="f", type="txn_cdf", key="k",
                       config={"path": t})
    sdf = data_source_factory(cfg, streaming=True).read(spark)
    assert sdf.isStreaming
    assert "operation_type" in sdf.columns

    bdf = data_source_factory(cfg, streaming=False).read(spark)
    assert not bdf.isStreaming
    rows = {(r.operation_type, r.document_id, r.full_document)
            for r in bdf.collect()}
    assert rows == {("update", 1, -1)}
