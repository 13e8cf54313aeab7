"""Model-check for the transactional table layer: a seeded random
op log (upsert/delete batches, interleaved rollbacks) replayed
against a plain dict model — every committed version's snapshot must
equal the model's state AT THAT VERSION, including after rollbacks
and after vacuum trims history.  Same replay-model pattern as the
index-MERGE and KV property tests."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from wire_spark.operators.txn import (
    current_version, txn_create, txn_merge, txn_read, txn_rollback,
    txn_vacuum)


def _snap(spark, t, version=None):
    return {r.k: r.val for r in txn_read(spark, t, version).collect()}


def test_txn_random_oplog_matches_dict_model(spark, tmp_path):
    rnd = random.Random(0xC0FFEE)
    t = str(tmp_path / "model_t")

    model = {k: k * 3 for k in range(40)}
    rows = [(k, v) for k, v in model.items()]
    txn_create(spark.createDataFrame(rows, "k LONG, val LONG"),
               t, "k", n_buckets=4)
    # history[v] = model state as of committed version v
    history = {1: dict(model)}

    for step in range(10):
        kind = rnd.choice(["merge", "merge", "merge", "rollback"])
        if kind == "rollback" and len(history) > 1:
            target = rnd.choice(sorted(history)[:-1])
            v = txn_rollback(spark, t, target)
            model = dict(history[target])
            history[v] = dict(model)
        else:
            ups = {rnd.randrange(60): rnd.randrange(1000)
                   for _ in range(rnd.randrange(0, 8))}
            dels = {rnd.randrange(60) for _ in range(rnd.randrange(0, 5))}
            dels -= set(ups)  # updates win within one batch by contract
            up_df = spark.createDataFrame(
                list(ups.items()) or [], "k LONG, val LONG")
            del_df = (spark.createDataFrame([(k,) for k in dels], "k LONG")
                      if dels else None)
            base = current_version(t)
            v = txn_merge(spark, t, up_df, delete_keys=del_df,
                          batch_id=f"step-{step}")
            assert v == base + 1  # a batch id always claims a version
            model.update(ups)
            for k in dels:
                model.pop(k, None)
            history[v] = dict(model)
            # replaying the same batch id must not move the table
            assert txn_merge(spark, t, up_df, delete_keys=del_df,
                             batch_id=f"step-{step}") == v
        assert _snap(spark, t) == model, f"live snapshot diverged @ step {step}"

    # every retained version time-travels to its model state
    for v, want in history.items():
        assert _snap(spark, t, version=v) == want, f"version {v} diverged"

    # vacuum keeps the newest 3 snapshots readable and correct
    txn_vacuum(spark, t, keep_versions=3, min_age_seconds=0)
    cur = current_version(t)
    for v in [x for x in sorted(history) if x > cur - 3]:
        assert _snap(spark, t, version=v) == history[v]
    assert _snap(spark, t) == model


def test_cdf_source_agrees_with_txn_changes_on_random_log(spark, tmp_path):
    """Two independent diff implementations — the JVM-side
    txn_changes (full-outer DataFrame join) and the streaming
    source's executor-side pandas/pyarrow diff — must emit the SAME
    change set for every version window of a seeded random op log.
    Guards the pair against drifting apart."""
    from wire_spark.operators.txn import txn_changes
    from wire_spark.sources.txn_cdf import ensure_registered

    rnd = random.Random(0xBEEF)
    ensure_registered(spark)
    t = str(tmp_path / "ximpl")
    txn_create(spark.createDataFrame(
        [(k, k * 2) for k in range(30)], "k LONG, val LONG"),
        t, "k", n_buckets=4)
    for step in range(4):
        ups = {rnd.randrange(45): rnd.randrange(100) for _ in range(6)}
        dels = {rnd.randrange(45) for _ in range(3)} - set(ups)
        txn_merge(
            spark, t,
            spark.createDataFrame(list(ups.items()), "k LONG, val LONG"),
            delete_keys=(spark.createDataFrame([(k,) for k in dels], "k LONG")
                         if dels else None))

    cur = current_version(t)
    sink = []
    # one drain per committed version: maxVersions not supported, so
    # drive window-by-window with explicit batch collection
    (spark.readStream.format("txn_cdf").option("path", t).load()
     .writeStream.foreachBatch(lambda b, bid: sink.append(b.collect()))
     .option("checkpointLocation", str(tmp_path / "ck"))
     .trigger(availableNow=True).start().awaitTermination(120))
    src_rows = {(r.operation_type, r.document_id,
                 r.full_document) for batch in sink for r in batch}

    jvm = {(r.op, r.k, r.val)
           for r in txn_changes(spark, t, from_version=1,
                                to_version=cur).collect()}
    assert src_rows == jvm
