"""Partitioned MERGE/upsert: correctness + the touched-partition-only
rewrite guarantee (untouched partition files stay byte-identical)."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from wire_spark.operators.upsert import merge_upsert, read_table, write_initial


def _partition_fingerprint(path):
    out = {}
    for d in glob.glob(os.path.join(path, "__bucket=*")):
        files = sorted(glob.glob(os.path.join(d, "*.parquet")))
        out[os.path.basename(d)] = [(os.path.basename(f), os.path.getmtime(f)) for f in files]
    return out


def test_merge_upsert_and_delete(spark, tmp_path):
    path = str(tmp_path / "kvtable")
    base = spark.range(100).select(
        F.col("id").cast("string").alias("key"),
        F.concat(F.lit("v"), F.col("id")).alias("value"),
    )
    write_initial(base, path, key="key", n_buckets=8)

    before = _partition_fingerprint(path)

    updates = spark.createDataFrame(
        [("5", "updated5"), ("100", "new100")], ["key", "value"]
    )
    deletes = spark.createDataFrame([("7",)], ["key"])
    n_rewritten = merge_upsert(
        spark, path, updates, key="key", n_buckets=8, delete_keys=deletes
    )
    assert 1 <= n_rewritten <= 3  # at most one bucket per changed key

    state = {r.key: r.value for r in read_table(spark, path).collect()}
    assert state["5"] == "updated5"       # updated in place
    assert state["100"] == "new100"       # inserted
    assert "7" not in state               # deleted
    assert state["6"] == "v6"             # untouched row intact
    assert len(state) == 100              # 100 - 1 delete + 1 insert

    # partitions not touched by the batch are byte-identical (same
    # files, same mtimes) — the O(touched partitions) guarantee
    after = _partition_fingerprint(path)
    touched = {
        b for b, files in after.items() if before.get(b) != files
    }
    assert len(touched) == n_rewritten
    for b in set(before) - touched:
        assert before[b] == after[b]


def test_merge_upsert_empty_batch_noop(spark, tmp_path):
    path = str(tmp_path / "kvtable2")
    write_initial(
        spark.createDataFrame([("a", "1")], ["key", "value"]), path, key="key", n_buckets=4
    )
    empty = spark.createDataFrame([], "key STRING, value STRING")
    assert merge_upsert(spark, path, empty, key="key", n_buckets=4) == 0
    assert {r.key for r in read_table(spark, path).collect()} == {"a"}
