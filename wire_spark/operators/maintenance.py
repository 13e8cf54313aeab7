"""At-rest table maintenance: small-file compaction and partition
retention — the OPTIMIZE / VACUUM pair every parquet lake runs on a
schedule, expressed with stock Spark + filesystem primitives.

Why it matters at 100 TB: streaming sinks and fine-grained ingest
leave thousands of KB-sized files per partition; every query then
pays file-open + footer-read per file and the scheduler pays one task
per file. Compaction rewrites a directory to ~target-sized files
(one pass, no shuffle beyond a coalesce); retention drops expired
date partitions by PATH, never scanning the data being deleted.
"""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import SparkSession


def _dir_bytes(path: str) -> int:
    return sum(
        os.path.getsize(f)
        for f in glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
    )


def compact_files(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_within_by: list[str] | None = None,
) -> int:
    """Rewrite the parquet directory at ``path`` into
    ``ceil(total_bytes / target_file_bytes)`` files (min 1); returns
    the new file count.

    The rewrite is read -> coalesce(n) -> write-to-temp -> atomic
    swap, so a failure mid-rewrite leaves the original intact.
    ``coalesce`` (not repartition) avoids a shuffle: existing
    partitions merge down. Pass ``sort_within_by`` to restore a
    clustering (e.g. the z-order key) within the compacted files —
    that adds only a per-partition sort, still no shuffle.

    On a real cluster point ``path`` at one PARTITION directory and
    fan the calls out per partition (each call is one small job);
    compacting a whole 100 TB table through one session is an
    anti-pattern regardless of engine.
    """
    total = _dir_bytes(path)
    n_files = max(1, -(-total // target_file_bytes))
    df = spark.read.parquet(path)
    out = df.coalesce(n_files)
    if sort_within_by:
        out = out.sortWithinPartitions(*sort_within_by)
    tmp = path.rstrip("/") + "._compact_tmp"
    out.write.mode("overwrite").parquet(tmp)
    old = path.rstrip("/") + "._compact_old"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    return len(glob.glob(os.path.join(path, "part-*.parquet")))


def expire_partitions(
    path: str,
    partition_col: str,
    keep_from: str,
) -> list[str]:
    """Drop date partitions older than ``keep_from`` from a
    ``partitionBy(partition_col)`` parquet layout; returns the dropped
    partition values.

    Deletion is by PATH on the hive-style ``col=value`` directories —
    the expired data is never read, so retention on a 100 TB table
    costs a directory listing plus unlinks. String comparison is
    correct for ISO dates (yyyy-MM-dd), the layout produced by
    ``date_format``-partitioned writes. The swap is per-partition:
    a crash mid-run leaves some expired partitions present (re-run to
    finish), never a partially-deleted partition visible as valid.
    """
    dropped = []
    prefix = f"{partition_col}="
    for entry in sorted(os.listdir(path)):
        if not entry.startswith(prefix):
            continue
        value = entry[len(prefix):]
        if value < keep_from:
            shutil.rmtree(os.path.join(path, entry))
            dropped.append(value)
    return dropped
