"""At-rest table maintenance: small-file compaction and partition
retention — the OPTIMIZE / VACUUM pair every parquet lake runs on a
schedule, expressed with stock Spark + filesystem primitives.

Why it matters at 100 TB: streaming sinks and fine-grained ingest
leave thousands of KB-sized files per partition; every query then
pays file-open + footer-read per file and the scheduler pays one task
per file. Compaction rewrites a directory to ~target-sized files
(one pass, no shuffle beyond a coalesce); retention drops expired
date partitions by PATH, never scanning the data being deleted.

Crash model (both ops are single-writer; see each docstring for the
concurrent-reader caveat): every on-disk intermediate state is named
with a reserved marker (``._compact_tmp_<dir>`` / ``._compact_old_<dir>``
siblings, ``._expired_<dir>`` — all with dot-prefixed BASENAMES, so
Spark/Hadoop readers skip them), and every entry point first HEALS any stranded
marker from a previous crashed run, so a kill at any step leaves the
table either fully old or fully new after the next call.
"""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import SparkSession

_EXPIRED_PREFIX = "._expired_"


def _compact_markers(path: str) -> tuple[str, str]:
    """(tmp, old) sibling paths for the swap, with DOT-PREFIXED
    basenames so both are invisible to Spark/Hadoop readers: for
    ``/table/day=X`` the markers are ``/table/._compact_tmp_day=X``
    and ``/table/._compact_old_day=X`` — a whole-table reader of
    ``/table`` never lists them as partitions (a suffix-named marker
    like ``day=X._compact_tmp`` would parse as a bogus partition
    value and double-count rows mid-rewrite)."""
    parent, base = os.path.split(path.rstrip("/"))
    return (
        os.path.join(parent, "._compact_tmp_" + base),
        os.path.join(parent, "._compact_old_" + base),
    )


def _dir_bytes(path: str) -> int:
    return sum(
        os.path.getsize(f)
        for f in glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
    )


def _heal_compact_state(path: str) -> None:
    """Recover from a compact_files run that died mid-swap.

    The swap sequence is: write ``tmp`` -> rename(path, old) ->
    rename(tmp, path) -> rmtree(old).  A crash can therefore strand
    exactly one of three states, each detectable from which paths
    exist:

    * ``tmp`` only extra (crash before/during write or before the
      first rename): the table at ``path`` is intact — drop ``tmp``.
    * ``old`` exists, ``path`` missing (crash between the renames):
      the original is intact at ``old`` — rename it back, drop any
      ``tmp`` (it may be a complete rewrite, but the conservative
      heal restores the ORIGINAL; the re-run recompacts).
    * ``old`` and ``path`` both exist (crash after the second rename,
      before cleanup): the NEW table is live at ``path`` — drop
      ``old``.
    """
    tmp, old = _compact_markers(path)
    if os.path.exists(old):
        if os.path.exists(path):
            shutil.rmtree(old)          # new table live; old is garbage
        else:
            os.rename(old, path)        # restore the original
    if os.path.exists(tmp):
        shutil.rmtree(tmp)              # incomplete/stale rewrite


def compact_files(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_within_by: list[str] | None = None,
) -> int:
    """Rewrite the parquet directory at ``path`` into
    ``ceil(total_bytes / target_file_bytes)`` files (min 1); returns
    the new file count.

    The rewrite is heal-stranded-state -> read -> coalesce(n) ->
    write-to-temp -> swap.  A crash at ANY step leaves a state the
    next call heals (see ``_heal_compact_state``): the table is never
    lost, and a re-run completes the compaction.  ``coalesce`` (not
    repartition) avoids a shuffle: existing partitions merge down.
    Pass ``sort_within_by`` to restore a clustering (e.g. the z-order
    key) within the compacted files — that adds only a per-partition
    sort, still no shuffle.

    Concurrency caveat (single-writer op): the swap is two renames,
    so a concurrent reader that lists ``path`` in the ~µs window
    between them sees no directory and fails; one that resolved file
    paths BEFORE the swap reads the old files until the ``rmtree``.
    That is inherent to directory-swap on POSIX without
    RENAME_EXCHANGE; a table format (Delta/Iceberg) removes it via
    manifest pointers — run this op in the table's maintenance window.

    On a real cluster point ``path`` at one PARTITION directory and
    fan the calls out per partition (each call is one small job);
    compacting a whole 100 TB table through one session is an
    anti-pattern regardless of engine.
    """
    _heal_compact_state(path)
    total = _dir_bytes(path)
    n_files = max(1, -(-total // target_file_bytes))
    df = spark.read.parquet(path)
    out = df.coalesce(n_files)
    if sort_within_by:
        out = out.sortWithinPartitions(*sort_within_by)
    tmp, old = _compact_markers(path)
    out.write.mode("overwrite").parquet(tmp)
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
    ``date_format``-partitioned writes.

    Each drop is rename-then-delete: the partition dir is atomically
    renamed to ``._expired_<col>=<value>`` (dot-prefixed — Spark and
    Hadoop readers skip it, so the partition disappears from the
    table in ONE atomic step) and only then recursively removed.  A
    crash mid-``rmtree`` therefore never leaves a half-deleted
    partition visible as valid data; the stranded ``._expired_*``
    husk is healed at the start of the next call.  Concurrent readers
    that resolved file paths before the rename may still fail on
    deleted files mid-scan — single-writer, maintenance-window op,
    same caveat as ``compact_files``.
    """
    # heal husks from a previous run that died mid-delete
    for entry in sorted(os.listdir(path)):
        if entry.startswith(_EXPIRED_PREFIX):
            shutil.rmtree(os.path.join(path, entry))
    dropped = []
    prefix = f"{partition_col}="
    for entry in sorted(os.listdir(path)):
        if not entry.startswith(prefix):
            continue
        value = entry[len(prefix):]
        if value < keep_from:
            husk = os.path.join(path, _EXPIRED_PREFIX + entry)
            os.rename(os.path.join(path, entry), husk)  # atomic hide
            shutil.rmtree(husk)
            dropped.append(value)
    return dropped
