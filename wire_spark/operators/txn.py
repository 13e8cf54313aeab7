"""Snapshot-isolated keyed tables over parquet: a manifest layer
that gives the bucketed MERGE store (operators/upsert.py) atomic
commits, time travel, optimistic concurrency, and transactional
exactly-once for streaming writers.

The reference ships a Raft-replicated store whose writes are atomic
at the log level (wire `internal/store/store.go` apply path); SURVEY
§7.3 replaces that tier with Spark-side table ACID.  Without
Delta/Iceberg in this environment the missing piece is the COMMIT
PROTOCOL, and that is exactly what a manifest layer provides — the
same design Delta Lake's `_delta_log` and Iceberg's metadata tree
use, reduced to the keyed-bucketed-table case:

- **Data files are immutable.**  Every commit writes NEW files under
  ``data/c{version}-{uuid}/__bucket=B/`` and never rewrites or
  deletes a live file.  A merge rewrites only the buckets it
  touches, so each bucket's current rows live in exactly ONE commit
  directory — the manifest is a ``bucket -> commit dir`` map.
- **A commit is one atomic manifest claim.**  The full manifest JSON
  is written to a temp file, fsynced, then hard-linked to
  ``_manifests/v{N}.json`` — ``link(2)`` fails if the version
  already exists, which IS the optimistic-concurrency check (two
  racing writers: one wins, the loser gets :class:`TxnConflict` and
  retries on the new snapshot).  On HDFS the same protocol uses
  atomic ``create(overwrite=false)``; on S3 a conditional PUT or a
  coordination table — the protocol class Delta uses per store.
- **Readers are snapshot-isolated for free.**  A read resolves the
  newest committed manifest once; since data files are immutable, a
  concurrent merge (or a crash mid-write) can never change or
  corrupt what the resolved plan reads.  ``version=`` reads any
  retained snapshot (time travel); rollback commits a new manifest
  that points at an old snapshot's files — O(1), no data copy.
- **Streaming exactly-once.**  ``txn_merge(batch_id=...)`` records
  applied batch ids in the manifest; a foreachBatch replay after a
  crash-between-merge-and-offset-commit sees its id and no-ops.
  At-least-once delivery + transactional idempotence = effective
  exactly-once, the contract `sinks/` document for the reference's
  at-least-once pipeline (`internal/pipeline/pipeline.go` restart
  path).

Cost shape at scale: a merge reads ONLY the touched buckets' commit
dirs (partition-pruned by the hive ``__bucket=B`` layout), writes
one file per touched bucket, and commits one tiny JSON — O(changes)
plus O(n_buckets) manifest bytes, never O(table).  A full-table read
unions at most ``min(n_buckets, live commit dirs)`` pruned scans;
``txn_vacuum`` bounds manifest/orphan growth.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wire_spark.operators.upsert import BUCKET_COL, _with_bucket

_MANIFEST_DIR = "_manifests"
_DATA_DIR = "data"
# bounded batch-id memory: Structured Streaming replays only the last
# uncommitted micro-batch per query, so a small window is sufficient;
# keep enough for several interleaved writer queries.
_BATCH_ID_WINDOW = 128


class TxnConflict(Exception):
    """Another writer committed the version this transaction targeted.
    Retry: re-read the table (new snapshot) and re-apply the merge."""


def _manifest_path(path: str, version: int) -> str:
    return os.path.join(path, _MANIFEST_DIR, f"v{version:08d}.json")


def _list_versions(path: str) -> list[int]:
    d = os.path.join(path, _MANIFEST_DIR)
    if not os.path.isdir(d):
        return []
    out = []
    for name in os.listdir(d):
        if name.startswith("v") and name.endswith(".json"):
            try:
                out.append(int(name[1:-5]))
            except ValueError:
                continue
    return sorted(out)


def _read_manifest(path: str, version: int) -> dict:
    with open(_manifest_path(path, version)) as f:
        return json.load(f)


def _commit(path: str, manifest: dict) -> int:
    """Atomically claim ``manifest['version']``: temp-write + fsync +
    hard link.  The link either installs the COMPLETE manifest or
    fails — a reader can never observe a partial commit, and a crash
    before the link leaves only an invisible temp file."""
    version = manifest["version"]
    d = os.path.join(path, _MANIFEST_DIR)
    os.makedirs(d, exist_ok=True)
    tmp = os.path.join(d, f".tmp-{uuid.uuid4().hex}")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
        f.flush()
        os.fsync(f.fileno())
    try:
        os.link(tmp, _manifest_path(path, version))
    except FileExistsError:
        raise TxnConflict(
            f"version {version} at {path} was committed by another "
            "writer; re-read the snapshot and retry the merge"
        ) from None
    finally:
        os.unlink(tmp)
    return version


def current_version(path: str) -> int | None:
    vs = _list_versions(path)
    return vs[-1] if vs else None


def txn_create(df: DataFrame, path: str, key: str,
               n_buckets: int = 16) -> int:
    """Create the table: write every bucket into the v1 commit dir
    and commit manifest v1.  Fails if the table already exists."""
    if _list_versions(path):
        raise ValueError(f"txn table already exists at {path}")
    cdir = f"{_DATA_DIR}/c1-{uuid.uuid4().hex}"
    bucketed = _with_bucket(df, key, n_buckets)
    (bucketed.repartition(n_buckets, F.col(BUCKET_COL))
     .write.mode("overwrite").partitionBy(BUCKET_COL)
     .parquet(os.path.join(path, cdir)))
    present = {
        int(n.split("=", 1)[1])
        for n in os.listdir(os.path.join(path, cdir))
        if n.startswith(f"{BUCKET_COL}=")
    }
    manifest = {
        "version": 1,
        "parent": None,
        "key": key,
        "n_buckets": n_buckets,
        # an empty input writes no partition dirs at all — point those
        # buckets nowhere so the snapshot read never scans a dir that
        # has no parquet footers to infer from
        "buckets": {str(b): (cdir if b in present else None)
                    for b in range(n_buckets)},
        "batch_ids": [],
        # schema travels in the manifest: a snapshot whose every
        # bucket is empty still reads with the table's schema
        "schema": bucketed.schema.jsonValue(),
    }
    return _commit(path, manifest)


def _snapshot_df(spark: SparkSession, path: str, manifest: dict) -> DataFrame:
    """One pruned scan per live commit dir, filtered to the buckets
    that dir currently OWNS (a later commit may have superseded some
    of its buckets) — ``__bucket`` is a hive partition column, so the
    isin filter prunes directories, not rows."""
    by_dir: dict[str, list[int]] = {}
    for b, cdir in manifest["buckets"].items():
        if cdir is not None:
            by_dir.setdefault(cdir, []).append(int(b))
    parts = []
    for cdir, owned in sorted(by_dir.items()):
        df = spark.read.parquet(os.path.join(path, cdir))
        parts.append(df.filter(F.col(BUCKET_COL).isin(owned)))
    if not parts:
        from pyspark.sql.types import StructType
        # emptyRDD: zero tasks — the default local path spawns
        # defaultParallelism Python-worker tasks for an empty relation
        return spark.createDataFrame(
            spark.sparkContext.emptyRDD(),
            StructType.fromJson(manifest["schema"]))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def txn_read(spark: SparkSession, path: str,
             version: int | None = None) -> DataFrame:
    """Snapshot read.  ``version=None`` resolves the newest committed
    manifest ONCE — the returned plan is pinned to that snapshot and
    immune to concurrent merges.  An explicit ``version`` time-travels
    to any retained snapshot."""
    if version is None:
        version = current_version(path)
        if version is None:
            raise ValueError(f"no txn table at {path}")
    manifest = _read_manifest(path, version)
    return _snapshot_df(spark, path, manifest).drop(BUCKET_COL)


def txn_merge(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    delete_keys: DataFrame | None = None,
    batch_id: int | str | None = None,
    base_version: int | None = None,
) -> int:
    """MERGE into the newest snapshot and commit the next version.
    Returns the committed version (or the CURRENT version, unchanged,
    for an empty batch or an already-applied ``batch_id``).

    Touched buckets are recomputed against the snapshot's files and
    written as fresh immutable files; untouched buckets keep their
    manifest pointers.  Raises :class:`TxnConflict` if another writer
    commits first — data written by the losing attempt is orphaned,
    never visible, and reclaimed by ``txn_vacuum``.

    Within one batch, duplicate update keys collapse to a single row
    and a key present in BOTH ``updates`` and ``delete_keys`` is
    UPDATED — the update wins; callers wanting delete-wins semantics
    pre-resolve (the CDC fold already does).

    ``base_version`` is the serializability handle for
    read-modify-write callers: pass the version your inputs were read
    from and the commit targets exactly ``base_version + 1`` — ANY
    interleaved commit makes the claim fail with :class:`TxnConflict`
    instead of silently overwriting it (lost update).  Re-read on the
    new snapshot and retry.  Left None, the merge snapshots the
    newest version itself, which is safe for self-contained batches
    (the updates don't depend on current table state)."""
    base = base_version if base_version is not None else current_version(path)
    if base is None:
        raise ValueError(f"no txn table at {path}; txn_create first")
    m = _read_manifest(path, base)
    key, n_buckets = m["key"], m["n_buckets"]

    if batch_id is not None and str(batch_id) in m["batch_ids"]:
        return base  # transactional exactly-once: replay no-ops

    up = _with_bucket(updates.dropDuplicates([key]), key, n_buckets)
    changed = up.select(BUCKET_COL)
    if delete_keys is not None:
        delete_keys = _with_bucket(delete_keys.select(key), key, n_buckets)
        changed = changed.union(delete_keys.select(BUCKET_COL))
    touched = sorted(r[BUCKET_COL] for r in changed.distinct().collect())
    if not touched and batch_id is None:
        return base
    version = base + 1

    new_buckets = dict(m["buckets"])
    if touched:
        target = _snapshot_df(spark, path, m).filter(
            F.col(BUCKET_COL).isin(touched))
        replaced = up.select(key)
        if delete_keys is not None:
            replaced = replaced.union(delete_keys.select(key))
        kept = target.join(replaced.distinct(), key, "left_anti")
        merged = kept.unionByName(up)
        cdir = f"{_DATA_DIR}/c{version}-{uuid.uuid4().hex}"
        # one file per rewritten bucket (upsert.py small-files rule);
        # immutable commit dir — no dynamic-overwrite self-read hazard
        # and no localCheckpoint needed
        (merged.repartition(max(1, len(touched)), F.col(BUCKET_COL))
         .write.mode("overwrite").partitionBy(BUCKET_COL)
         .parquet(os.path.join(path, cdir)))
        present = {
            int(n.split("=", 1)[1])
            for n in os.listdir(os.path.join(path, cdir))
            if n.startswith(f"{BUCKET_COL}=")
        }
        for b in touched:
            # a bucket whose every key was deleted writes no files:
            # point it nowhere — deletes need no tombstone files
            new_buckets[str(b)] = cdir if b in present else None

    ids = m["batch_ids"]
    if batch_id is not None:
        ids = (ids + [str(batch_id)])[-_BATCH_ID_WINDOW:]
    manifest = {
        "version": version,
        "parent": base,
        "key": key,
        "n_buckets": n_buckets,
        "buckets": new_buckets,
        "batch_ids": ids,
        "schema": m["schema"],
    }
    return _commit(path, manifest)


def txn_rollback(spark: SparkSession, path: str, to_version: int) -> int:
    """Commit a NEW version whose bucket map is ``to_version``'s —
    instant restore (no data copy; files are immutable), and the
    rolled-back-over versions stay readable until vacuumed."""
    base = current_version(path)
    if base is None:
        raise ValueError(f"no txn table at {path}")
    old = _read_manifest(path, to_version)
    cur = _read_manifest(path, base)
    manifest = {
        "version": base + 1,
        "parent": base,
        "rolled_back_to": to_version,
        "key": old["key"],
        "n_buckets": old["n_buckets"],
        "buckets": old["buckets"],
        "batch_ids": cur["batch_ids"],  # exactly-once memory survives
        "schema": old["schema"],
    }
    return _commit(path, manifest)


def txn_history(spark: SparkSession, path: str) -> DataFrame:
    """One row per retained version: (version, parent, n_live_buckets,
    rolled_back_to) — the audit surface a table format exposes."""
    rows = []
    for v in _list_versions(path):
        m = _read_manifest(path, v)
        rows.append((
            v, m.get("parent"),
            sum(1 for c in m["buckets"].values() if c is not None),
            m.get("rolled_back_to"),
        ))
    # version-history-sized: one partition, not 32 Python tasks
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1),
        "version INT, parent INT, n_live_buckets INT, "
        "rolled_back_to INT")


def txn_compact(spark: SparkSession, path: str) -> int:
    """Rewrite the CURRENT snapshot into one fresh commit dir and
    commit it as the next version — the OPTIMIZE step that restores
    the single-commit-dir read floor after many merges have spread
    live buckets across up to ``n_buckets`` dirs.  Runs under the
    same optimistic claim as any writer (raises :class:`TxnConflict`
    if a merge lands first — compaction never wins over data);
    readers of older versions are untouched (files are immutable)
    and the superseded dirs are reclaimed by the next vacuum."""
    base = current_version(path)
    if base is None:
        raise ValueError(f"no txn table at {path}")
    m = _read_manifest(path, base)
    n_buckets = m["n_buckets"]
    version = base + 1
    snap = _snapshot_df(spark, path, m)
    cdir = f"{_DATA_DIR}/c{version}-{uuid.uuid4().hex}"
    (snap.repartition(n_buckets, F.col(BUCKET_COL))
     .write.mode("overwrite").partitionBy(BUCKET_COL)
     .parquet(os.path.join(path, cdir)))
    present = {
        int(n.split("=", 1)[1])
        for n in os.listdir(os.path.join(path, cdir))
        if n.startswith(f"{BUCKET_COL}=")
    }
    manifest = {
        "version": version,
        "parent": base,
        "compacted": True,
        "key": m["key"],
        "n_buckets": n_buckets,
        "buckets": {str(b): (cdir if b in present else None)
                    for b in range(n_buckets)},
        "batch_ids": m["batch_ids"],  # exactly-once memory survives
        "schema": m["schema"],
    }
    return _commit(path, manifest)


def txn_changes(spark: SparkSession, path: str, from_version: int,
                to_version: int | None = None) -> DataFrame:
    """Change data feed between two snapshots, computed from the
    manifest diff — the reference's CDC envelope served FROM the
    store (`sources/mongo.go` emits this shape INTO the pipeline;
    a txn table can emit it onward to downstream consumers).

    Only buckets whose manifest pointer moved between the versions
    are read (O(changed buckets), never O(table)); within them a
    full-outer join by key classifies each key as ``insert`` /
    ``update`` / ``delete``, and rows rewritten with identical
    payloads (compaction, no-op merges) are filtered out — a pure
    compaction step yields ZERO changes.  Returns
    (op, <key>, <payload columns of the newer snapshot; NULL for
    deletes>).  Net-effect semantics: intermediate versions that
    were later rolled back or overwritten do not appear — this is
    the snapshot delta, not the write-ahead log."""
    to_version = to_version if to_version is not None else current_version(path)
    m0 = _read_manifest(path, from_version)
    m1 = _read_manifest(path, to_version)
    key = m1["key"]
    moved = [int(b) for b in m1["buckets"]
             if m1["buckets"][b] != m0["buckets"].get(b)]
    cols = [f["name"] for f in m1["schema"]["fields"]
            if f["name"] != BUCKET_COL]
    payload = [c for c in cols if c != key]
    if not moved:
        return (_snapshot_df(spark, path, m1).drop(BUCKET_COL).limit(0)
                .withColumn("op", F.lit("")).select("op", *cols))
    old = (_snapshot_df(spark, path, m0)
           .filter(F.col(BUCKET_COL).isin(moved)).drop(BUCKET_COL))
    new = (_snapshot_df(spark, path, m1)
           .filter(F.col(BUCKET_COL).isin(moved)).drop(BUCKET_COL))
    o = old.select(F.col(key).alias("__k"),
                   F.struct(*[F.col(c) for c in payload]).alias("__old"))
    n = new.select(F.col(key).alias("__k"),
                   F.struct(*[F.col(c) for c in payload]).alias("__new"))
    j = o.join(n, "__k", "full_outer")
    op = (F.when(F.col("__old").isNull(), F.lit("insert"))
          .when(F.col("__new").isNull(), F.lit("delete"))
          .when(~F.col("__old").eqNullSafe(F.col("__new")),
                F.lit("update")))
    out_cols = [F.col("__k").alias(key)] + [
        F.col(f"__new.{c}").alias(c) for c in payload]
    return (j.withColumn("op", op)
            .filter(F.col("op").isNotNull())
            .select("op", *out_cols))


def txn_changes_envelope(spark: SparkSession, path: str, from_version: int,
                         to_version: int | None = None,
                         payload: str | None = None) -> DataFrame:
    """The change feed in the reference's CDC ENVELOPE shape
    (transforms/cdc.py CDC_SCHEMA field names; sources/mongo.go
    23-41): resume_token, operation_type, document_id,
    full_document, cluster_time.  This is the adapter that lets a
    txn table FEED the pipeline's existing CDC consumers —
    ``apply_cdc`` downstream keyed tables, ``fold_vector_delta`` →
    ``merge_index_update`` index maintenance — so the store is a
    change SOURCE, not only a sink.

    ``payload`` names the single payload column to ship as
    full_document (default: the table's only non-key column; a
    multi-column table needs an explicit choice).  operation_type is
    the feed's insert/update/delete verdict; deletes carry a NULL
    full_document (the tombstone contract the index MERGE relies
    on).  resume_token orders deterministically within the batch
    (zero-padded key), cluster_time is the target version — so
    replaying feeds from consecutive version windows preserves
    last-writer-wins through ``checkpoint_state``."""
    to_version = to_version if to_version is not None else current_version(path)
    m1 = _read_manifest(path, to_version)
    key = m1["key"]
    if payload is None:
        non_key = [f["name"] for f in m1["schema"]["fields"]
                   if f["name"] not in (key, BUCKET_COL)]
        if len(non_key) != 1:
            raise ValueError(
                f"table at {path} has payload columns {non_key}; pass "
                "payload= to choose the full_document column")
        payload = non_key[0]
    ch = txn_changes(spark, path, from_version, to_version)
    return ch.select(
        F.concat(F.lit("t"), F.lpad(F.col(key).cast("string"), 18, "0"))
        .alias("resume_token"),
        F.col("op").alias("operation_type"),
        F.col(key).alias("document_id"),
        F.col(payload).alias("full_document"),
        F.lit(to_version).cast("long").alias("cluster_time"),
    )


def txn_fsck(spark: SparkSession, path: str) -> dict:
    """Integrity audit of the manifest chain and storage — the
    `fsck`/DESCRIBE DETAIL surface a table format ships.  Read-only;
    returns ``{"ok": bool, "errors": [...], "warnings": [...],
    "versions": n, "orphan_dirs": n}``.

    Errors (table unreadable or protocol violated): missing referenced
    commit dir, a bucket id outside ``range(n_buckets)``, schema/key/
    bucket-count drift between retained manifests, a broken parent
    link (parent retained but not the previous version), unreadable
    manifest JSON.  Warnings (benign, vacuum-able): orphan data dirs,
    stray temp manifests, expired parents (vacuumed-away history)."""
    errors: list[str] = []
    warnings: list[str] = []
    versions = _list_versions(path)
    if not versions:
        return {"ok": False, "errors": [f"no manifests at {path}"],
                "warnings": [], "versions": 0, "orphan_dirs": 0}
    retained = set(versions)
    manifests = {}
    for v in versions:
        try:
            manifests[v] = _read_manifest(path, v)
        except (OSError, json.JSONDecodeError) as ex:
            errors.append(f"v{v}: unreadable manifest ({ex})")
    live_dirs = set()
    head = manifests.get(versions[-1])
    for v, m in manifests.items():
        nb = m["n_buckets"]
        for b, cdir in m["buckets"].items():
            if not 0 <= int(b) < nb:
                errors.append(f"v{v}: bucket id {b} outside n_buckets={nb}")
            if cdir is not None:
                live_dirs.add(cdir)
                if not os.path.isdir(os.path.join(path, cdir)):
                    errors.append(f"v{v}: missing commit dir {cdir}")
        if head is not None:
            for field in ("key", "n_buckets", "schema"):
                if m[field] != head[field]:
                    errors.append(
                        f"v{v}: {field} differs from head v{versions[-1]}")
        parent = m.get("parent")
        if parent is not None and parent not in retained:
            warnings.append(f"v{v}: parent v{parent} expired (vacuumed)")
        elif parent is not None and parent != v - 1 and (v - 1) in retained:
            errors.append(f"v{v}: parent v{parent} skips retained v{v - 1}")
    orphans = 0
    ddir = os.path.join(path, _DATA_DIR)
    if os.path.isdir(ddir):
        for name in os.listdir(ddir):
            if f"{_DATA_DIR}/{name}" not in live_dirs:
                orphans += 1
                warnings.append(f"orphan data dir {name}")
    mdir = os.path.join(path, _MANIFEST_DIR)
    for name in os.listdir(mdir):
        if name.startswith(".tmp-"):
            warnings.append(f"stray temp manifest {name}")
    return {"ok": not errors, "errors": errors, "warnings": warnings,
            "versions": len(versions), "orphan_dirs": orphans}


def txn_vacuum(spark: SparkSession, path: str, keep_versions: int = 2,
               min_age_seconds: float = 600.0) -> dict:
    """Expire all but the newest ``keep_versions`` manifests and
    delete every data directory (and stray temp manifest) no retained
    manifest references — orphans from losing/crashed writers
    included.  Returns counts.  Time travel reaches only retained
    versions afterwards.

    ``min_age_seconds`` is the in-flight-writer guard (the retention
    rule Delta's VACUUM applies for the same reason): a writer that
    has written its commit dir but not yet claimed its manifest is
    indistinguishable from an orphan, so unreferenced dirs (and temp
    manifests) younger than the threshold are left alone.  Keep it
    comfortably above your longest merge's write phase; 0 is for
    tests and known-quiesced tables."""
    import time

    if keep_versions < 1:
        raise ValueError("keep_versions must be >= 1")
    versions = _list_versions(path)
    keep = versions[-keep_versions:]
    live_dirs = set()
    for v in keep:
        m = _read_manifest(path, v)
        live_dirs.update(c for c in m["buckets"].values() if c is not None)
    dropped_manifests = 0
    for v in versions[:-keep_versions]:
        os.unlink(_manifest_path(path, v))
        dropped_manifests += 1
    cutoff = time.time() - min_age_seconds

    def old_enough(p: str) -> bool:
        try:
            return os.path.getmtime(p) <= cutoff
        except OSError:
            return False  # vanished underneath us — leave it be

    mdir = os.path.join(path, _MANIFEST_DIR)
    if os.path.isdir(mdir):
        for name in os.listdir(mdir):
            full = os.path.join(mdir, name)
            if name.startswith(".tmp-") and old_enough(full):
                os.unlink(full)
    dropped_dirs = 0
    ddir = os.path.join(path, _DATA_DIR)
    if os.path.isdir(ddir):
        for name in os.listdir(ddir):
            rel = f"{_DATA_DIR}/{name}"
            full = os.path.join(ddir, name)
            if rel not in live_dirs and old_enough(full):
                shutil.rmtree(full)
                dropped_dirs += 1
    return {"dropped_manifests": dropped_manifests,
            "dropped_data_dirs": dropped_dirs,
            "retained_versions": keep}
