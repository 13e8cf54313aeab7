"""Keyed MERGE/upsert over hash-bucketed parquet: rewrite only the
partitions an update batch touches.

The reference's KV table is an LSM keyspace; at table scale the
Spark-native analog of its upsert path (and of CDC apply,
transforms/cdc.py) is MERGE INTO. Without a transactional table
format in this environment, the same cost shape is achieved with:

- target partitioned by ``bucket = pmod(xxhash64(key), n_buckets)``;
- an update batch touches only its buckets: read THOSE partitions
  (partition-pruned scan), anti-join out replaced keys, union the
  updates, and write back with dynamic partition overwrite — cost is
  O(touched partitions), never O(table).

On a cluster with Delta/Iceberg the bucket bookkeeping collapses into
``MERGE INTO`` — the surrounding interface is unchanged.

The merged batch is materialized (localCheckpoint) before the write:
dynamic overwrite deletes the very files the plan would lazily read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BUCKET_COL = "__bucket"


def _with_bucket(df: DataFrame, key: str, n_buckets: int) -> DataFrame:
    return df.withColumn(BUCKET_COL, F.pmod(F.xxhash64(F.col(key)), F.lit(n_buckets)))


def write_initial(df: DataFrame, path: str, key: str, n_buckets: int = 16) -> None:
    """Materialize the initial keyed table, hash-bucketed on ``key``."""
    (_with_bucket(df, key, n_buckets)
     .write.mode("overwrite").partitionBy(BUCKET_COL).parquet(path))


def merge_upsert(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    key: str,
    n_buckets: int = 16,
    delete_keys: DataFrame | None = None,
) -> int:
    """Upsert ``updates`` (and optionally delete ``delete_keys``) into
    the bucketed table at ``path``. Returns #partitions rewritten.

    Duplicate keys within one updates batch are collapsed to a single
    arbitrary-but-deterministic row (callers with an ordering column
    should pre-resolve last-writer-wins before calling)."""
    up = _with_bucket(updates.dropDuplicates([key]), key, n_buckets)
    changed = up.select(BUCKET_COL)
    if delete_keys is not None:
        delete_keys = _with_bucket(delete_keys.select(key), key, n_buckets)
        changed = changed.union(delete_keys.select(BUCKET_COL))
    touched = [r[BUCKET_COL] for r in changed.distinct().collect()]
    if not touched:
        return 0

    target = spark.read.parquet(path).filter(F.col(BUCKET_COL).isin(touched))
    replaced_keys = up.select(key)
    if delete_keys is not None:
        replaced_keys = replaced_keys.union(delete_keys.select(key))
    kept = target.join(replaced_keys.distinct(), key, "left_anti")
    merged = kept.unionByName(up).localCheckpoint(eager=True)

    # per-write dynamic overwrite: only partitions present in `merged`
    # are replaced, and the session-wide conf is left untouched for
    # unrelated writes.
    (merged.write.mode("overwrite")
     .option("partitionOverwriteMode", "dynamic")
     .partitionBy(BUCKET_COL).parquet(path))

    # a batch that deletes EVERY key in a touched bucket leaves no row
    # for that bucket in `merged`, so dynamic overwrite never rewrites
    # it — clear those partition directories explicitly or the deleted
    # keys stay visible.
    present = {r[BUCKET_COL] for r in merged.select(BUCKET_COL).distinct().collect()}
    emptied = [b for b in touched if b not in present]
    if emptied:
        hconf = spark._jsc.hadoopConfiguration()
        for b in emptied:
            p = spark._jvm.org.apache.hadoop.fs.Path(f"{path}/{BUCKET_COL}={b}")
            p.getFileSystem(hconf).delete(p, True)
    return len(touched)


def read_table(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path).drop(BUCKET_COL)
