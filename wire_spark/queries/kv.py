"""KV-surface catalog queries: last-writer-wins state resolution and
point lookup, derived from the events table as an append-log analog.

The reference's KV store replays a Raft log into BadgerDB state
(internal/store/store.go:1633-1767); the Spark-native equivalent is an
argmax over an append-only log — one shuffle on the key, fully
parallel, no consensus tier (SURVEY.md §2.5). `wire_spark.kv.KVStore`
implements the actual SET/GET/DELETE dialect; these catalog entries
prove the resolution plan against the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from wire_spark.catalog import register
from wire_spark.queries._util import T, fmt_ts

# Treat events as an append-log: key = user_id, value = props,
# writer order = (ts, event_id). Live state = newest value per key.
_LWW_ORACLE = """
SELECT user_id AS key, props AS value,
       strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS written_at
FROM (
  SELECT user_id, props, ts,
         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
WHERE rn = 1
ORDER BY key
"""


@register("kv_last_writer_wins", oracle=_LWW_ORACLE,
          doc="KV state resolution: newest value per key (store.go FSM analog)")
def kv_last_writer_wins(spark, sf_dir):
    e = T(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("user_id").alias("key"),
            F.col("props").alias("value"),
            fmt_ts(F.col("ts"), with_micros=True).alias("written_at"),
        )
        .orderBy("key")
    )


# GET semantics: point lookup; missing key -> empty result, not error
# (store.go:1335-1344). Key 7 exists in the synthetic data; the
# empty-result path is covered by tests/test_kv.py.
_GET_ORACLE = """
SELECT user_id AS key, props AS value
FROM (
  SELECT user_id, props,
         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
  WHERE user_id = 7
)
WHERE rn = 1
ORDER BY key
"""


@register("kv_point_lookup", oracle=_GET_ORACLE,
          doc="GET <key> point lookup with filter pushdown")
def kv_point_lookup(spark, sf_dir):
    e = T(spark, sf_dir, "events")
    # filter BEFORE the window: Catalyst pushes user_id=42 into the
    # parquet scan, so the point lookup never shuffles the full log.
    w = W.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        e.filter(F.col("user_id") == 7)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(F.col("user_id").alias("key"), F.col("props").alias("value"))
        .orderBy("key")
    )
