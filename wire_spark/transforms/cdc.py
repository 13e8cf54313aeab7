"""CDC envelope normalization and state application.

The reference's MongoDB CDC source decodes change-stream events into
``ChangeStreamOperation{resume_token, operation_type, full_document,
ns, updateDescription, cluster_time}`` (sources/mongo.go:23-41) and
forwards only the full document. Here the envelope is a first-class
relation (FIXTURES.md §3 schema) and ``apply_cdc`` folds a change log
into current state — the streaming analog of the KV store's
last-writer-wins resolution (wire_spark/kv.py), keyed by document id
with (cluster_time, resume_token) as the total order.

Scale notes: one shuffle on document_id; argmax aggregation (no sort);
in streaming, run inside foreachBatch against an upsert-capable table
(MERGE) — per-batch cost is O(changed keys), not O(table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: FIXTURES.md §3 / sources/mongo.go:23-41
CDC_SCHEMA = T.StructType(
    [
        T.StructField("resume_token", T.StringType(), False),
        T.StructField("operation_type", T.StringType(), False),
        T.StructField("document_id", T.StringType(), False),
        T.StructField("full_document", T.StringType(), True),  # null for deletes
        T.StructField("db", T.StringType(), True),
        T.StructField("coll", T.StringType(), True),
        T.StructField("updated_fields", T.StringType(), True),
        T.StructField("removed_fields", T.ArrayType(T.StringType()), True),
        T.StructField("wall_time", T.TimestampType(), True),
        T.StructField("cluster_time", T.LongType(), True),
    ]
)

_UPSERTS = ("insert", "update", "replace")


def apply_cdc(changes: DataFrame) -> DataFrame:
    """Fold a CDC change log into current state:
    ``(document_id, full_document)`` for live docs.

    Order: (cluster_time, resume_token) — mongo's own total order.
    The final op wins; a final delete removes the document
    (FullDocument=UpdateLookup contract, mongo.go:214).
    """
    ranked = changes.withColumn(
        "__ord", F.struct(F.col("cluster_time"), F.col("resume_token"))
    )
    latest = (
        ranked.groupBy("document_id")
        .agg(
            F.max_by("operation_type", "__ord").alias("op"),
            F.max_by("full_document", "__ord").alias("full_document"),
        )
    )
    return (
        latest.filter(F.col("op").isin(*_UPSERTS))
        .select("document_id", "full_document")
    )


def checkpoint_state(changes: DataFrame) -> DataFrame:
    """Fold a change-log prefix into a RESUMABLE checkpoint: every
    document's winning op — TOMBSTONES INCLUDED — carrying the
    (cluster_time, resume_token) of the event that produced it.
    ``checkpoint_live`` derives the serving view.

    Two design points, each covering a real restart corruption class
    (both caught by tests/test_connectors.py's exhaustive cut x
    resume grid before shipping):

    1. ORD COLUMNS FROM THE WINNER (via max_by on one ord key): the
       checkpoint is resumable under at-least-once redelivery
       (mongo.go:23-41 — the persisted resume token may LAG the last
       applied event, so the replayed tail re-delivers a suffix of
       already-applied events) because unioned with the tail, the
       same argmax fold re-decides every key and a re-delivered
       duplicate of the winner ties bit-identically instead of
       double-applying.  A plain max(resume_token) would build a
       synthetic ord that can outrank tail events the straight fold
       lets win.

    2. TOMBSTONE RETENTION: a checkpoint that keeps only live docs
       FORGETS deletes, and a replayed event that is older in fold
       order than a prefix tombstone (possible whenever replay order
       — resume_token — is not perfectly aligned with the
       (cluster_time, resume_token) fold order) would resurrect the
       document on restart while the straight fold keeps it dead.
       Keeping the delete row with its winning ord makes
       ``resume_apply`` correct under ARBITRARY token/ct order
       relationships, not just the monotone-token happy path;
       production CDC consumers (Kafka compaction, Debezium) retain
       tombstones through the replay horizon for exactly this
       reason.  Tombstone GC is safe once the resume horizon passes
       the tombstone's token — a compaction policy, not a fold
       concern.
    """
    ranked = changes.withColumn(
        "__ord", F.struct(F.col("cluster_time"), F.col("resume_token"))
    )
    return ranked.groupBy("document_id").agg(
        F.max_by("resume_token", "__ord").alias("resume_token"),
        F.max_by("operation_type", "__ord").alias("operation_type"),
        F.max_by("full_document", "__ord").alias("full_document"),
        F.max_by("cluster_time", "__ord").alias("cluster_time"),
    ).select(
        "resume_token", "operation_type", "document_id", "full_document",
        "cluster_time",
    )


def checkpoint_live(checkpoint: DataFrame) -> DataFrame:
    """Serving view of a checkpoint: live documents only (the
    apply_cdc output contract); tombstone rows stay in the
    checkpoint for restart-correctness."""
    return checkpoint.filter(
        F.col("operation_type").isin(*_UPSERTS)
    ).select("document_id", "full_document")


def resume_apply(checkpoint: DataFrame, tail: DataFrame) -> DataFrame:
    """Restart the CDC fold from a checkpoint plus a replayed tail
    (which may OVERLAP the checkpoint — at-least-once redelivery).

    Exactly-once EFFECT from at-least-once DELIVERY: the union
    re-runs the same (cluster_time, resume_token) argmax, so
    duplicates are absorbed (a redelivered event either ties with
    the checkpoint row bit-identically or loses to a later op) and
    the result equals the straight one-shot fold over the full log —
    the property ``cdc_resume_restart``'s oracle pins cross-engine.
    Scale: one shuffle on document_id over |checkpoint keys| +
    |tail|, independent of the full log length — the O(changed keys)
    restart cost the reference's resume-token design targets.
    """
    cols = ["resume_token", "operation_type", "document_id",
            "full_document", "cluster_time"]
    return apply_cdc(
        checkpoint.select(*cols).unionByName(tail.select(*cols))
    )


def cdc_stats(changes: DataFrame) -> DataFrame:
    """Operational summary per collection: op counts + lag."""
    return (
        changes.groupBy("db", "coll", "operation_type")
        .agg(
            F.count(F.lit(1)).alias("n_ops"),
            F.max("wall_time").alias("latest_wall_time"),
        )
    )
