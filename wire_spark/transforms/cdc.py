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


def cdc_stats(changes: DataFrame) -> DataFrame:
    """Operational summary per collection: op counts + lag."""
    return (
        changes.groupBy("db", "coll", "operation_type")
        .agg(
            F.count(F.lit(1)).alias("n_ops"),
            F.max("wall_time").alias("latest_wall_time"),
        )
    )
