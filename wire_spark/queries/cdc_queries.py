"""CDC catalog queries: the reference's core pipeline — a change
stream folded into current state — as driver-gated, oracle-verified
operators (transforms/cdc.py holds the reusable fold; these queries
derive a deterministic change log from the events table so the gate
can run on the standard testdata).

Envelope mapping (deterministic): signup -> insert, purchase ->
delete, everything else -> update; document_id = user_id;
(cluster_time, resume_token) = (epoch micros, zero-padded event_id) —
zero-padding makes lexicographic string order equal numeric order in
both engines, mirroring Mongo's opaque-but-ordered resume token.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from wire_spark.catalog import register
from wire_spark.queries._util import EVENTS_SANITIZED_CTE, events_sane

_ENVELOPE_SQL_CTE = EVENTS_SANITIZED_CTE + """,
env AS (
  SELECT
    lpad(CAST(event_id AS VARCHAR), 12, '0') AS resume_token,
    CASE event_type
      WHEN 'signup' THEN 'insert'
      WHEN 'purchase' THEN 'delete'
      ELSE 'update'
    END AS operation_type,
    CAST(user_id AS VARCHAR) AS document_id,
    CASE WHEN event_type = 'purchase' THEN NULL
         ELSE '{"user_id":' || user_id || ',"cents":' ||
              CAST(floor(value * 100.0) AS BIGINT) || '}'
    END AS full_document,
    epoch_us(ts) AS cluster_time
  FROM events
)
"""

_CDC_APPLY_ORACLE = _ENVELOPE_SQL_CTE + """
, ranked AS (
  SELECT document_id, operation_type, full_document,
         row_number() OVER (
           PARTITION BY document_id
           ORDER BY cluster_time DESC, resume_token DESC
         ) AS rn
  FROM env
)
SELECT document_id, full_document
FROM ranked
WHERE rn = 1 AND operation_type IN ('insert', 'update', 'replace')
ORDER BY document_id
"""


def _envelope(spark, sf_dir):
    e = events_sane(spark, sf_dir)
    op = (
        F.when(F.col("event_type") == "signup", "insert")
        .when(F.col("event_type") == "purchase", "delete")
        .otherwise("update")
    )
    doc = F.concat(
        F.lit('{"user_id":'), F.col("user_id").cast("string"),
        F.lit(',"cents":'),
        F.floor(F.col("value") * F.lit(100.0)).cast("long").cast("string"),
        F.lit("}"),
    )
    return e.select(
        F.lpad(F.col("event_id").cast("string"), 12, "0").alias("resume_token"),
        op.alias("operation_type"),
        F.col("user_id").cast("string").alias("document_id"),
        F.when(F.col("event_type") != "purchase", doc).alias("full_document"),
        F.lit(None).cast("string").alias("db"),
        F.lit(None).cast("string").alias("coll"),
        F.lit(None).cast("string").alias("updated_fields"),
        F.lit(None).cast("array<string>").alias("removed_fields"),
        F.col("ts").alias("wall_time"),
        F.unix_micros(F.col("ts")).alias("cluster_time"),
    )


@register("cdc_apply_state", oracle=_CDC_APPLY_ORACLE, bench=True,
          doc="CDC change log folded to live state (last op wins; final "
              "delete removes the doc) — the reference's core pipeline")
def cdc_apply_state(spark, sf_dir):
    """The Mongo-change-stream -> current-state fold (transforms/
    cdc.py:apply_cdc; reference sources/mongo.go:23-41 envelope,
    FullDocument=UpdateLookup contract). One shuffle on document_id,
    argmax aggregation — O(changed keys) inside foreachBatch when run
    incrementally."""
    from wire_spark.transforms.cdc import apply_cdc

    return apply_cdc(_envelope(spark, sf_dir)).orderBy("document_id")


_CDC_STATS_ORACLE = _ENVELOPE_SQL_CTE + """
SELECT operation_type,
       count(*) AS n_ops,
       count(DISTINCT document_id) AS n_docs
FROM env
GROUP BY operation_type
ORDER BY operation_type
"""


@register("cdc_op_stats", oracle=_CDC_STATS_ORACLE, bench=True,
          doc="CDC operational summary: op counts and distinct documents "
              "per operation type")
def cdc_op_stats(spark, sf_dir):
    env = _envelope(spark, sf_dir)
    return (
        env.groupBy("operation_type")
        .agg(
            F.count(F.lit(1)).alias("n_ops"),
            F.countDistinct("document_id").alias("n_docs"),
        )
        .orderBy("operation_type")
    )
