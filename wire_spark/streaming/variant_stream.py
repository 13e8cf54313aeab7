"""Streaming schema-drift monitor for a schemaless (VARIANT-style)
JSON ingest column — the live sibling of
``queries/variant_ingest.variant_schema_profile``.

The reference ingests dynamic JSON payloads whose schema is inferred
per value, never declared (``internal/pipeline/pipeline.go:302-340``,
SURVEY §1.2).  A pipeline that shreds such payloads into typed
columns needs to notice, per window, when a key's type mix moves —
a scraper starts emitting strings where ints flowed, a new key
appears, a key goes null-heavy.  This monitor emits exactly the
batch profile's decision columns per closed event-time window so the
consumer can diff windows (or compare against the batch plan) and
alarm on drift.

Shape: stateless projection (parse → explode map → canonical label,
all JVM expressions, no Python) feeding ONE watermarked tumbling-
window aggregation grouped on (window, key).  State is bounded by
live-windows × distinct keys (payload schema size), never by stream
length.  The label CASE and the n_types / promoted decision
expressions are imported from the batch module — single-sourced, the
IPW band-CASE idiom — so the three forms (batch query, DuckDB
oracle, monitor) cannot drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from wire_spark.queries.variant_ingest import (
    N_TYPES_EXPR,
    PROMOTED_EXPR,
    SPARK_LABEL,
)


def windowed_variant_profile(
    stream: DataFrame,
    props_col: str = "props",
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "1 hour",
) -> DataFrame:
    """Per closed window and top-level payload key: (w_start, w_end,
    key, n_key, n_int, n_num, n_str, n_bool, n_null, n_array,
    n_object, n_types, promoted).

    Malformed and non-object payloads are dropped by the same
    ``from_json(…, 'map<string, variant>')`` NULL-banding gate the
    batch profile uses; duplicate keys inside one payload count per
    occurrence on both forms.  Payload-level coverage (the batch
    query's ``coverage_bp``) is deliberately absent — it needs a
    second, payload-grain aggregation; the monitor watches the type
    mix, the batch audit owns coverage.

    Event-time contract: rows with a NULL ``ts_col`` never enter a
    window (``F.window``/watermarking drop them), so a feed that
    starts losing timestamps fades from this monitor silently — the
    batch profile, which counts every payload regardless of event
    time, is the audit that catches that axis, and an ingest-time
    NULL-ts gate (``governance_stream.contract_gate``) is the live
    alarm for it.  Window-vs-batch diffs therefore only reconcile on
    corpora whose rows all carry in-domain timestamps.
    """
    labeled = (
        stream.select(
            F.col(ts_col).alias("ts"),
            F.expr(
                f"from_json({props_col}, 'map<string, variant>')"
            ).alias("m"),
        )
        .filter(F.col("m").isNotNull())
        .select("ts", F.explode("m").alias("key", "v"))
        .select(
            "ts",
            "key",
            F.expr("schema_of_variant(v)").alias("t"),
        )
        .select("ts", "key", F.expr(SPARK_LABEL).alias("label"))
    )
    cnt = lambda lbl: F.sum(  # noqa: E731 — local aggregation shorthand
        F.when(F.col("label") == lbl, F.lit(1)).otherwise(F.lit(0))
    ).cast("bigint")
    prof = (
        labeled.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "key")
        .agg(
            F.count(F.lit(1)).alias("n_key"),
            cnt("int").alias("n_int"),
            cnt("num").alias("n_num"),
            cnt("str").alias("n_str"),
            cnt("bool").alias("n_bool"),
            cnt("null").alias("n_null"),
            cnt("array").alias("n_array"),
            cnt("object").alias("n_object"),
        )
    )
    return prof.select(
        F.col("w.start").alias("w_start"),
        F.col("w.end").alias("w_end"),
        "key",
        "n_key",
        "n_int",
        "n_num",
        "n_str",
        "n_bool",
        "n_null",
        "n_array",
        "n_object",
        F.expr(f"CAST({N_TYPES_EXPR} AS BIGINT)").alias("n_types"),
        F.expr(PROMOTED_EXPR).alias("promoted"),
    )
