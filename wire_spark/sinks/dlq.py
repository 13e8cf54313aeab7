"""Dead-letter queue + retry wrapper for streaming sinks.

Reference declared intent: dead-letter queues and retry/backoff
(ROADMAP.md:55-58) — unbuilt there. Spark-native shape: foreachBatch
wraps the per-batch write; rows that fail a validation predicate (or
the write itself, after ``max_attempts``) land in a DLQ table with
the error tag, and the main write proceeds with the good rows. The
checkpoint makes the whole batch retry-idempotent.
"""

from __future__ import annotations

import time


from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def with_dlq(
    df: DataFrame,
    valid: Column,
    out_path: str,
    dlq_path: str,
    checkpoint: str,
    max_attempts: int = 3,
    backoff_seconds: float = 0.1,
    query_name: str = "dlq_pipeline",
) -> StreamingQuery:
    """Route rows failing ``valid`` to the DLQ; write the rest, with
    bounded retry + linear backoff on write failure."""

    def handle_batch(batch_df: DataFrame, epoch_id: int) -> None:
        good = batch_df.filter(valid)
        bad = batch_df.filter(~valid | valid.isNull()).withColumn(
            "dlq_reason", F.lit("validation_failed")
        ).withColumn("dlq_epoch", F.lit(epoch_id))
        if bad.limit(1).count() > 0:
            bad.write.mode("append").json(dlq_path)
        attempt = 0
        while True:
            try:
                good.write.mode("append").json(out_path)
                return
            except Exception:
                attempt += 1
                if attempt >= max_attempts:
                    # poison batch: dead-letter everything, keep stream alive
                    good.withColumn("dlq_reason", F.lit("write_failed")).withColumn(
                        "dlq_epoch", F.lit(epoch_id)
                    ).write.mode("append").json(dlq_path)
                    return
                time.sleep(backoff_seconds * attempt)

    return (
        df.writeStream.queryName(query_name)
        .foreachBatch(handle_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
