"""Materialized views: a streaming aggregation continuously
maintaining a queryable table.

Reference declared intent: "Materialized views" (ROADMAP.md:106).
The Spark-native pattern: an aggregating streaming query in update
mode, with foreachBatch atomically replacing (or upserting into) the
stored table each micro-batch. Readers always see a complete
consistent snapshot; the checkpoint makes maintenance exactly-once.

Scale notes: the view table is the AGGREGATED relation (small);
rewriting it per batch is O(|view|), not O(|stream|). For huge views
swap the overwrite for a keyed MERGE into a table format with upsert
support — the surrounding machinery is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery


def materialize(
    agg: DataFrame,
    path: str,
    checkpoint: str,
    query_name: str = "materialized_view",
) -> StreamingQuery:
    """Maintain ``agg`` (a streaming aggregation in complete mode) as
    a parquet table at ``path``."""

    def write_snapshot(batch_df: DataFrame, epoch_id: int) -> None:
        # complete-mode batch holds the full view: atomic overwrite
        batch_df.write.mode("overwrite").parquet(path)

    return (
        agg.writeStream.queryName(query_name)
        .outputMode("complete")
        .foreachBatch(write_snapshot)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def read_view(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)
