"""Sink factory: config ``type`` string -> writeStream binding.

Reference: ``DataSinkFactory`` (internal/pipeline/config.go:271-290;
"kafka" and "file" wired, elasticsearch commented out :275-278).

Semantics notes:

- The reference file sink appends JSON-lines, one object per line
  (sinks/file.go:75-123) — ``format("json")`` writes exactly that
  (a directory of JSON-lines parts; at scale a single append file is
  not a thing you want).
- The reference Kafka sink produces synchronously per record
  (kafka.go:62-76, a WaitGroup per message!); Spark's Kafka sink
  batches per micro-batch with checkpointed exactly-once-per-epoch.
- Elasticsearch maps doc "_id" (elasticsearch.go:70-129) ->
  ``es.mapping.id`` via the es-hadoop connector, or a foreachBatch
  bulk writer; gated here since no ES is available in tests.
- ``memory``/``console``/``noop`` are the test/debug sinks (the
  reference's writeToFile dev helper, pipeline.go:183-205).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import DataStreamWriter, StreamingQuery

from wire_spark.model import SinkConfig

_KNOWN = ("file", "json", "parquet", "memory", "console", "noop", "kafka")


class DataSink:
    def __init__(self, cfg: SinkConfig):
        self.cfg = cfg

    def write(self, df: DataFrame, query_name: str, available_now: bool = False) -> StreamingQuery:
        c = self.cfg.config
        t = self.cfg.type
        writer: DataStreamWriter = df.writeStream.queryName(query_name)
        if available_now:
            writer = writer.trigger(availableNow=True)
        elif "trigger_seconds" in c:
            writer = writer.trigger(processingTime=f"{c['trigger_seconds']} seconds")
        if "checkpoint" in c:
            writer = writer.option("checkpointLocation", c["checkpoint"])
        if t in ("file", "json", "parquet"):
            fmt = "json" if t in ("file", "json") else "parquet"
            return writer.format(fmt).option("path", c["path"]).start()
        if t == "memory":
            return writer.format("memory").start()
        if t == "console":
            return writer.format("console").start()
        if t == "noop":
            return writer.format("noop").start()
        if t == "kafka":
            return (
                writer.format("kafka")
                .option("kafka.bootstrap.servers", c["bootstrap_servers"])
                .option("topic", c["topic"])
                .start()
            )
        raise ValueError(f"unknown sink type: {t!r}")


def data_sink_factory(cfg: SinkConfig) -> DataSink:
    """config.go:271-290 analog."""
    if cfg.type not in _KNOWN:
        raise ValueError(f"unknown sink type: {cfg.type!r}")
    return DataSink(cfg)
