"""Pipeline = one Structured Streaming query; Registry = the key-paired
source/sink map.

Reference mapping (SURVEY.md §1.1, §3.1):

- ``DataPipeline{Source, Sink, key, operations}``
  (internal/pipeline/pipeline.go:36-58) -> ``Pipeline`` holding a
  source binding, transform chain, sink binding; ``run()`` =
  ``readStream -> transforms -> writeStream.start()``.
- ``Show()`` prints "src -> sink" (pipeline.go:216-218).
- Key-pairing of sources and sinks, duplicate-key update semantics
  (config.go:90-149: a re-registered key replaces the mapping),
  close-by-key (config.go:171-214) -> ``PipelineRegistry``.
- The hash-partition + per-partition worker mesh
  (partition.go:28-56, pipeline.go:149-181) is replaced by Spark's
  shuffle/task parallelism; an explicit ``repartition(n, col)`` stage
  is available as a transform for callers who want the reference's
  partition-by-content behavior.
- Raft-replicated config persistence (StoreInDatabase("config", ...),
  service.go:1870) -> ``registry.persist()`` into a KVStore.

Exactly-once: checkpointed sources + idempotent file sinks give the
reference's declared-intent delivery guarantee (ROADMAP.md:136) per
micro-batch; there is no consensus tier to operate.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from wire_spark.model import SinkConfig, SourceConfig
from wire_spark.sinks import DataSink, data_sink_factory
from wire_spark.sources import DataSource, data_source_factory
from wire_spark.transforms.core import TransformFn


def repartition_stage(n: int, *cols: str) -> TransformFn:
    """The reference's hash partitioner (partition.go:28-56) as an
    explicit exchange stage: hash(cols) % n routing. Spark's Murmur3
    replaces the FNV-1a-of-stringified-record hash (hash.go:20-31,
    self-admittedly 'really slow')."""

    def stage(df: DataFrame) -> DataFrame:
        return df.repartition(n, *[F.col(c) for c in cols]) if cols else df.repartition(n)

    return stage


@dataclass
class Pipeline:
    source: DataSource
    sink: DataSink
    key: str
    transforms: list[TransformFn] = field(default_factory=list)
    query: StreamingQuery | None = None

    def show(self) -> str:
        """pipeline.go:216-218."""
        return f"{self.source.cfg.name} -> {self.sink.cfg.name}"

    def add_operation(self, fn: TransformFn) -> "Pipeline":
        """AddOperation (pipeline.go:221-240) — linear chain."""
        self.transforms.append(fn)
        return self

    def run(self, spark: SparkSession, available_now: bool = False) -> StreamingQuery:
        """Source.Connect -> transform chain -> Sink.Write
        (pipeline.go:93-159), as one streaming query."""
        df = self.source.read(spark)
        for t in self.transforms:
            df = df.transform(t)
        self.query = self.sink.write(df, query_name=self.key, available_now=available_now)
        return self.query

    def stop(self) -> None:
        if self.query is not None and self.query.isActive:
            self.query.stop()

    @property
    def is_active(self) -> bool:
        return self.query is not None and self.query.isActive


class PipelineRegistry:
    """Key-paired source/sink registry (config.go:17-24
    ``mappedDataPipelines`` + pairing logic :90-149)."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self._sources: dict[str, SourceConfig] = {}
        self._sinks: dict[str, SinkConfig] = {}
        self._pipelines: dict[str, Pipeline] = {}

    # -- registration (duplicate key = update, config.go:99-114) -----

    def add_source(self, cfg: SourceConfig) -> None:
        self._sources[cfg.key] = cfg

    def add_sink(self, cfg: SinkConfig) -> None:
        self._sinks[cfg.key] = cfg

    def create(self, key: str, transforms: list[TransformFn] | None = None) -> Pipeline:
        """Pair the source and sink registered under ``key``
        (config.go:90-149); error when either half is missing."""
        if key not in self._sources:
            raise KeyError(f"no source registered for key {key!r}")
        if key not in self._sinks:
            raise KeyError(f"no sink registered for key {key!r}")
        p = Pipeline(
            source=data_source_factory(self._sources[key]),
            sink=data_sink_factory(self._sinks[key]),
            key=key,
            transforms=list(transforms or []),
        )
        # duplicate create replaces the old pipeline (stop it first)
        old = self._pipelines.get(key)
        if old is not None:
            old.stop()
        self._pipelines[key] = p
        return p

    def run(self, key: str, available_now: bool = False) -> StreamingQuery:
        return self._pipelines[key].run(self.spark, available_now=available_now)

    def close(self, key: str) -> None:
        """close-by-key (config.go:171-214)."""
        p = self._pipelines.pop(key, None)
        if p is not None:
            p.stop()

    def close_all(self) -> None:
        for key in list(self._pipelines):
            self.close(key)

    def active(self) -> dict[str, bool]:
        return {k: p.is_active for k, p in self._pipelines.items()}

    def show(self) -> dict[str, str]:
        return {k: p.show() for k, p in self._pipelines.items()}

    # -- persistence (service.go:1870 analog) ------------------------

    def to_json(self) -> str:
        return json.dumps(
            {
                "sources": {k: vars(v) for k, v in self._sources.items()},
                "sinks": {k: vars(v) for k, v in self._sinks.items()},
            },
            sort_keys=True,
        )

    def persist(self, kv) -> None:
        """Store the raw config under key 'config', exactly like the
        reference persists POST /connector bodies via StoreInDatabase
        (internal/http/service.go:1870) — the raw path, not the
        whitespace-normalizing SET statement."""
        kv.put("config", self.to_json())

    @classmethod
    def restore(cls, spark: SparkSession, kv) -> "PipelineRegistry":
        reg = cls(spark)
        raw = kv.get("config")
        if raw is not None:
            blob = json.loads(raw)
            for k, v in blob.get("sources", {}).items():
                reg.add_source(SourceConfig(**v))
            for k, v in blob.get("sinks", {}).items():
                reg.add_sink(SinkConfig(**v))
        return reg
