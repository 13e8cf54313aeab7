"""Data model: the Job envelope and pipeline configuration.

Mirrors the reference's fundamental abstractions (SURVEY.md §1.1):

- ``Job`` (internal/models/job.go:14-25): ``{ID UUIDv7, data any,
  nodeCreatedAt/UpdatedAt, eventTime, priority}`` — here one Row of a
  (streaming) DataFrame with envelope columns.
- ``SourceConfig``/``SinkConfig`` (sources/config.go:3-8,
  sinks/config.go): ``{name, type, key, config map[string]string}`` —
  kept as dataclasses so YAML/JSON pipeline definitions round-trip.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Envelope columns added around a payload (SURVEY.md §1.1 Job row).
JOB_ENVELOPE_SCHEMA = T.StructType(
    [
        T.StructField("job_id", T.StringType(), False),
        T.StructField("event_time", T.TimestampType(), True),
        T.StructField("ingest_time", T.TimestampType(), False),
        T.StructField("priority", T.IntegerType(), False),
        T.StructField("value", T.StringType(), True),
    ]
)


def uuid7_col() -> Column:
    """Time-ordered unique id, the UUIDv7 analog (job.go:60).

    Millisecond epoch hex prefix + random uuid suffix: sorts by
    creation time, globally unique, and — per the reference's own
    rule (job.go:85-87) — the total-order tiebreaker for conflict
    resolution, instead of wall clocks.
    """
    millis_hex = F.lpad(F.conv(F.unix_millis(F.current_timestamp()).cast("string"), 10, 16), 12, "0")
    return F.concat_ws("-", millis_hex, F.expr("uuid()"))


def with_envelope(
    df: DataFrame,
    value_col: str = "value",
    event_time_col: str | None = None,
    priority: int = 0,
) -> DataFrame:
    """Wrap a payload column in the Job envelope.

    ``priority`` is always 0 in the reference (job.go:91);
    ``event_time`` parses RFC3339 from the payload when requested
    (job.go:69-81 — parse failure yields NULL rather than the
    reference's zero time; NULL propagates correctly through
    watermarks, zero-time would not).
    """
    out = df.select(
        uuid7_col().alias("job_id"),
        (
            F.try_to_timestamp(F.col(event_time_col))  # soft-fail (job.go:71-80)
            if event_time_col
            else F.lit(None).cast("timestamp")
        ).alias("event_time"),
        F.current_timestamp().alias("ingest_time"),
        F.lit(priority).alias("priority"),
        F.col(value_col).cast("string").alias("value"),
    )
    return out


@dataclass
class SourceConfig:
    """sources/config.go:3-8 analog."""

    name: str
    type: str
    key: str
    config: dict[str, str] = field(default_factory=dict)


@dataclass
class SinkConfig:
    """sinks/config.go analog."""

    name: str
    type: str
    key: str
    config: dict[str, str] = field(default_factory=dict)
