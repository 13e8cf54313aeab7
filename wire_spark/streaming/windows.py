"""Streaming window aggregation builders: tumbling / sliding / session
with watermarks.

These deliver the reference's declared-intent windowing operators
(ROADMAP.md:96-100: tumbling/sliding/session windows, event-time
processing, watermark support) as Structured-Streaming-ready
transforms. The same expressions run in batch mode — the batch forms
are oracle-verified in wire_spark/queries/events.py; these builders
add the watermark, which only exists on streams.

Scale notes: streaming agg state is bounded by
(#keys x #open-windows); the watermark bounds #open-windows, so state
is O(keys) — safe for million-key streams. Session windows use
Spark's native session_window merge state.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _flatten_window(agged: DataFrame, keys: Sequence[str], start: str, end: str) -> DataFrame:
    agg_cols = [c for c in agged.columns if c != "w" and c not in keys]
    return agged.select(
        F.col("w.start").alias(start),
        F.col("w.end").alias(end),
        *keys,
        *agg_cols,
    )


def tumbling_agg(
    df: DataFrame,
    time_col: str,
    size: str,
    aggs: Sequence[Column],
    keys: Sequence[str] = (),
    watermark: str = "10 minutes",
) -> DataFrame:
    """groupBy(window(time, size)) with a watermark (ROADMAP.md:97)."""
    agged = (
        df.withWatermark(time_col, watermark)
        .groupBy(F.window(time_col, size).alias("w"), *keys)
        .agg(*aggs)
    )
    return _flatten_window(agged, keys, "window_start", "window_end")


def sliding_agg(
    df: DataFrame,
    time_col: str,
    size: str,
    slide: str,
    aggs: Sequence[Column],
    keys: Sequence[str] = (),
    watermark: str = "10 minutes",
) -> DataFrame:
    agged = (
        df.withWatermark(time_col, watermark)
        .groupBy(F.window(time_col, size, slide).alias("w"), *keys)
        .agg(*aggs)
    )
    return _flatten_window(agged, keys, "window_start", "window_end")


def session_agg(
    df: DataFrame,
    time_col: str,
    gap: str,
    aggs: Sequence[Column],
    keys: Sequence[str] = (),
    watermark: str = "10 minutes",
) -> DataFrame:
    """session_window with inactivity gap (ROADMAP.md:97)."""
    agged = (
        df.withWatermark(time_col, watermark)
        .groupBy(*keys, F.session_window(time_col, gap).alias("w"))
        .agg(*aggs)
    )
    return _flatten_window(agged, keys, "session_start", "session_end")
