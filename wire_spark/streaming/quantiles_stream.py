"""Windowed quantile monitor: per-closed-window p50/p90/p99 from a
bucketed value histogram — the streaming sibling of the batch
``quantile_histogram_sketch`` / ``session_dwell_percentiles``
queries (histogram-navigated percentiles, never a sort).

Why on the ingest path: latency/size/score percentiles are the SLO
numbers every pipeline watches, and a per-window histogram gives
them with state bounded by (live windows x buckets) — a per-window
sort would hold every raw value in state.

Determinism contract (batch-parity tested): values floor into
fixed-width integer buckets row-wise; a closed window's quantile is
the UPPER BOUND of the smallest bucket whose cumulative count
reaches ceil(q * n) — exact integer arithmetic, so the streaming
answer equals the identical batch computation on that window's
slice bit-for-bit.  Reported values are bucket upper bounds (the
histogram sketch's guarantee: true quantile lies within one bucket
width below), the same semantics as the batch sketch query.

Shape: ONE windowed aggregation to (window, bucket) counts (the
only stateful operator; state = live-windows x occupied buckets),
then the chained ``window_time`` aggregation folds each closed
window's histogram into a bounded array row, and the quantile walk
runs INSIDE the array with higher-order functions — no second
stateful operator, no join on the aggregated stream.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_QUANTILES = (50, 90, 99)  # percent, integer


def _bucket_quantile(pct: int) -> Column:
    """Upper bound of the smallest bucket with cum count >= ceil(pct% * n),
    computed by a struct-accumulator fold over the bucket-sorted
    histogram array ``g`` (fields: b, c) with total ``n``."""
    return F.expr(
        f"""
        aggregate(
          array_sort(g, (x, y) -> CASE WHEN x.b < y.b THEN -1
                                       WHEN x.b > y.b THEN 1 ELSE 0 END),
          named_struct('cum', CAST(0 AS BIGINT), 'hit', CAST(NULL AS BIGINT)),
          (acc, e) -> named_struct(
            'cum', acc.cum + e.c,
            'hit', CASE WHEN acc.hit IS NULL
                         AND (acc.cum + e.c) * 100 >= {pct} * n
                        THEN e.b ELSE acc.hit END),
          acc -> acc.hit
        )
        """
    )


def windowed_quantiles(
    stream: DataFrame,
    value_col: str,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "1 hour",
    bucket_width: int = 100,
) -> DataFrame:
    """Per closed window: (w_start, w_end, n, p50_hi, p90_hi, p99_hi)
    — bucket-upper-bound percentiles of ``value_col`` (integer-floored
    into ``bucket_width``-wide buckets row-wise)."""
    cells = (
        stream.filter(F.col(value_col).isNotNull())
        # ^ SQL percentile semantics: NULL values are not part of the
        # distribution.  Without the filter they would form a NULL
        # bucket whose position in the array_sort comparator is
        # undefined, silently shifting every quantile.
        .withWatermark(ts_col, watermark)
        .groupBy(
            F.window(ts_col, window).alias("w"),
            F.floor(F.col(value_col) / F.lit(bucket_width))
            .cast("long")
            .alias("b"),
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )
    grid = cells.groupBy(
        F.window(F.window_time("w"), window).alias("w2")
    ).agg(
        F.collect_list(F.struct("b", "c")).alias("g"),
        F.sum("c").alias("n"),
    )
    out = grid.select(
        F.col("w2.start").alias("w_start"),
        F.col("w2.end").alias("w_end"),
        "n",
        *[
            ((_bucket_quantile(p) + 1) * bucket_width).alias(f"p{p}_hi")
            for p in _QUANTILES
        ],
    )
    return out
