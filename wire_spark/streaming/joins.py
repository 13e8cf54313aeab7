"""Stream-stream and stream-static joins with watermarked state.

Reference declared intent: "Stream JOINs" (ROADMAP.md:105) — nothing
implemented there. Spark gives both natively; these builders add the
watermark/time-bound discipline that keeps join state finite:

- stream-stream inner join REQUIRES watermarks on both sides plus a
  time-range condition, else state grows without bound;
- stream-static join needs none (static side is just a lookup).

Scale notes: join state is kept per key within the watermark horizon;
the range condition below bounds it to ``window`` of events per key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Join two streams on a key where right events fall within
    ``[left_time - window, left_time]`` — the standard enrichment
    join (e.g. click joined to impressions in the last hour)."""
    lw = left.withWatermark(left_time, watermark)
    rw = right.withWatermark(right_time, watermark)
    l_t, r_t = F.col(f"l.{left_time}"), F.col(f"r.{right_time}")
    return lw.alias("l").join(
        rw.alias("r"),
        (F.col(f"l.{on}") == F.col(f"r.{on}"))
        & (r_t <= l_t)
        & (r_t >= l_t - F.expr(f"INTERVAL {window}")),
        how,
    )


def stream_static_join(
    stream: DataFrame, static: DataFrame, on: str, how: str = "left"
) -> DataFrame:
    """Enrich a stream against a static dimension table; the static
    side is re-read per micro-batch (picks up slowly-changing dims)
    and broadcast when small."""
    return stream.join(F.broadcast(static), on, how)
