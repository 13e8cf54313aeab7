"""Custom join operators Spark lacks natively: as-of join and salted
(skew-resistant) join.

As-of join: for each left row, the most recent right row with
``right.ts <= left.ts`` per key — the standard time-series point-in-
time join. Spark has no native ASOF; the composition below expresses
it with a union + last_value window, which is exactly the
sort-merge-friendly formulation: one shuffle on (key), one sort on
(ts, side) — no range explosion, no per-row UDF.

Scale notes: cost is sort-merge over (key, ts) — the same as any
windowed op; skewed keys can be salted upstream. The union trick
beats a range join (no quadratic candidate blowup) and beats
broadcast-per-key loops (fully distributed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    value_cols: list[str],
) -> DataFrame:
    """Left as-of join: attach, to every left row, ``value_cols`` from
    the latest right row whose time <= the left row's time, per ``on``
    key. Unmatched left rows keep NULLs (left-join semantics).
    """
    lt = left.withColumn("__ts", F.col(left_time)).withColumn("__side", F.lit(1))
    rt = right.withColumn("__ts", F.col(right_time)).withColumn("__side", F.lit(0))
    l_cols = [c for c in left.columns]
    combined = lt.select(
        on, "__ts", "__side",
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__v_{c}") for c in value_cols],
        *[F.col(c).alias(f"__l_{c}") for c in l_cols if c != on],
    ).unionByName(
        rt.select(
            on, "__ts", "__side",
            *[F.col(c).alias(f"__v_{c}") for c in value_cols],
            *[F.lit(None).cast(left.schema[c].dataType).alias(f"__l_{c}") for c in l_cols if c != on],
        )
    )
    # right rows sort BEFORE left rows at equal ts (side 0 < 1), so a
    # right row at exactly left.ts matches (<= semantics)
    w = (
        W.partitionBy(on)
        .orderBy("__ts", "__side")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    filled = combined.select(
        on, "__ts", "__side",
        *[F.col(f"__l_{c}") for c in l_cols if c != on],
        *[
            F.last(F.col(f"__v_{c}"), ignorenulls=True).over(w).alias(f"__m_{c}")
            for c in value_cols
        ],
    )
    return (
        filled.filter(F.col("__side") == 1)
        .select(
            on,
            *[F.col(f"__l_{c}").alias(c) for c in l_cols if c != on],
            *[F.col(f"__m_{c}").alias(f"matched_{c}") for c in value_cols],
        )
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: salt the big side's hot keys across
    ``salt`` buckets and replicate the small side to every bucket.

    At 100 TB a single hot key (null ids, default values) serializes
    one reducer; salting rebalances at the cost of replicating the
    small side salt-fold. Prefer AQE skew-join first; use this when
    the skew is known and extreme.
    """
    big_s = big.withColumn("__salt", (F.rand(seed=0) * salt).cast("int"))
    small_s = small.crossJoin(
        F.broadcast(
            big.sparkSession.range(salt).select(F.col("id").cast("int").alias("__salt"))
        )
    )
    out = big_s.join(small_s, [on, "__salt"], how)
    return out.drop("__salt")
