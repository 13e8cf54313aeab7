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
    from pyspark.sql.types import StructField, StructType

    lt = left.withColumn("__ts", F.col(left_time)).withColumn("__side", F.lit(1))
    # right rows with NULL time have no position on the timeline; left
    # in, they would sort first and act as default matches for every
    # left row — drop them up front.
    rt = (
        right.filter(F.col(right_time).isNotNull())
        .withColumn("__ts", F.col(right_time))
        .withColumn("__side", F.lit(0))
    )
    l_cols = [c for c in left.columns]
    # all value columns ride in ONE struct so the match is a single
    # right ROW — per-column last(ignorenulls) could stitch fields
    # from different right rows when the newest row has NULL in one.
    v_type = StructType([StructField(c, right.schema[c].dataType) for c in value_cols])
    combined = lt.select(
        on, "__ts", "__side",
        F.lit(None).cast(v_type).alias("__v"),
        *[F.col(c).alias(f"__l_{c}") for c in l_cols if c != on],
    ).unionByName(
        rt.select(
            on, "__ts", "__side",
            F.struct(*[F.col(c) for c in value_cols]).alias("__v"),
            *[F.lit(None).cast(left.schema[c].dataType).alias(f"__l_{c}") for c in l_cols if c != on],
        )
    )
    # right rows sort BEFORE left rows at equal ts (side 0 < 1), so a
    # right row at exactly left.ts matches (<= semantics); __v as the
    # final key makes tied right timestamps deterministic (max struct
    # wins) instead of partition-order-dependent.
    w = (
        W.partitionBy(on)
        .orderBy("__ts", "__side", "__v")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    filled = combined.select(
        on, "__ts", "__side",
        *[F.col(f"__l_{c}") for c in l_cols if c != on],
        F.last("__v", ignorenulls=True).over(w).alias("__m"),
    )
    return (
        filled.filter(F.col("__side") == 1)
        .select(
            on,
            *[F.col(f"__l_{c}").alias(c) for c in l_cols if c != on],
            *[F.col("__m")[c].alias(f"matched_{c}") for c in value_cols],
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

    Only inner/left-side joins are supported: right/full outer would
    emit every unmatched small-side row once per salt replica.

    Limitation: the salt is a hash of the big side's own columns so it
    is deterministic under task retry — but rows that are FULLY
    identical (repeated default/null records, a common skew shape)
    hash to the same bucket and are NOT rebalanced. Indistinguishable
    rows cannot be split deterministically without an order-dependent
    id (rand()/monotonically_increasing_id are retry-unsafe mid-join).
    For identical-row skew use AQE's skew-join instead
    (spark.sql.adaptive.skewJoin.enabled) — it splits by partition
    byte size, not key content, so it handles that case.
    """
    if how not in ("inner", "left", "leftouter", "left_outer", "left_semi",
                   "leftsemi", "left_anti", "leftanti"):
        raise ValueError(
            f"salted_join supports inner/left joins, not {how!r}: the small "
            "side is replicated per salt bucket, so unmatched small-side "
            "rows of a right/full outer join would appear `salt` times"
        )
    # salt from a hash of the row's own columns — deterministic under
    # task retry (F.rand's per-task stream re-seeds by partition id,
    # so a retried/recombined task could route rows differently
    # mid-join and drop or duplicate matches).
    big_s = big.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salt)).cast("int")
    )
    small_s = small.crossJoin(
        F.broadcast(
            big.sparkSession.range(salt).select(F.col("id").cast("int").alias("__salt"))
        )
    )
    out = big_s.join(small_s, [on, "__salt"], how)
    return out.drop("__salt")


def band_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    band: int,
) -> DataFrame:
    """All (left, right) row pairs sharing the ``on`` key whose
    integer time columns differ by at most ``band``: the band join,
    expressed as bucket blocking so it plans as a pure equi-join.

    The left side is emitted into its ``band``-width bucket and both
    neighbors (3x amplification, constant); the join key is
    (on, bucket) and the exact |lt - rt| <= band predicate filters
    the residual. A qualifying pair's bucket ids differ by at most 1,
    so it meets in exactly one of the three distinct emitted buckets —
    no dedup pass, no cross product, and AQE can skew-split the
    equi-join like any other. Column names other than ``on`` must be
    disjoint between the two sides.

    Scale notes: shuffle cost is O(3|left| + |right|) rows keyed by
    (on, bucket); per-task candidate count is bounded by per-bucket
    density rather than per-key density, which is what tames hot keys
    with long histories. ``band`` must be a positive integer in the
    same units as the time columns.
    """
    if band <= 0:
        raise ValueError("band must be a positive integer")
    overlap = (set(left.columns) - {on}) & (set(right.columns) - {on})
    if overlap:
        raise ValueError(f"column collision between sides: {sorted(overlap)}")
    bk = F.expr(f"{left_time} div {band}")
    lt = left.withColumn("__bk", F.explode(F.array(bk - 1, bk, bk + 1)))
    rt = right.withColumn("__bk", F.expr(f"{right_time} div {band}"))
    return (
        lt.join(rt, [on, "__bk"])
        .filter(F.abs(F.col(left_time) - F.col(right_time)) <= band)
        .drop("__bk")
    )
