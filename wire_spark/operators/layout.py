"""At-rest layout operators: Z-order (Morton) clustered writes.

The write-path counterpart of the ``layout_zorder_audit`` catalog
query (queries/extras5.py): physically cluster a table on the
interleaved bits of two dimensions so parquet min/max file statistics
prune multi-dimensional range queries — the OPTIMIZE ZORDER of
Delta/Iceberg, expressed with stock Spark primitives
(repartitionByRange + sortWithinPartitions on the Morton key).

Why it matters at 100 TB: a table range-partitioned on ONE column
prunes only that column's predicates; any selective filter on a
second dimension scans every file. Z-ordering bounds each file's
extent in BOTH dimensions (each file covers a ~square tile of the
2-D space), so a box query touches O(perimeter) files instead of all
of them. Verified with real parquet footer statistics in
tests/test_scale_patterns.py.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def morton_key(x: Column, y: Column, bits: int = 10) -> Column:
    """Interleave the low ``bits`` of two non-negative int columns
    into a single Z-order key (x gets even bit positions, y odd) —
    pure JVM bit arithmetic, whole-stage-codegen friendly."""
    return morton_key_nd([x, y], bits=bits)


def morton_key_nd(cols: list[Column], bits: int = 10) -> Column:
    """N-dimensional Morton key: bit ``i`` of column ``d`` lands at
    position ``i * n_dims + d`` — the straight generalization of the
    2-D interleave (identical to it for ``n_dims=2``), still pure JVM
    bit arithmetic.  ``n_dims * bits`` must fit the 64-bit key
    (raises otherwise).  Three or four dimensions are the practical
    ceiling: each added dimension halves the per-dimension resolution
    at fixed key width, so per-file min/max extents widen — the
    standard Z-order trade documented by every lakehouse OPTIMIZE."""
    n = len(cols)
    if n < 1:
        raise ValueError("morton_key_nd: need at least one column")
    if n * bits > 63:
        raise ValueError(
            f"morton_key_nd: {n} dims x {bits} bits exceeds a 64-bit key"
        )
    # cast to LONG first: Spark's shiftleft on an INT operand uses
    # Java int semantics (shift distance masked & 31, 32-bit result),
    # so an IntegerType column with any bit position >= 31 would wrap
    # into silently colliding keys while the 63-bit guard above still
    # passes
    longs = [c.cast("long") for c in cols]
    parts = []
    for i in range(bits):
        for d, c in enumerate(longs):
            parts.append(
                F.shiftleft(
                    F.shiftright(c, i).bitwiseAND(F.lit(1)), i * n + d
                )
            )
    return reduce(lambda a, b: a.bitwiseOR(b), parts)


def zorder_write(
    df: DataFrame,
    path: str,
    col_x: str,
    col_y: str,
    bits: int = 10,
    n_files: int = 16,
) -> None:
    """Write ``df`` as parquet clustered on the Z-order of
    (``col_x``, ``col_y``).

    Both columns are min/max-scaled into [0, 2^bits) grid cells (two
    scalar aggregates — one tiny job — broadcast back as literals),
    interleaved into a Morton key, then range-partitioned into
    ``n_files`` output files and sorted within each. Range
    partitioning gives files disjoint Morton intervals, i.e. bounded
    tiles in the (x, y) plane, which is exactly what makes the
    per-file min/max footer statistics selective on BOTH columns.

    At scale: the scaling pass is one map-combinable aggregate; the
    clustered write is one range shuffle (sampling-based bounds) plus
    a per-partition sort — the same cost class as any global
    ``orderBy`` write, and a one-time cost the layout amortizes over
    every subsequent pruned query.

    NULL handling: a NULL in either cluster column lands in the TOP
    grid cell (``2^bits - 1``) — the coalesce inside ``scaled`` makes
    that explicit rather than leaning on ``least``'s null-skipping
    (which happens to give the same cell), so null rows cluster into
    the last Morton tile with a non-NULL key (min/max footers ignore
    nulls, so that tile's stats stay tight for the non-null rows
    sharing its files, and parquet's null-count stat still serves
    IS NULL pruning).  An all-NULL cluster column has no extent to
    scale into — that is a caller error and raises ``ValueError``
    rather than silently writing an unprunable layout.
    """
    lo_x, hi_x, lo_y, hi_y = df.agg(
        F.min(col_x), F.max(col_x), F.min(col_y), F.max(col_y)
    ).first()
    for name, lo, hi in ((col_x, lo_x, hi_x), (col_y, lo_y, hi_y)):
        if lo is None or hi is None:
            raise ValueError(
                f"zorder_write: cluster column {name!r} is all-NULL "
                "(or the table is empty) — no extent to scale into"
            )
    cells = (1 << bits) - 1

    def scaled(c: str, lo, hi) -> Column:
        span = float(hi - lo) if hi != lo else 1.0
        return F.least(
            F.lit(cells),
            F.coalesce(  # NULL value -> top tile, never a NULL key
                F.floor(
                    (F.col(c) - F.lit(lo)) / F.lit(span) * F.lit(cells + 1)
                ).cast("long"),
                F.lit(cells),
            ),
        )

    (
        df.withColumn(
            "__z",
            morton_key(scaled(col_x, lo_x, hi_x), scaled(col_y, lo_y, hi_y), bits),
        )
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
