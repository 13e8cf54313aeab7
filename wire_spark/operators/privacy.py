"""Privacy/governance operators: k-anonymity measurement and
remediation by quasi-identifier generalization.

`kanonymity_audit` (queries/features.py) is the measure side; this
module is the fix: walk a generalization ladder (progressively
coarser quasi-identifier encodings) and stop at the first level whose
minimum equivalence-class size meets the release threshold. The
classic Samarati-style full-domain generalization, expressed as one
aggregate per ladder level — each check is a single map-combinable
groupBy, so remediation costs L scans for an L-level ladder
regardless of table size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def min_class_size(df: DataFrame, qi: dict[str, Column]) -> int:
    """Smallest equivalence-class size under the quasi-identifier
    encoding ``qi`` (name -> expression). The k in k-anonymity."""
    out = (
        df.select(*(c.alias(n) for n, c in qi.items()))
        .groupBy(*qi.keys())
        .agg(F.count(F.lit(1)).alias("k"))
        .agg(F.min("k").alias("mk"))
        .first()
    )
    return int(out.mk) if out.mk is not None else 0


def generalize_to_k(
    df: DataFrame,
    ladder: list[dict[str, Column]],
    k: int = 5,
) -> tuple[int, DataFrame]:
    """Return ``(level, generalized)`` for the FIRST ladder level
    whose minimum class size is >= ``k``; ``generalized`` is ``df``
    with the quasi-identifier columns replaced by that level's
    encodings (non-QI columns untouched).

    ``ladder[0]`` is the most specific encoding (the release you'd
    prefer); each subsequent level must be a coarsening. Raises
    ``ValueError`` when even the last level leaks (the caller then
    suppresses outliers or drops a QI column entirely — both are just
    one more ladder level).

    Scale: level checks are sequential single-aggregate jobs (ladders
    are short — 3-5 levels); no row-grain state, no sort. On a real
    cluster, run the checks bottom-up exactly as here: the common
    case releases at level 0/1 and never pays for the coarse levels.
    """
    for level, qi in enumerate(ladder):
        if min_class_size(df, qi) >= k:
            out = df
            for name, col in qi.items():
                out = out.withColumn(name, col)
            return level, out
    raise ValueError(
        f"no ladder level reaches k={k}; add a coarser level "
        "(suppress outlier classes or drop a quasi-identifier)"
    )
