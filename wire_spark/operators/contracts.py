"""Data contracts: declarative expectation checks evaluated in ONE
aggregate pass, with a release gate decision.

The reference validates configs up front (config.go) but ships no
data-quality gate; production pipelines need one between ingest and
publish. A contract is a list of named boolean expectations over the
rows; validation computes every expectation's pass rate in a single
map-combinable aggregation (one scan at any table size — the same
cost as `count()`), and the gate passes only if every rule meets its
threshold.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class Expectation:
    name: str
    predicate: Column  # boolean per row; NULL counts as a failure
    min_pass_rate: float = 1.0  # 1.0 = hard rule, <1.0 tolerates noise


@dataclass
class ContractResult:
    n_rows: int
    rules: dict[str, tuple[int, float]]  # name -> (n_pass, pass_rate)
    failed: list[str] = field(default_factory=list)

    @property
    def ok(self) -> bool:
        return not self.failed


def validate(df: DataFrame, expectations: list[Expectation]) -> ContractResult:
    """Evaluate every expectation in one aggregation over ``df``.

    NULL predicate results count as failures (a null key fails
    ``col('k').isNotNull()`` trivially, but also ``col('v') > 0`` —
    the conservative reading a release gate wants). Returns per-rule
    pass counts/rates and the list of rules below their threshold.

    Scale: one scan, partial-aggregated map-side; the result is one
    row however many rules the contract has. Run it per partition /
    per ingest batch and gate the publish step on ``result.ok``.

    Rule names must be unique (duplicates would make the aggregate
    columns ambiguous and silently corrupt pass rates); internally
    each rule is aliased by POSITION (``__rule_0``, ``__rule_1``, …)
    so a rule named ``__n`` — or anything else — can never collide
    with the row-count column.  Duplicate names raise ``ValueError``
    up front rather than gating a release on garbage.
    """
    seen: set[str] = set()
    for e in expectations:
        if e.name in seen:
            raise ValueError(f"duplicate expectation name: {e.name!r}")
        seen.add(e.name)
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, e in enumerate(expectations):
        aggs.append(
            F.sum(
                F.when(e.predicate.isNull(), 0)
                .when(e.predicate, 1)
                .otherwise(0)
            ).alias(f"__rule_{i}")
        )
    row = df.agg(*aggs).first()
    n = int(row["__n"])
    rules: dict[str, tuple[int, float]] = {}
    failed: list[str] = []
    for i, e in enumerate(expectations):
        n_pass = int(row[f"__rule_{i}"] or 0)
        rate = (n_pass / n) if n else 1.0
        rules[e.name] = (n_pass, rate)
        if rate < e.min_pass_rate:
            failed.append(e.name)
    return ContractResult(n_rows=n, rules=rules, failed=failed)
