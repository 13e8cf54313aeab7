"""Query catalog: every operator exposed through the driver contract.

Each entry pairs a Spark implementation ``fn(spark, sf_dir) ->
DataFrame`` with an equivalent ANSI-SQL oracle string runnable by
DuckDB over the same parquet tables (or ``None`` for ops that are not
SQL-expressible — the driver then records a weaker rows-only check).

Column names are part of the contract: the driver's comparator sorts
columns by name and hashes values, so the Spark result and the oracle
must agree on every output column name AND value. All float aggregates
are rounded identically on both sides (sums to 2 dp, ratios/avgs to
4-6 dp) so IEEE summation-order noise cannot flip the hash.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

#: name -> (spark fn, oracle sql or None)
REGISTRY: dict[str, "CatalogQuery"] = {}

_QUERY_MODULES = (
    "wire_spark.queries.relational",
    "wire_spark.queries.windows",
    "wire_spark.queries.events",
    "wire_spark.queries.kv",
    "wire_spark.queries.text",
    "wire_spark.queries.dedup",
    "wire_spark.queries.similarity",
    "wire_spark.queries.extras",
    "wire_spark.queries.tpch",
    "wire_spark.queries.extras2",
    "wire_spark.queries.extras3",
    "wire_spark.queries.extras4",
    "wire_spark.queries.sampling",
    "wire_spark.queries.curation",
    "wire_spark.queries.cdc_queries",
    "wire_spark.queries.clustering",
)


@dataclass
class CatalogQuery:
    name: str
    fn: QueryFn
    oracle: str | None
    doc: str = ""
    bench: bool = field(default=False)  # include in bench.py headline set


def register(name: str, oracle: str | None = None, doc: str = "", bench: bool = False):
    """Decorator registering a catalog query."""

    def deco(fn: QueryFn) -> QueryFn:
        REGISTRY[name] = CatalogQuery(name=name, fn=fn, oracle=oracle, doc=doc, bench=bench)
        return fn

    return deco


def load_registry() -> dict[str, CatalogQuery]:
    """Import all query modules (side effect: populate REGISTRY)."""
    for mod in _QUERY_MODULES:
        importlib.import_module(mod)
    return REGISTRY
