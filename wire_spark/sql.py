"""Parameterized SQL facade with rqlite-style parameter binding.

The reference's statement protocol carries exactly 5 scalar types +
null (internal/command/proto/command.proto:8-16) with JSON->parameter
coercion rules in internal/http/request_parser.go:131-229:
json integers -> int64, other numbers -> float64, bool, string, and
arrays of 0-255 ints -> bytes. ``bind`` reproduces that coercion;
``execute_sql`` passes through PySpark's parameterized ``spark.sql``
(named ``:name`` or positional ``?`` markers) so literals reach
Catalyst as typed parameters — no string splicing, plans stay
cacheable, injection-safe.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession


class ParameterError(ValueError):
    pass


def coerce_param(v: Any):
    """request_parser.go:131-229 type mapping."""
    if v is None or isinstance(v, (bool, int, float, str, bytes, bytearray)):
        # json.Number -> int64 when integral else float64 happens
        # naturally in Python; bool before int matters (bool is int)
        if isinstance(v, bool):
            return v
        if isinstance(v, int) and not (-(2**63) <= v < 2**63):
            raise ParameterError(f"integer out of int64 range: {v}")
        return v
    if isinstance(v, (list, tuple)):
        # arrays of 0-255 ints are BLOBs (request_parser.go:197-214)
        if all(isinstance(x, int) and 0 <= x <= 255 for x in v):
            return bytes(v)
        raise ParameterError(f"unsupported array parameter: {v!r}")
    raise ParameterError(f"unsupported parameter type: {type(v).__name__}")


def bind(params: dict[str, Any] | list[Any] | None):
    if params is None:
        return None
    if isinstance(params, dict):
        return {k: coerce_param(v) for k, v in params.items()}
    return [coerce_param(v) for v in params]


def execute_sql(
    spark: SparkSession,
    sql: str,
    params: dict[str, Any] | list[Any] | None = None,
) -> DataFrame:
    """Run SQL with typed parameters (spark.sql args=..., PySpark 3.4+).

    Named style:      execute_sql(s, "SELECT :x AS x", {"x": 1})
    Positional style: execute_sql(s, "SELECT ? AS x", [1])
    """
    bound = bind(params)
    if bound is None:
        return spark.sql(sql)
    return spark.sql(sql, args=bound)
