"""Transform combinators: the reference's ``Operation`` chain as
DataFrame -> DataFrame functions.

Reference: internal/pipeline/ops.go:9-33 (``Transform`` lifts a
chan->chan fn; ``Map`` applies a per-element fn) and the linear
parent/child operation DAG (pipeline.go:221-240). In Spark the "DAG"
is Catalyst's logical plan — chaining plain functions with
``DataFrame.transform`` gives the same composition with full
optimizer visibility (no opaque per-row closures unless the caller
explicitly maps).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame

TransformFn = Callable[[DataFrame], DataFrame]


def Transform(fn: TransformFn) -> TransformFn:
    """ops.go:15-20 analog — lift a DataFrame->DataFrame fn into a
    pipeline stage. (Identity wrapper; exists for API parity and so
    pipelines can typecheck stages.)"""
    return fn


def Map(col_fn: Callable[[DataFrame], dict[str, Column]]) -> TransformFn:
    """ops.go:22-33 analog — per-element projection, expressed as
    named column expressions (JVM-side) instead of an opaque per-row
    closure."""

    def stage(df: DataFrame) -> DataFrame:
        return df.withColumns(col_fn(df))

    return stage


def chain(*stages: TransformFn) -> TransformFn:
    """Compose stages left-to-right (AddOperation chain,
    pipeline.go:221-240)."""

    def composed(df: DataFrame) -> DataFrame:
        for s in stages:
            df = df.transform(s)
        return df

    return composed
