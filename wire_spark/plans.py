"""Physical-plan introspection helpers: make plan shape testable.

The scale contract ("filters reach the scan", "dims broadcast", "top-n
doesn't global-sort") only holds if someone checks; these helpers let
tests assert on the formatted plan so regressions in query authoring
(a filter moved after a UDF, a broadcast hint dropped) fail CI instead
of silently costing a full shuffle at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters lines from parquet scans."""
    return [
        line.strip()
        for line in formatted_plan(df).splitlines()
        if "PushedFilters" in line
    ]


def scan_columns(df: DataFrame) -> list[str]:
    """ReadSchema lines — what each scan actually reads (pruning)."""
    return [
        line.strip() for line in formatted_plan(df).splitlines() if "ReadSchema" in line
    ]


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df) or "BroadcastNestedLoopJoin" in formatted_plan(df)


def count_shuffles(df: DataFrame) -> int:
    plan = formatted_plan(df)
    return sum(
        1
        for line in plan.splitlines()
        if line.strip().startswith("(") and ") Exchange" in line
    )


def has_take_ordered(df: DataFrame) -> bool:
    return "TakeOrderedAndProject" in formatted_plan(df)
