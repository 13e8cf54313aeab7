"""Shared helpers for catalog queries (Spark side + oracle parity)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wire_spark.engine import load_table


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def fmt_ts(col, with_micros: bool = False):
    """Render a timestamp as a canonical string.

    Cross-engine hash parity: DuckDB and Spark may serialize timestamps
    differently, so catalog queries that OUTPUT a timestamp column
    format it to a string on both sides (`strftime` in the oracle).
    """
    pat = "yyyy-MM-dd HH:mm:ss.SSSSSS" if with_micros else "yyyy-MM-dd HH:mm:ss"
    return F.date_format(col, pat)


#: DuckDB strftime patterns matching fmt_ts
ORACLE_TS = "%Y-%m-%d %H:%M:%S"
ORACLE_TS_MICROS = "%Y-%m-%d %H:%M:%S.%f"


def r2(col):
    return F.round(col, 2)


def r4(col):
    return F.round(col, 4)


def r6(col):
    return F.round(col, 6)
