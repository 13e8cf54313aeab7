"""Approximate aggregates: HLL distinct counts within declared error
(not oracle-gated — sketches are engine-specific by construction)."""

from __future__ import annotations

from pyspark.sql import functions as F

from wire_spark.engine import load_table


def test_approx_count_distinct_within_tolerance(spark, sf_dir):
    l = load_table(spark, sf_dir, "lineitem")
    exact = l.select(F.countDistinct("l_orderkey").alias("n")).collect()[0].n
    approx = l.select(
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("n")
    ).collect()[0].n
    assert abs(approx - exact) / exact < 0.06  # 3x declared rsd


def test_approx_percentile_close_to_exact(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    exact = o.select(F.expr("percentile(o_totalprice, 0.5)").alias("p")).collect()[0].p
    approx = o.select(
        F.percentile_approx("o_totalprice", 0.5, 1000).alias("p")
    ).collect()[0].p
    assert abs(approx - exact) / exact < 0.02
