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


def test_bloom_fp_ratio_stays_low_across_sf(spark):
    # the size-adaptive bitmap (~20 bits/key) must hold the realized
    # false-positive rate under 5% as the build side grows 100x —
    # the failure mode of the earlier fixed 65536-bit bitmap was
    # quiet saturation (fp_ratio -> ~1) at larger SFs
    from wire_spark.catalog import load_registry

    q = load_registry()["bloom_join_prune"]
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        row = q.fn(spark, f"/root/testdata/{sf}").collect()[0]
        assert row.n_candidates >= row.n_matched > 0, sf
        assert row.fp_ratio < 0.05, (sf, row.fp_ratio)
