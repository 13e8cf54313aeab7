"""Custom join operators: as-of semantics edge cases and salted-join
equivalence with a plain join."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from wire_spark.engine import load_table
from wire_spark.operators.joins import asof_join, salted_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01T10:00:00"), "a"),
         (1, _ts("2024-01-01T12:00:00"), "b"),
         (2, _ts("2024-01-01T09:00:00"), "c")],
        ["k", "ts", "tag"],
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01T09:30:00"), 10.0),
         (1, _ts("2024-01-01T11:00:00"), 20.0),
         (1, _ts("2024-01-01T12:00:00"), 30.0),  # exactly equal ts -> matches (<=)
         (2, _ts("2024-01-01T09:30:00"), 99.0)],  # after left -> no match
        ["k", "ts", "v"],
    )
    out = {
        (r.k, r.tag): r.matched_v
        for r in asof_join(left, right, on="k", left_time="ts", right_time="ts",
                           value_cols=["v"]).collect()
    }
    assert out == {
        (1, "a"): 10.0,   # latest right <= 10:00 is 09:30
        (1, "b"): 30.0,   # 12:00 right matches at equal ts
        (2, "c"): None,   # unmatched left row survives with NULL
    }


def test_salted_join_matches_plain_join(spark, sf_dir):
    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    # orders keyed as l_orderkey for the equi-join
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    plain = l.join(o, "l_orderkey").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 2).alias("s")
    ).collect()[0]
    salted = salted_join(l, o, on="l_orderkey", salt=4).agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 2).alias("s")
    ).collect()[0]
    assert (plain.n, plain.s) == (salted.n, salted.s)


def test_asof_join_single_row_match_with_nulls(spark):
    """Matched value columns must all come from the SAME right row:
    a newest right row with a NULL in one value column must not have
    that column backfilled from an older row. Right rows with NULL
    time are ignored entirely."""
    left = spark.createDataFrame([("k", 10, "L1")], ["k", "t", "payload"])
    right = spark.createDataFrame(
        [("k", 1, "old_a", "old_b"),
         ("k", 5, None, "new_b"),        # newest match: a is NULL
         ("k", None, "null_ts_a", "null_ts_b")],  # no timeline position
        ["k", "t", "a", "b"],
    )
    out = asof_join(left, right, on="k", left_time="t", right_time="t",
                    value_cols=["a", "b"]).collect()
    assert len(out) == 1
    r = out[0]
    # whole-row semantics: (None, new_b), NOT (old_a, new_b)
    assert r.matched_a is None and r.matched_b == "new_b"


def test_salted_join_rejects_outer(spark):
    big = spark.createDataFrame([(1, "x")], ["k", "v"])
    small = spark.createDataFrame([(1, "y")], ["k", "w"])
    import pytest
    with pytest.raises(ValueError, match="inner/left"):
        salted_join(big, small, on="k", how="full")


def test_band_join_matches_bruteforce_model(spark):
    """band_join vs the quadratic model on adversarial small inputs:
    exact bucket-boundary gaps, negative-bucket times, hot keys."""
    from wire_spark.operators.joins import band_join

    rows_l = [(k, t) for k in range(3) for t in (0, 4, 5, 9, 10, 11, 23)]
    rows_r = [(k, t) for k in range(3) for t in (1, 5, 6, 10, 15, 22, 30)]
    band = 5
    left = spark.createDataFrame(rows_l, "k INT, lt LONG")
    right = spark.createDataFrame(rows_r, "k INT, rt LONG")
    got = sorted(
        (r.k, r.lt, r.rt)
        for r in band_join(left, right, "k", "lt", "rt", band).collect()
    )
    want = sorted(
        (k1, t1, t2)
        for (k1, t1) in rows_l for (k2, t2) in rows_r
        if k1 == k2 and abs(t1 - t2) <= band
    )
    assert got == want and len(got) > 0


def test_band_join_rejects_bad_args(spark):
    from wire_spark.operators.joins import band_join

    left = spark.createDataFrame([(1, 2)], "k INT, t LONG")
    right = spark.createDataFrame([(1, 3)], "k INT, t LONG")
    import pytest

    with pytest.raises(ValueError, match="band"):
        band_join(left, right, "k", "t", "t", 0)
    with pytest.raises(ValueError, match="collision"):
        band_join(left, right, "k", "t", "t", 5)
