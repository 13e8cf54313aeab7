"""AQE skew-join: the engine-default runtime answer to hot keys.

``salted_join`` (operators/joins.py) is the explicit-salt form for
when the skew is known up front; for everything else the engine
enables ``spark.sql.adaptive.skewJoin`` (engine.py) and AQE splits
oversized post-shuffle partitions at runtime.  This test pins that
the mechanism actually FIRES on a hot key — thresholds are lowered
only because the test data is tiny; at real scale the defaults
(256 MB skewed-partition threshold, 5x median factor) fire on their
own — and that the split changes the plan, not the answer."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_aqe_splits_skewed_join_partition(spark):
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        # engine default, not a test-local override
        assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"

        # one hot key (200k rows) amid 100 cold keys (100 rows each)
        left = spark.range(200_000).select(
            F.lit(0).alias("k"), F.col("id").alias("lv")
        ).union(
            spark.range(10_000).select(
                (F.col("id") % 100 + 1).alias("k"), F.col("id").alias("lv")
            )
        )
        right = spark.range(101).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("rv")
        )
        j = left.join(right, "k")
        rows = j.collect()  # j's OWN execution finalizes its AQE plan
        assert len(rows) == 210_000  # split changes the plan, not rows
        assert sum(1 for r in rows if r.k == 0) == 200_000

        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "(skew=true)" in plan, plan[:1500]
        assert "skewed" in plan  # AQEShuffleRead ... skewed
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
