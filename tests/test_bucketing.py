"""Bucketed co-located joins: pre-shuffled tables join with NO
exchange — the at-rest layout strategy for repeated 100 TB joins.

The reference's only exchange operator is its hash partitioner
(partition.go:28-56); bucketing is the Spark-native way to make that
partitioning durable so every subsequent join/agg on the bucket key
skips the shuffle entirely.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from wire_spark.engine import load_table
from wire_spark.plans import count_shuffles, formatted_plan


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir):
    # default warehouse dir (spark-warehouse/, gitignored) — the
    # warehouse conf is static and cannot move on a live session.
    # A previous session's on-disk table locations outlive the
    # in-memory catalog: clear them or saveAsTable refuses.
    import shutil

    spark.sql("CREATE DATABASE IF NOT EXISTS bktest")
    for t in ("lineitem_b", "orders_b"):
        spark.sql(f"DROP TABLE IF EXISTS bktest.{t}")
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    shutil.rmtree(f"{wh}/bktest.db", ignore_errors=True)
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    (l.write.mode("overwrite").bucketBy(8, "l_orderkey")
     .sortBy("l_orderkey").saveAsTable("bktest.lineitem_b"))
    (o.write.mode("overwrite").bucketBy(8, "o_orderkey")
     .sortBy("o_orderkey").saveAsTable("bktest.orders_b"))
    yield "bktest.lineitem_b", "bktest.orders_b"


def test_bucketed_join_has_no_shuffle(spark, bucketed):
    lt, ot = bucketed
    l = spark.table(lt)
    o = spark.table(ot)
    # disable auto-broadcast so the join would normally shuffle both sides
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = l.join(o, l.l_orderkey == o.o_orderkey).groupBy("o_orderpriority").agg(
            F.count(F.lit(1)).alias("n")
        )
        plan = formatted_plan(j)
        assert "SortMergeJoin" in plan
        # bucket layout replaces both join exchanges; only the final
        # aggregation may shuffle
        assert count_shuffles(j) <= 1, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_bucketed_join_matches_plain_join(spark, sf_dir, bucketed):
    lt, ot = bucketed
    plain = (
        load_table(spark, sf_dir, "lineitem")
        .join(load_table(spark, sf_dir, "orders"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .count()
    )
    bucket = spark.table(lt).join(
        spark.table(ot), F.col("l_orderkey") == F.col("o_orderkey")
    ).count()
    assert plain == bucket
