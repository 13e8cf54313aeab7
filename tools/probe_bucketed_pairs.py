"""Bucketed-layout probe for the contest-pair family (VERDICT r15
item 8): measure whether pre-bucketing lineitem on l_orderkey removes
the exchanges under `_pair_relation`'s (order, brand) aggregation and
order-keyed self-join — the 100 TB-correct form named when the r15
cached-repartition trick was rejected.

This is an OFFLINE experiment: the bench/driver inputs stay plain
parquet directories (pre-bucketing them across runs would be
cross-run precomputation); the probe writes its own bucketed copy
into a throwaway warehouse, builds the same expression against it,
and reports plan shape + best-of-N wall for both forms.

Usage: python tools/probe_bucketed_pairs.py [buckets] [reps]
"""

from __future__ import annotations

import os
import re
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from wire_spark.engine import get_spark, load_table  # noqa: E402


def pair_expr(li, p):
    """The `_pair_relation` body over explicit inputs (no checkpoint:
    the probe wants the PLANNER's view of the layout)."""
    ob = (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy(
            F.col("l_orderkey").alias("orderkey"),
            F.col("p_brand").alias("brand"),
        )
        .agg(F.sum(F.expr(
            "CAST(floor(l_extendedprice * 100.0e0) AS BIGINT)"
        )).alias("rev"))
    )
    a, b = ob.alias("a"), ob.alias("b")
    return (
        a.join(b, (F.col("a.orderkey") == F.col("b.orderkey"))
               & (F.col("a.brand") < F.col("b.brand"))
               & (F.col("a.rev") != F.col("b.rev")))
        .groupBy(F.col("a.brand").alias("b1"), F.col("b.brand").alias("b2"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("a.rev") > F.col("b.rev"), 1)
                  .otherwise(0)).alias("w1"),
        )
    )


def tally(df) -> str:
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted").split("\n\n")[0]
    ex = len(re.findall(r"(?<!Broadcast)(?<!Reused)Exchange", plan))
    smj = len(re.findall(r"SortMergeJoin", plan))
    return f"exchanges={ex} smj={smj}"


def best_of(df, reps: int) -> float:
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main() -> None:
    buckets = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    wh = tempfile.mkdtemp(prefix="wire_bucket_probe_")
    spark = get_spark(
        "bucket-probe",
        extra_conf={
            "spark.sql.warehouse.dir": wh,
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    try:
        li = load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_partkey", "l_extendedprice")
        p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
        # the one-time layout cost a real deployment pays at ingest
        t0 = time.perf_counter()
        (li.write.mode("overwrite").bucketBy(buckets, "l_orderkey")
           .sortBy("l_orderkey").saveAsTable("li_bucketed"))
        t_layout = time.perf_counter() - t0
        lib = spark.table("li_bucketed")

        plain = pair_expr(li, p)
        bucketed = pair_expr(lib, p)
        print(f"layout write (one-time): {t_layout:.2f}s, {buckets} buckets")
        print("plain    plan:", tally(plain))
        print("bucketed plan:", tally(bucketed))
        for label, df in [("plain", plain), ("bucketed", bucketed),
                          ("plain2", plain), ("bucketed2", bucketed)]:
            print(f"{label:9s} best-of-{reps}: {best_of(df, reps):.3f}s",
                  flush=True)
        same = (sorted(map(tuple, plain.collect()))
                == sorted(map(tuple, bucketed.collect())))
        print("outputs identical:", same)
    finally:
        spark.stop()
        shutil.rmtree(wh, ignore_errors=True)


if __name__ == "__main__":
    main()
