"""Ad-hoc phase profiler for optimization work (guide §1): time each
named sub-DataFrame of a query with the noop sink so the expensive
phase is identified before anything is changed.  Not part of the
bench contract; used to produce the numbers in OPTIMIZATION_r15.md.

Usage: python tools/phase_profile.py <profile-name> [reps]
Profiles are registered in PROFILES below as
    name -> fn(spark, sf_dir) -> list[(label, DataFrame)]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def langid_phases(spark, sf_dir):
    from pyspark.sql import Window as W

    from wire_spark.functions.text import ascii_lower
    from wire_spark.queries._util import T

    d = T(spark, sf_dir, "documents").filter(
        F.col("lang").isNotNull()
    ).select("doc_id", "lang", ascii_lower(F.col("text")).alias("t"))
    trigrams = (
        "zip_with(zip_with("
        " slice(split(t, ''), 1, length(t) - 2),"
        " slice(split(t, ''), 2, length(t) - 2),"
        " (a, b) -> concat(a, b)),"
        " slice(split(t, ''), 3, length(t) - 2),"
        " (a, b) -> concat(a, b))"
    )
    cnt = (
        d.filter(F.length("t") >= 3)
        .select("lang", F.explode(F.expr(trigrams)).alias("tri"))
        .groupBy("lang", "tri")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    wl = W.partitionBy("lang").orderBy(F.desc("c"), F.asc("tri"))
    prof = (
        cnt.withColumn("r", F.row_number().over(wl))
        .filter(F.col("r") <= 50)
        .select(F.col("lang").alias("plang"), "tri")
    )
    dtri = d.filter(F.length("t") >= 3).select(
        "doc_id",
        F.explode(F.expr(f"array_distinct({trigrams})")).alias("tri"),
    )
    ov = (
        dtri.join(F.broadcast(prof), "tri")
        .groupBy("doc_id", "plang")
        .agg(F.count(F.lit(1)).alias("ov"))
    )
    return [
        ("scan+lower only", d),
        ("train: explode+count (cnt)", cnt),
        ("train: top50 profile", prof),
        ("classify: distinct-trigram explode (dtri)", dtri),
        ("classify: overlap agg (ov)", ov),
    ]


def bloom_phases(spark, sf_dir):
    from wire_spark.queries._util import T, md5_long

    cust = T(spark, sf_dir, "customer")
    build = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    o = T(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    probe = o.select(
        "o_orderkey", "o_custkey",
        *[(md5_long(F.concat(F.col("o_custkey").cast("string"),
                             F.lit(f":{i}"))) % 1048576).alias(f"p{i}")
          for i in (1, 2, 3)],
    )
    return [
        ("build scan", build),
        ("probe md5 x3 over orders", probe),
    ]


def star_phases(spark, sf_dir):
    from wire_spark.queries.dedup import _minhash_pairs

    pairs = _minhash_pairs(spark, sf_dir).select("d1", "d2")
    return [("minhash pairs (edges)", pairs)]


def quant_phases(spark, sf_dir):
    from wire_spark.queries._util import t6
    from wire_spark.queries.similarity import _valid_vectors

    e = _valid_vectors(spark, sf_dir).select("vec_id", "v")
    scale = F.array_max(F.transform("v", lambda x: F.abs(x))) / F.lit(127.0)
    err = F.array_max(
        F.transform("v", lambda x: F.abs(x - F.floor(x / scale) * scale))
    )
    return [
        ("scan valid vectors", e),
        ("scale only", e.select("vec_id", t6(scale).alias("scale"))),
        ("scale+err unsorted", e.select(
            "vec_id", t6(scale).alias("scale"), t6(err).alias("max_abs_err"))),
        ("full with orderBy", e.select(
            "vec_id", t6(scale).alias("scale"), t6(err).alias("max_abs_err"))
            .orderBy("vec_id")),
    ]


PROFILES = {
    "langid": langid_phases,
    "bloom": bloom_phases,
    "star": star_phases,
    "quant": quant_phases,
}


def main() -> None:
    from wire_spark.engine import get_spark
    from wire_spark.queries._util import release_tracked_caches

    name = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("wire-spark-phase-profile")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()
    phases = PROFILES[name](spark, sf_dir)
    for label, df in phases:
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            _noop(df)
            times.append(time.perf_counter() - t0)
        print(f"{min(times):8.3f}s  {label}", flush=True)
    release_tracked_caches()
    spark.stop()


if __name__ == "__main__":
    main()
