"""Second extras batch: range join, distribution window functions,
ordered collect aggregation.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from wire_spark.catalog import register
from wire_spark.queries._util import T, t4

# --------------------------------------------------------------------
# range join: orders binned into price-band intervals
# --------------------------------------------------------------------

# Bands derived from exact min/max (bit-equal across engines), 10
# equal-width [lo, hi) intervals, last band inclusive. The join is a
# genuine interval join (non-equi); the scale path broadcasts the
# interval table — always small — so the fact side never shuffles.
_RANGE_ORACLE = """
WITH bounds AS (
  SELECT min(o_totalprice) AS lo, max(o_totalprice) AS hi FROM orders
), bands AS (
  SELECT b AS band_id,
         lo + b * (hi - lo) / 10.0       AS band_lo,
         lo + (b + 1) * (hi - lo) / 10.0 AS band_hi
  FROM bounds, (SELECT unnest(range(10)) AS b)
)
SELECT
  band_id,
  count(*)                   AS n_orders,
  sum(CAST(floor(o_totalprice * 10000.0) AS HUGEINT)) / 10000.0 AS total_value
FROM orders o
JOIN bands ON (o.o_totalprice >= band_lo AND o.o_totalprice < band_hi)
           OR (band_id = 9 AND o.o_totalprice = band_hi)
GROUP BY band_id
ORDER BY band_id
"""


@register("range_join_price_bands", oracle=_RANGE_ORACLE, bench=True,
          doc="interval (range) join: orders into equal-width price bands")
def range_join_price_bands(spark, sf_dir):
    o = T(spark, sf_dir, "orders")
    bounds = o.agg(F.min("o_totalprice").alias("lo"), F.max("o_totalprice").alias("hi"))
    bands = (
        bounds.crossJoin(spark.range(10).select(F.col("id").cast("int").alias("band_id")))
        .select(
            "band_id",
            (F.col("lo") + F.col("band_id") * (F.col("hi") - F.col("lo")) / 10.0).alias("band_lo"),
            (F.col("lo") + (F.col("band_id") + 1) * (F.col("hi") - F.col("lo")) / 10.0).alias("band_hi"),
        )
    )
    cond = (
        (F.col("o_totalprice") >= F.col("band_lo")) & (F.col("o_totalprice") < F.col("band_hi"))
    ) | ((F.col("band_id") == 9) & (F.col("o_totalprice") == F.col("band_hi")))
    return (
        o.join(F.broadcast(bands), cond)
        .groupBy("band_id")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            (F.sum(F.floor(F.col("o_totalprice") * F.lit(10000.0)).cast("decimal(38,0)")) / F.lit(10000.0)).alias("total_value"),
        )
        .orderBy("band_id")
    )


# --------------------------------------------------------------------
# distribution window functions
# --------------------------------------------------------------------

_DIST_ORACLE = """
SELECT
  c_mktsegment, c_custkey,
  floor(percent_rank() OVER w * 10000.0) / 10000.0 AS pr,
  floor(cume_dist()    OVER w * 10000.0) / 10000.0 AS cd
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
ORDER BY c_mktsegment, c_custkey
"""


@register("window_distribution_funcs", oracle=_DIST_ORACLE, bench=True,
          doc="percent_rank / cume_dist per segment")
def window_distribution_funcs(spark, sf_dir):
    c = T(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return (
        c.select(
            "c_mktsegment", "c_custkey",
            t4(F.percent_rank().over(w)).alias("pr"),
            t4(F.cume_dist().over(w)).alias("cd"),
        )
        .orderBy("c_mktsegment", "c_custkey")
    )


# --------------------------------------------------------------------
# ordered collect aggregation
# --------------------------------------------------------------------

_COLLECT_ORACLE = """
SELECT
  n.n_name,
  string_agg(s.s_name, ',' ORDER BY s.s_name) AS suppliers,
  count(*) AS n_suppliers
FROM supplier s
JOIN nation n ON s.s_nationkey = n.n_nationkey
GROUP BY n.n_name
ORDER BY n.n_name
"""


@register("agg_collect_sorted", oracle=_COLLECT_ORACLE, bench=True,
          doc="ordered array_agg rendered as CSV (cross-engine-stable)")
def agg_collect_sorted(spark, sf_dir):
    s = T(spark, sf_dir, "supplier")
    n = T(spark, sf_dir, "nation")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.array_join(F.array_sort(F.collect_list("s_name")), ",").alias("suppliers"),
            F.count(F.lit(1)).alias("n_suppliers"),
        )
        .orderBy("n_name")
    )
