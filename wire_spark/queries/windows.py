"""Window-function coverage: ranking, running totals, lag/lead.

Not present in the reference (SURVEY.md §2.6 — declared intent only);
all native Spark window execution.

Scale notes: every window partitions on a real key (supplier, brand,
user) — never an unpartitioned global window, which would serialize
through a single task at 100 TB. Running totals use ROWS frames with a
deterministic total order (ties broken by primary key) so results are
reproducible across engines and runs.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from wire_spark.catalog import register
from wire_spark.queries._util import EVENTS_SANITIZED_CTE, EVENTS_TIMED_CTE, T, events_sane, events_timed, fmt_ts, r2, t4

_TOPK_ORACLE = """
SELECT p_brand, p_partkey, p_name, round(p_retailprice, 2) AS retailprice, rn
FROM (
  SELECT p_brand, p_partkey, p_name, p_retailprice,
         row_number() OVER (PARTITION BY p_brand
                            ORDER BY p_retailprice DESC, p_partkey) AS rn
  FROM part
)
WHERE rn <= 3
ORDER BY p_brand, rn
"""


@register("window_topk_per_brand", oracle=_TOPK_ORACLE,
          doc="row_number partition top-k", bench=True)
def window_topk_per_brand(spark, sf_dir):
    p = T(spark, sf_dir, "part")
    w = W.partitionBy("p_brand").orderBy(F.desc("p_retailprice"), F.asc("p_partkey"))
    return (
        p.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("p_brand", "p_partkey", "p_name",
                r2(F.col("p_retailprice")).alias("retailprice"), "rn")
        .orderBy("p_brand", "rn")
    )


_RUNNING_ORACLE = """
SELECT
  l_suppkey, l_orderkey, l_linenumber,
  round(sum(l_quantity) OVER (
    PARTITION BY l_suppkey
    ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_qty
FROM lineitem
ORDER BY l_suppkey, l_orderkey, l_linenumber
"""


@register("window_running_total", oracle=_RUNNING_ORACLE,
          doc="running sum per supplier, ROWS frame", bench=True)
def window_running_total(spark, sf_dir):
    l = T(spark, sf_dir, "lineitem")
    w = (
        W.partitionBy("l_suppkey")
        # l_quantity last: the sf0.1 generator emits duplicate
        # (orderkey, linenumber) pairs, so the business key alone is
        # not a total order — equal-qty ties are then harmless
        # (identical prefix sums in any order)
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber", "l_quantity")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        l.select(
            "l_suppkey", "l_orderkey", "l_linenumber",
            r2(F.sum("l_quantity").over(w)).alias("running_qty"),
        )
        .orderBy("l_suppkey", "l_orderkey", "l_linenumber")
    )


_LAG_ORACLE = EVENTS_TIMED_CTE + """
SELECT
  user_id, event_id,
  strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_s,
  floor((value - lag(value) OVER w) * 10000.0) / 10000.0 AS delta_value,
  lead(event_type) OVER w              AS next_type
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
ORDER BY user_id, event_id
"""


@register("window_lag_lead_events", oracle=_LAG_ORACLE,
          doc="lag/lead per user over event time")
def window_lag_lead_events(spark, sf_dir):
    e = events_timed(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.select(
            "user_id", "event_id",
            fmt_ts(F.col("ts"), with_micros=True).alias("ts_s"),
            t4(F.col("value") - F.lag("value").over(w)).alias("delta_value"),
            F.lead("event_type").over(w).alias("next_type"),
        )
        .orderBy("user_id", "event_id")
    )


_NTILE_ORACLE = """
SELECT
  c_mktsegment, c_custkey,
  ntile(4)     OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS bal_quartile,
  rank()       OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS bal_rank,
  dense_rank() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS bal_dense_rank
FROM customer
ORDER BY c_mktsegment, c_custkey
"""


@register("window_rank_ntile", oracle=_NTILE_ORACLE,
          doc="rank/dense_rank/ntile per segment")
def window_rank_ntile(spark, sf_dir):
    c = T(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return (
        c.select(
            "c_mktsegment", "c_custkey",
            F.ntile(4).over(w).alias("bal_quartile"),
            F.rank().over(w).alias("bal_rank"),
            F.dense_rank().over(w).alias("bal_dense_rank"),
        )
        .orderBy("c_mktsegment", "c_custkey")
    )


# --------------------------------------------------------------------
# hypertable rollup lattice: week -> day -> hour in ONE pass
# --------------------------------------------------------------------

_TIME_LATTICE_ORACLE = EVENTS_SANITIZED_CTE + """,
b AS (
  SELECT strftime(date_trunc('week', ts), '%Y-%m-%d %H:%M:%S') AS week_s,
         strftime(date_trunc('day', ts),  '%Y-%m-%d %H:%M:%S') AS day_s,
         strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_s,
         CAST(floor(value * 10000.0) AS BIGINT) AS v4
  FROM events
)
SELECT coalesce(week_s, 'ALL') AS week_s,
       coalesce(day_s, 'ALL')  AS day_s,
       coalesce(hour_s, 'ALL') AS hour_s,
       CAST(count(*) AS BIGINT) AS n_events,
       sum(CAST(v4 AS HUGEINT)) / 10000.0 AS sum_value
FROM b
GROUP BY ROLLUP (week_s, day_s, hour_s)
ORDER BY week_s, day_s, hour_s
"""


@register("rollup_time_lattice", oracle=_TIME_LATTICE_ORACLE, bench=True,
          doc="hypertable rollup lattice: week/day/hour continuous-"
              "aggregate levels from ONE GROUP BY ROLLUP pass")
def rollup_time_lattice(spark, sf_dir):
    """The time-hierarchy rollup a hypertable maintains as
    continuous aggregates — hourly, daily, and weekly levels plus
    the grand total — produced by a single ROLLUP pass instead of
    one query per granularity. Serving dashboards read the level
    matching their zoom; ``rollup_plus_tail_merge`` shows how the
    finest level stays fresh against a raw tail.

    Scale shape: ROLLUP compiles to one Expand + aggregation —
    every input row fans out to its 4 lattice levels and the
    aggregation is map-side combinable on all of them, so the
    shuffle carries at most (hours + days + weeks + 1) groups no
    matter the row count. Fixed-point sums keep the hash stable;
    the week/day/hour keys are formatted strings, coalesced to
    'ALL' at the rolled-up levels.
    """
    e = events_sane(spark, sf_dir).select(
        F.date_format(F.date_trunc("week", F.col("ts")),
                      "yyyy-MM-dd HH:mm:ss").alias("week_s"),
        F.date_format(F.date_trunc("day", F.col("ts")),
                      "yyyy-MM-dd HH:mm:ss").alias("day_s"),
        F.date_format(F.date_trunc("hour", F.col("ts")),
                      "yyyy-MM-dd HH:mm:ss").alias("hour_s"),
        F.expr("CAST(floor(value * 10000.0) AS BIGINT)").alias("v4"),
    )
    return (
        e.rollup("week_s", "day_s", "hour_s")
        .agg(F.count(F.lit(1)).alias("n_events"),
             (F.sum(F.col("v4").cast("decimal(38,0)")) / F.lit(10000.0)).alias("sum_value"))
        .select(
            F.coalesce("week_s", F.lit("ALL")).alias("week_s"),
            F.coalesce("day_s", F.lit("ALL")).alias("day_s"),
            F.coalesce("hour_s", F.lit("ALL")).alias("hour_s"),
            "n_events", "sum_value",
        )
        .orderBy("week_s", "day_s", "hour_s")
    )
