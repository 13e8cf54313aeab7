"""Relational operator coverage: scans, filters, aggregations, joins
(broadcast/semi/anti/outer), set ops, rollup/cube, pivot, top-n,
scalar subqueries.

The reference implements NONE of these natively — they are its declared
roadmap intent (ROADMAP.md:96-107, SURVEY.md §2.6); Spark provides them
as built-ins. Each query here is written so Catalyst can push filters
and prune columns into the parquet scan, and so small dimension tables
are broadcast (no shuffle of the fact table for those joins).

Scale notes: every groupBy keys on low-cardinality columns (bounded
state). Only genuinely bounded relations (`nation`, `region`, scalar
aggregates) carry explicit broadcast hints; `customer`/`part`/
`supplier` grow linearly with scale factor, so their join strategy is
left to AQE + autoBroadcastJoinThreshold — broadcast at test SFs
(they fit the 10 MB threshold), shuffled hash join at 100 TB where a
forced hint would OOM. Top-n uses orderBy+limit which Spark executes
as a partial per-partition top-k + single-reducer merge
(TakeOrderedAndProject).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from wire_spark.catalog import register
from wire_spark.queries._util import T, fmt_ts, msum, r2, r4

# --------------------------------------------------------------------
# q1: pricing summary (TPC-H Q1 shape) — full scan + 4-way agg
# --------------------------------------------------------------------

_Q1_ORACLE = """
SELECT
  l_returnflag,
  l_linestatus,
  round(sum(l_quantity), 2)                                            AS sum_qty,
  sum(CAST(floor(l_extendedprice * 10000.0) AS HUGEINT)) / 10000.0                      AS sum_base_price,
  sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000.0) AS HUGEINT)) / 10000.0   AS sum_disc_price,
  sum(CAST(floor(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 10000.0) AS HUGEINT)) / 10000.0 AS sum_charge,
  round(avg(l_quantity), 4)                                            AS avg_qty,
  round(avg(l_extendedprice), 4)                                       AS avg_price,
  round(avg(l_discount), 4)                                            AS avg_disc,
  count(*)                                                             AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


@register("q1_pricing_summary", oracle=_Q1_ORACLE, bench=True,
          doc="TPC-H Q1-shape aggregation over lineitem")
def q1_pricing_summary(spark, sf_dir):
    l = T(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            r2(F.sum("l_quantity")).alias("sum_qty"),
            msum(F.col("l_extendedprice")).alias("sum_base_price"),
            msum(disc_price).alias("sum_disc_price"),
            msum(disc_price * (1 + F.col("l_tax"))).alias("sum_charge"),
            r4(F.avg("l_quantity")).alias("avg_qty"),
            r4(F.avg("l_extendedprice")).alias("avg_price"),
            r4(F.avg("l_discount")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# --------------------------------------------------------------------
# q3: top revenue orders (TPC-H Q3 shape) — 3-way join + top-n
# --------------------------------------------------------------------

_Q3_ORACLE = """
SELECT
  o.o_orderkey,
  sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 10000.0) AS HUGEINT)) / 10000.0 AS revenue,
  strftime(o.o_orderdate, '%Y-%m-%d %H:%M:%S')          AS orderdate,
  o.o_orderpriority
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l.l_shipdate  > TIMESTAMP '1998-01-01 00:00:00'
GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, o_orderkey
LIMIT 10
"""


@register("q3_shipping_priority", oracle=_Q3_ORACLE, bench=True,
          doc="TPC-H Q3-shape join + top-n by revenue")
def q3_shipping_priority(spark, sf_dir):
    c = T(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = T(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    l = T(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    # customer is small relative to lineitem but grows with SF: no
    # forced hint — AQE broadcasts it under the threshold and falls
    # back to a shuffled hash join at scale.
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(msum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .select(
            "o_orderkey",
            "revenue",
            fmt_ts(F.col("o_orderdate")).alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


# --------------------------------------------------------------------
# q5: revenue by region/nation (TPC-H Q5 shape) — 6-way join
# --------------------------------------------------------------------

_Q5_ORACLE = """
SELECT
  r.r_name,
  n.n_name,
  sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 10000.0) AS HUGEINT)) / 10000.0 AS revenue
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY r.r_name, n.n_name
ORDER BY r.r_name, n.n_name
"""


@register("q5_local_supplier_volume", oracle=_Q5_ORACLE, bench=True,
          doc="TPC-H Q5-shape multi-join, threshold-broadcast dims")
def q5_local_supplier_volume(spark, sf_dir):
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    l = T(spark, sf_dir, "lineitem")
    s = T(spark, sf_dir, "supplier")
    n = T(spark, sf_dir, "nation")
    r = T(spark, sf_dir, "region")
    # nation/region are bounded (25/5 rows) — hint-free here because
    # they already fall far under the broadcast threshold; customer and
    # supplier scale with SF, so AQE picks broadcast vs shuffled hash
    # join by measured size. Lineitem shuffles only on l_orderkey.
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            s,
            (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(msum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy("r_name", "n_name")
    )


# --------------------------------------------------------------------
# broadcast join: lineitem x part, agg by brand
# --------------------------------------------------------------------

_BRAND_ORACLE = """
SELECT
  p.p_brand,
  round(sum(l.l_quantity), 2)                           AS sum_qty,
  sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 10000.0) AS HUGEINT)) / 10000.0 AS revenue,
  count(*)                                              AS n_items
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
GROUP BY p.p_brand
ORDER BY p.p_brand
"""


@register("join_broadcast_brand_volume", oracle=_BRAND_ORACLE,
          doc="fact x dim hash join (threshold-broadcast), agg by brand")
def join_broadcast_brand_volume(spark, sf_dir):
    l = T(spark, sf_dir, "lineitem")
    p = T(spark, sf_dir, "part")
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            r2(F.sum("l_quantity")).alias("sum_qty"),
            msum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("p_brand")
    )


# --------------------------------------------------------------------
# semi / anti joins
# --------------------------------------------------------------------

_SEMI_ORACLE = """
SELECT c_custkey, c_name
FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 100000)
ORDER BY c_custkey
"""


@register("semi_join_big_spenders", oracle=_SEMI_ORACLE,
          doc="left-semi join (EXISTS rewrite)")
def semi_join_big_spenders(spark, sf_dir):
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 100000)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


_ANTI_ORACLE = """
SELECT c_custkey, c_name
FROM customer
WHERE c_custkey NOT IN
      (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
ORDER BY c_custkey
"""


@register("anti_join_no_urgent_orders", oracle=_ANTI_ORACLE,
          doc="left-anti join (NOT EXISTS rewrite)")
def anti_join_no_urgent_orders(spark, sf_dir):
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


# --------------------------------------------------------------------
# outer join with missing side
# --------------------------------------------------------------------

_OUTER_ORACLE = """
SELECT
  n.n_name,
  count(s.s_suppkey)                            AS n_suppliers,
  coalesce(sum(CAST(floor(s.s_acctbal * 10000.0) AS HUGEINT)), 0) / 10000.0 AS total_bal
FROM nation n
LEFT JOIN supplier s ON n.n_nationkey = s.s_nationkey
GROUP BY n.n_name
ORDER BY n.n_name
"""


@register("outer_join_nation_suppliers", oracle=_OUTER_ORACLE,
          doc="left outer join preserving unmatched dim rows")
def outer_join_nation_suppliers(spark, sf_dir):
    n = T(spark, sf_dir, "nation")
    s = T(spark, sf_dir, "supplier")
    return (
        n.join(s, n.n_nationkey == s.s_nationkey, "left")
        .groupBy("n_name")
        .agg(
            F.count("s_suppkey").alias("n_suppliers"),
            (F.coalesce(F.sum(F.floor(F.col("s_acctbal") * F.lit(10000.0)).cast("decimal(38,0)")), F.lit(0)) / F.lit(10000.0)).alias("total_bal"),
        )
        .orderBy("n_name")
    )


# --------------------------------------------------------------------
# set operations
# --------------------------------------------------------------------

_UNION_ORACLE = """
SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
UNION
SELECT c_custkey FROM customer WHERE c_acctbal > 5000
ORDER BY c_custkey
"""


@register("set_union_segments", oracle=_UNION_ORACLE, doc="UNION (distinct)")
def set_union_segments(spark, sf_dir):
    c = T(spark, sf_dir, "customer")
    a = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = c.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    return a.union(b).distinct().orderBy("c_custkey")


_INTERSECT_ORACLE = """
SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
INTERSECT
SELECT c_custkey FROM customer WHERE c_acctbal > 5000
ORDER BY c_custkey
"""


@register("set_intersect_segments", oracle=_INTERSECT_ORACLE, doc="INTERSECT")
def set_intersect_segments(spark, sf_dir):
    c = T(spark, sf_dir, "customer")
    a = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = c.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    return a.intersect(b).orderBy("c_custkey")


_EXCEPT_ORACLE = """
SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
EXCEPT
SELECT c_custkey FROM customer WHERE c_acctbal > 5000
ORDER BY c_custkey
"""


@register("set_except_segments", oracle=_EXCEPT_ORACLE, doc="EXCEPT (distinct)")
def set_except_segments(spark, sf_dir):
    c = T(spark, sf_dir, "customer")
    a = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = c.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    return a.subtract(b).orderBy("c_custkey")  # EXCEPT DISTINCT


# --------------------------------------------------------------------
# rollup / cube / pivot
# --------------------------------------------------------------------

_ROLLUP_ORACLE = """
SELECT
  coalesce(l_returnflag, 'ALL') AS returnflag,
  coalesce(l_linestatus, 'ALL') AS linestatus,
  round(sum(l_quantity), 2)     AS sum_qty,
  count(*)                      AS n_rows
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY returnflag, linestatus
"""


@register("rollup_flag_status", oracle=_ROLLUP_ORACLE, doc="ROLLUP grouping")
def rollup_flag_status(spark, sf_dir):
    l = T(spark, sf_dir, "lineitem")
    return (
        l.rollup("l_returnflag", "l_linestatus")
        .agg(r2(F.sum("l_quantity")).alias("sum_qty"), F.count(F.lit(1)).alias("n_rows"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "sum_qty",
            "n_rows",
        )
        .orderBy("returnflag", "linestatus")
    )


_CUBE_ORACLE = """
SELECT
  coalesce(l_returnflag, 'ALL') AS returnflag,
  coalesce(l_linestatus, 'ALL') AS linestatus,
  sum(CAST(floor(l_extendedprice * 10000.0) AS HUGEINT)) / 10000.0 AS sum_price
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
ORDER BY returnflag, linestatus
"""


@register("cube_flag_status", oracle=_CUBE_ORACLE, doc="CUBE grouping")
def cube_flag_status(spark, sf_dir):
    l = T(spark, sf_dir, "lineitem")
    return (
        l.cube("l_returnflag", "l_linestatus")
        .agg(msum(F.col("l_extendedprice")).alias("sum_price"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "sum_price",
        )
        .orderBy("returnflag", "linestatus")
    )


_PIVOT_ORACLE = """
SELECT
  l_returnflag,
  round(sum(l_quantity) FILTER (WHERE l_linestatus = 'O'), 2) AS qty_open,
  round(sum(l_quantity) FILTER (WHERE l_linestatus = 'F'), 2) AS qty_filled
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@register("pivot_linestatus", oracle=_PIVOT_ORACLE, doc="pivot to columns")
def pivot_linestatus(spark, sf_dir):
    l = T(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(r2(F.sum("l_quantity")))
        .select(
            "l_returnflag",
            F.col("O").alias("qty_open"),
            F.col("F").alias("qty_filled"),
        )
        .orderBy("l_returnflag")
    )


# --------------------------------------------------------------------
# scalar subquery / top-n
# --------------------------------------------------------------------

# exact-integer average: the comparison threshold is bit-stable (a
# float avg differs in the last ulp by summation order, and a row
# could sit exactly on the boundary)
_ABOVE_AVG_ORACLE = """
SELECT o_orderkey, round(o_totalprice, 2) AS totalprice
FROM orders
WHERE o_totalprice > 1.5 * ((SELECT sum(CAST(floor(o_totalprice * 100.0) AS HUGEINT)) / 100.0 FROM orders)
                            / (SELECT count(*) FROM orders))
ORDER BY o_orderkey
"""


@register("scalar_subquery_above_avg", oracle=_ABOVE_AVG_ORACLE,
          doc="scalar aggregate subquery in predicate")
def scalar_subquery_above_avg(spark, sf_dir):
    o = T(spark, sf_dir, "orders")
    avg_df = o.agg(
        (
            (F.sum(F.floor(F.col("o_totalprice") * F.lit(100.0)).cast("decimal(38,0)")) / F.lit(100.0))
            / F.count(F.lit(1))
        ).alias("avg_price")
    )
    # broadcast the 1-row aggregate: no shuffle of orders
    return (
        o.join(F.broadcast(avg_df))
        .filter(F.col("o_totalprice") > 1.5 * F.col("avg_price"))
        .select("o_orderkey", r2(F.col("o_totalprice")).alias("totalprice"))
        .orderBy("o_orderkey")
    )


_TOPN_ORACLE = """
SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 25
"""


@register("topn_orders_by_price", oracle=_TOPN_ORACLE,
          doc="global top-n (TakeOrderedAndProject)")
def topn_orders_by_price(spark, sf_dir):
    o = T(spark, sf_dir, "orders")
    return (
        o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .select("o_orderkey", "o_custkey", r2(F.col("o_totalprice")).alias("totalprice"))
        .limit(25)
    )


_DISTINCT_ORACLE = """
SELECT
  count(DISTINCT l_orderkey)                    AS n_orders,
  count(DISTINCT l_partkey)                     AS n_parts,
  count(DISTINCT l_suppkey)                     AS n_supps,
  count(*)                                      AS n_rows
FROM lineitem
"""


@register("distinct_counts", oracle=_DISTINCT_ORACLE, doc="multi distinct aggregation")
def distinct_counts(spark, sf_dir):
    l = T(spark, sf_dir, "lineitem")
    return l.agg(
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.count(F.lit(1)).alias("n_rows"),
    )


# --------------------------------------------------------------------
# unpivot (wide -> long) over the fact table
# --------------------------------------------------------------------

_UNPIVOT_ORACLE = """
WITH long AS (
  SELECT l_returnflag AS flag, 'a_quantity' AS measure,
         CAST(floor(l_quantity * 10000.0) AS BIGINT) AS v4 FROM lineitem
  UNION ALL
  SELECT l_returnflag, 'b_extendedprice',
         CAST(floor(l_extendedprice * 10000.0) AS BIGINT) FROM lineitem
  UNION ALL
  SELECT l_returnflag, 'c_discount',
         CAST(floor(l_discount * 10000.0) AS BIGINT) FROM lineitem
  UNION ALL
  SELECT l_returnflag, 'd_tax',
         CAST(floor(l_tax * 10000.0) AS BIGINT) FROM lineitem
)
SELECT flag, measure,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(v4) AS BIGINT) AS total_1e4,
       CAST(sum(v4) // count(*) AS BIGINT) AS mean_1e4
FROM long
GROUP BY flag, measure
ORDER BY flag, measure
"""


@register("unpivot_lineitem_measures", bench=True, oracle=_UNPIVOT_ORACLE,
          doc="wide->long unpivot (melt) of four lineitem measures, "
              "then per-(flag, measure) stats — the DataFrame.unpivot "
              "relational surface")
def unpivot_lineitem_measures(spark, sf_dir):
    """The wide-to-long reshape (``DataFrame.unpivot`` / melt): four
    lineitem measures become (measure, value) rows keyed by return
    flag, then one map-combinable rollup per (flag, measure) cell.
    This is how metric tables feed generic per-metric dashboards and
    how feature matrices melt for per-feature statistics.

    The measure columns are renamed BEFORE the unpivot so the
    variable column's values are already the output labels (sorted
    'a_...' .. 'd_...' to make ORDER BY deterministic across
    engines).  Values floor to integer 1e-4 units row-wise (the msum
    discipline), so sums and the integer mean are exact in any
    partitioning.  Scale: unpivot is a row-local generate (4x rows,
    no shuffle); the rollup is one groupBy over a 3x4-cell grid."""
    li = T(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        F.floor(F.col("l_quantity") * 10000.0).cast("long").alias("a_quantity"),
        F.floor(F.col("l_extendedprice") * 10000.0).cast("long").alias("b_extendedprice"),
        F.floor(F.col("l_discount") * 10000.0).cast("long").alias("c_discount"),
        F.floor(F.col("l_tax") * 10000.0).cast("long").alias("d_tax"),
    )
    long = li.unpivot(
        ids=["flag"],
        values=["a_quantity", "b_extendedprice", "c_discount", "d_tax"],
        variableColumnName="measure",
        valueColumnName="v4",
    )
    return (
        long.groupBy("flag", "measure")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v4").alias("total_1e4"),
            F.expr("CAST(sum(v4) div count(*) AS BIGINT)").alias("mean_1e4"),
        )
        .orderBy("flag", "measure")
    )


# --------------------------------------------------------------------
# order fulfillment lag by priority
# --------------------------------------------------------------------

_FULFILLMENT_ORACLE = """
WITH lag AS (
  SELECT o.o_orderpriority AS priority,
         date_diff('day', CAST(o.o_orderdate AS DATE),
                   CAST(min(l.l_shipdate) AS DATE)) AS d
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  GROUP BY o.o_orderkey, o.o_orderpriority, o.o_orderdate
)
SELECT priority,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(min(d) AS BIGINT) AS min_lag_days,
       CAST(max(d) AS BIGINT) AS max_lag_days,
       CAST(sum(d) * 10000 // count(*) AS BIGINT) AS avg_lag_1e4,
       CAST(count(*) FILTER (WHERE d > 60) AS BIGINT) AS n_over_60d
FROM lag GROUP BY priority ORDER BY priority
"""


@register("orders_fulfillment_lag", oracle=_FULFILLMENT_ORACLE, bench=True,
          doc="order fulfillment lag by priority: days from order date "
              "to FIRST line shipment — count, min/max, integer 1e-4 "
              "average, and the over-60-day tail")
def orders_fulfillment_lag(spark, sf_dir):
    """Operational latency rollup: per order, the days between
    ``o_orderdate`` and the EARLIEST ``l_shipdate`` of its lines
    (first physical movement), summarized per order priority — the
    table an ops review reads to see whether urgent orders actually
    ship sooner, with the over-60-day tail as the SLA-breach count.

    Exactness: day differences are exact integers (both engines
    subtract DATE-truncated values — no tz or DST arithmetic
    involved in whole-day diffs of date-typed values), and the
    average is one TRUNCATING integer division into 1e-4 days —
    measured: DuckDB's ``//`` on integer operands truncates toward
    zero exactly like Spark's ``div`` (the floor-vs-truncate
    divergence documented elsewhere applies to Python ``//``
    replays and float paths, not to integer ``//``), which matters
    here because the synthetic data ships lines BEFORE the order
    date, so per-priority sums go negative.  Sums stay in int64 to
    ~1e15 order-days.

    Scale shape: the orders-lineitem join is the schema's big
    co-partitioned equi-join (both sides hash on orderkey — AQE
    handles skew); per-order min is map-side partial; the
    per-priority rollup reduces to 5 keys. One scan each side,
    nothing collected.
    """
    o = T(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_orderdate")
    li = T(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    lag = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_orderpriority", "o_orderdate")
        .agg(F.min("l_shipdate").alias("first_ship"))
        .select(
            F.col("o_orderpriority").alias("priority"),
            F.datediff(F.col("first_ship").cast("date"),
                       F.col("o_orderdate").cast("date")).cast("long")
            .alias("d"))
    )
    return (
        lag.groupBy("priority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("d").alias("min_lag_days"),
            F.max("d").alias("max_lag_days"),
            F.expr("CAST(sum(d) * 10000 div count(*) AS BIGINT)")
            .alias("avg_lag_1e4"),
            F.count(F.when(F.col("d") > 60, 1)).alias("n_over_60d"),
        )
        .orderBy("priority")
    )


# --------------------------------------------------------------------
# part substitution savings: cheapest other-brand equivalent
# --------------------------------------------------------------------

_SUBSTITUTION_ORACLE = """
WITH p AS (
  SELECT p_partkey, p_brand, p_type, p_size,
         CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) AS cents
  FROM part
), best AS (
  SELECT p_type, p_size, cents AS best_cents, p_brand AS best_brand
  FROM (SELECT p_type, p_size, cents, p_brand,
               row_number() OVER (PARTITION BY p_type, p_size
                                  ORDER BY cents, p_brand, p_partkey) AS rn
        FROM p)
  WHERE rn = 1
), alt AS (
  SELECT a.p_type, a.p_size, min(a.cents) AS alt_best_cents
  FROM p a JOIN best b ON a.p_type = b.p_type AND a.p_size = b.p_size
  WHERE a.p_brand <> b.best_brand
  GROUP BY a.p_type, a.p_size
)
SELECT p.p_partkey, p.p_brand, p.cents,
       CASE WHEN p.p_brand = b.best_brand THEN a.alt_best_cents
            ELSE b.best_cents END AS alt_cents,
       p.cents - CASE WHEN p.p_brand = b.best_brand THEN a.alt_best_cents
                      ELSE b.best_cents END AS savings_cents
FROM p
JOIN best b ON p.p_type = b.p_type AND p.p_size = b.p_size
LEFT JOIN alt a ON p.p_type = a.p_type AND p.p_size = a.p_size
WHERE CASE WHEN p.p_brand = b.best_brand THEN a.alt_best_cents
           ELSE b.best_cents END IS NOT NULL
  AND p.cents > CASE WHEN p.p_brand = b.best_brand THEN a.alt_best_cents
                     ELSE b.best_cents END
ORDER BY p.p_partkey
"""


@register("part_substitution_savings", oracle=_SUBSTITUTION_ORACLE,
          bench=True,
          doc="procurement substitution: per part, the cheapest "
              "same-type/same-size part of a DIFFERENT brand and the "
              "savings in cents — attribute-blocked, no pair explosion")
def part_substitution_savings(spark, sf_dir):
    """Entity-resolution-flavored procurement analysis: for every
    part that has a cheaper interchangeable alternative — same
    ``p_type`` and ``p_size``, DIFFERENT ``p_brand`` — emit the
    alternative's price and the savings.  The per-block cheapest
    row (deterministic (cents, brand, partkey) tiebreak) serves
    most parts; parts that ARE the cheapest brand compare against
    the cheapest OTHER-brand row, so a block with a single brand
    offers no substitutes.

    This is the LINEAR formulation of attribute-blocked matching:
    rather than materializing within-block pairs (quadratic in
    block size — (type, size) blocks grow linearly with the
    catalog), each part joins two per-block aggregates.  Prices
    round half-up to exact integer cents on both engines before
    any comparison, so ties break identically.

    Scale shape: one part scan; the block-best window sorts WITHIN
    (type, size) hash partitions (parallel across the fixed
    type x size grid); two block-grain broadcast-sized aggregates
    join back — no pairwise relation is ever built.
    """
    from pyspark.sql import Window as W
    p = T(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_type", "p_size",
        F.expr("CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT)")
        .alias("cents"))
    w = W.partitionBy("p_type", "p_size").orderBy(
        "cents", "p_brand", "p_partkey")
    best = (
        p.withColumn("rn", F.row_number().over(w)).filter("rn = 1")
        .select("p_type", "p_size", F.col("cents").alias("best_cents"),
                F.col("p_brand").alias("best_brand"))
    )
    alt = (
        p.join(best, ["p_type", "p_size"])
        .filter(F.col("p_brand") != F.col("best_brand"))
        .groupBy("p_type", "p_size")
        .agg(F.min("cents").alias("alt_best_cents"))
    )
    alt_cents = F.when(F.col("p_brand") == F.col("best_brand"),
                       F.col("alt_best_cents")).otherwise(F.col("best_cents"))
    return (
        p.join(best, ["p_type", "p_size"])
        .join(alt, ["p_type", "p_size"], "left")
        .filter(alt_cents.isNotNull() & (F.col("cents") > alt_cents))
        .select(
            "p_partkey", "p_brand", "cents",
            alt_cents.alias("alt_cents"),
            (F.col("cents") - alt_cents).alias("savings_cents"))
        .orderBy("p_partkey")
    )
