"""Further TPC-H-shape relational coverage: correlated subqueries,
nation-pair volume, returned items, conditional-aggregate ratios,
HAVING filters, disjunctive pushdown, composed anti-join + scalar
subquery.

All adapted to the synthetic star schema (no partsupp table; lineitem
carries shipdate only). Catalyst-facing goals per query are noted —
these exist to prove the optimizer surface (correlated rewrite to
join, disjunct pushdown, partial aggregation) as much as the results.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from wire_spark.catalog import register
from wire_spark.queries._util import T, fmt_ts, msum, r2, r4

# --------------------------------------------------------------------
# correlated scalar subquery (Q2 shape): cheapest part per type
# --------------------------------------------------------------------

_Q2_ORACLE = """
SELECT p_type, p_partkey, p_name, round(p_retailprice, 2) AS retailprice
FROM part p
WHERE p_retailprice = (SELECT min(p2.p_retailprice) FROM part p2 WHERE p2.p_type = p.p_type)
ORDER BY p_type, p_partkey
"""


@register("q2_min_cost_per_type", oracle=_Q2_ORACLE, bench=True,
          doc="correlated scalar subquery -> groupBy+join rewrite")
def q2_min_cost_per_type(spark, sf_dir):
    p = T(spark, sf_dir, "part")
    # the de-correlated form Catalyst rewrites to: min per group,
    # broadcast back, equality filter
    mins = p.groupBy("p_type").agg(F.min("p_retailprice").alias("min_price"))
    return (
        p.join(F.broadcast(mins), "p_type")
        .filter(F.col("p_retailprice") == F.col("min_price"))
        .select("p_type", "p_partkey", "p_name",
                r2(F.col("p_retailprice")).alias("retailprice"))
        .orderBy("p_type", "p_partkey")
    )


# --------------------------------------------------------------------
# nation-pair volume (Q7 shape)
# --------------------------------------------------------------------

_Q7_ORACLE = """
SELECT
  n1.n_name AS supp_nation,
  n2.n_name AS cust_nation,
  sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 10000.0) AS HUGEINT)) / 10000.0 AS volume
FROM lineitem l
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
WHERE n1.n_name != n2.n_name
  AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n1.n_name, n2.n_name
ORDER BY supp_nation, cust_nation
"""


@register("q7_nation_volume", oracle=_Q7_ORACLE, bench=True,
          doc="cross-nation trade volume, dual dim-join on nation")
def q7_nation_volume(spark, sf_dir):
    l = T(spark, sf_dir, "lineitem")
    s = T(spark, sf_dir, "supplier")
    o = T(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    c = T(spark, sf_dir, "customer")
    n = T(spark, sf_dir, "nation")
    n1 = n.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation")
        .agg(msum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"))
        .orderBy("supp_nation", "cust_nation")
    )


# --------------------------------------------------------------------
# returned items (Q10 shape): top customers by lost revenue
# --------------------------------------------------------------------

_Q10_ORACLE = """
SELECT
  c.c_custkey, c.c_name,
  sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 10000.0) AS HUGEINT)) / 10000.0 AS revenue,
  round(c.c_acctbal, 2) AS acctbal,
  n.n_name
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
WHERE l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


@register("q10_returned_items", oracle=_Q10_ORACLE, bench=True,
          doc="returned-item revenue ranking (Q10 shape)")
def q10_returned_items(spark, sf_dir):
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders")
    l = T(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = T(spark, sf_dir, "nation")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(msum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .select("c_custkey", "c_name", "revenue",
                r2(F.col("c_acctbal")).alias("acctbal"), "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


# --------------------------------------------------------------------
# promo revenue ratio (Q14 shape): conditional aggregation
# --------------------------------------------------------------------

# ratio of EXACT integer sums (floor-scaled addends): both numerator
# and denominator are order-independent, so the ratio is bit-stable
_Q14_ORACLE = """
SELECT
  floor(100.0 * sum(CAST(CASE WHEN p.p_type = 'PROMO'
                         THEN floor(l.l_extendedprice * (1 - l.l_discount) * 10000.0)
                         ELSE 0 END AS HUGEINT))
        / sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 10000.0) AS HUGEINT))
        * 10000.0) / 10000.0 AS promo_pct,
  count(*) AS n_items
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
"""


@register("q14_promo_revenue", oracle=_Q14_ORACLE, bench=True,
          doc="conditional-aggregate ratio (Q14 shape)")
def q14_promo_revenue(spark, sf_dir):
    l = T(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    p = T(spark, sf_dir, "part")
    rev_i = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * F.lit(10000.0)
    )
    ratio = (
        F.lit(100.0)
        * F.sum(F.when(F.col("p_type") == "PROMO", rev_i).otherwise(F.lit(0)).cast("decimal(38,0)"))
        / F.sum(rev_i.cast("decimal(38,0)"))
    )
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .agg(
            (F.floor(ratio * F.lit(10000.0)) / F.lit(10000.0)).alias("promo_pct"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# --------------------------------------------------------------------
# large orders (Q18 shape): HAVING on grouped fact
# --------------------------------------------------------------------

_Q18_ORACLE = """
SELECT
  c.c_name, o.o_orderkey,
  strftime(o.o_orderdate, '%Y-%m-%d %H:%M:%S') AS orderdate,
  round(o.o_totalprice, 2) AS totalprice,
  round(sum(l.l_quantity), 2) AS total_qty
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
GROUP BY c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice
HAVING sum(l.l_quantity) > 150
ORDER BY total_qty DESC, o_orderkey
LIMIT 50
"""


@register("q18_large_orders", oracle=_Q18_ORACLE, bench=True,
          doc="HAVING over grouped join (Q18 shape)")
def q18_large_orders(spark, sf_dir):
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders")
    l = T(spark, sf_dir, "lineitem")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum("l_quantity").alias("qty_raw"))
        .filter(F.col("qty_raw") > 150)
        .select(
            "c_name", "o_orderkey",
            fmt_ts(F.col("o_orderdate")).alias("orderdate"),
            r2(F.col("o_totalprice")).alias("totalprice"),
            r2(F.col("qty_raw")).alias("total_qty"),
        )
        .orderBy(F.desc("total_qty"), F.asc("o_orderkey"))
        .limit(50)
    )


# --------------------------------------------------------------------
# disjunctive predicates (Q19 shape)
# --------------------------------------------------------------------

_Q19_ORACLE = """
SELECT sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 10000.0) AS HUGEINT)) / 10000.0 AS revenue,
       count(*) AS n_items
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15 AND l.l_quantity >= 1  AND l.l_quantity <= 21)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25 AND l.l_quantity >= 10 AND l.l_quantity <= 30)
   OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 35 AND l.l_quantity >= 20 AND l.l_quantity <= 40)
"""


@register("q19_disjunctive_filter", oracle=_Q19_ORACLE, bench=True,
          doc="disjunctive multi-branch predicate (Q19 shape)")
def q19_disjunctive_filter(spark, sf_dir):
    l = T(spark, sf_dir, "lineitem")
    p = T(spark, sf_dir, "part")
    j = l.join(p, p.p_partkey == l.l_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15)
         & F.col("l_quantity").between(1, 21))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 25)
           & F.col("l_quantity").between(10, 30))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 35)
           & F.col("l_quantity").between(20, 40))
    )
    return j.filter(cond).agg(
        msum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


# --------------------------------------------------------------------
# rich customers without urgent orders (Q22 shape):
# scalar subquery + anti join composition
# --------------------------------------------------------------------

_Q22_ORACLE = """
WITH pos_avg AS (
  SELECT avg(c_acctbal) AS a FROM customer WHERE c_acctbal > 0
)
SELECT
  c.c_mktsegment,
  count(*) AS n_cust,
  sum(CAST(floor(c.c_acctbal * 10000.0) AS HUGEINT)) / 10000.0 AS total_bal
FROM customer c, pos_avg
WHERE c.c_acctbal > pos_avg.a
  AND c.c_custkey NOT IN
      (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
GROUP BY c.c_mktsegment
ORDER BY c.c_mktsegment
"""


@register("q22_rich_inactive", oracle=_Q22_ORACLE, bench=True,
          doc="scalar subquery + anti join composition (Q22 shape)")
def q22_rich_inactive(spark, sf_dir):
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    pos_avg = c.filter(F.col("c_acctbal") > 0).agg(F.avg("c_acctbal").alias("a"))
    return (
        c.join(F.broadcast(pos_avg))
        .filter(F.col("c_acctbal") > F.col("a"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_cust"), msum(F.col("c_acctbal")).alias("total_bal"))
        .orderBy("c_mktsegment")
    )


# --------------------------------------------------------------------
# forecasting revenue change (Q6 shape): pure filter + aggregate
# --------------------------------------------------------------------

_Q6_ORACLE = """
SELECT
  sum(CAST(floor(l_extendedprice * l_discount * 10000.0) AS HUGEINT)) / 10000.0 AS revenue_effect,
  count(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


@register("q6_forecast_revenue", oracle=_Q6_ORACLE, bench=True,
          doc="pure filter + aggregate, full predicate pushdown (Q6 shape)")
def q6_forecast_revenue(spark, sf_dir):
    l = T(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            (F.sum(F.floor(F.col("l_extendedprice") * F.col("l_discount") * F.lit(10000.0)).cast("decimal(38,0)"))
             / F.lit(10000.0)).alias("revenue_effect"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# --------------------------------------------------------------------
# Q4 shape: EXISTS subquery -> order-priority checking
# --------------------------------------------------------------------

_Q4_ORACLE = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register("q4_priority_exists", oracle=_Q4_ORACLE, bench=True,
          doc="Q4 shape: priority counts of orders with a late-shipping "
              "line (EXISTS correlated subquery -> semi join)")
def q4_priority_exists(spark, sf_dir):
    """Catalyst goal: the EXISTS rewrites to a LeftSemi join on
    l_orderkey with the date comparison as join condition — one
    shuffle on the order key, no de-dup pass needed (semi join emits
    each order once by construction). The adapted predicate uses
    l_shipdate > o_orderdate (this schema has no commit/receipt
    dates)."""
    o = T(spark, sf_dir, "orders")
    li = T(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


# --------------------------------------------------------------------
# Q12 shape: two-class conditional counts per group
# --------------------------------------------------------------------

_Q12_ORACLE = """
SELECT l_returnflag,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
         AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
         AS BIGINT) AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate > o_orderdate
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@register("q12_priority_classes", oracle=_Q12_ORACLE, bench=True,
          doc="Q12 shape: high/low-priority conditional counts per "
              "return flag for late-shipped lines")
def q12_priority_classes(spark, sf_dir):
    """Conditional aggregation over a fact-fact join (shipmode is
    absent from this schema; returnflag stands in as the class key).
    Exact integer outputs; one shuffle on the order key, partial
    aggregation on the tiny group key."""
    o = T(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate", "o_orderpriority")
    li = T(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate", "l_returnflag")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


# --------------------------------------------------------------------
# Q13: customer order-count distribution
# --------------------------------------------------------------------

_Q13_ORACLE = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
  FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY c.c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


@register("q13_customer_distribution", oracle=_Q13_ORACLE, bench=True,
          doc="Q13: distribution of per-customer order counts "
              "(left join preserving zero-order customers)")
def q13_customer_distribution(spark, sf_dir):
    """Two-level aggregation: count orders per customer (left join
    keeps customers with zero orders — count(o_orderkey) ignores the
    null), then histogram the counts. Shuffles: custkey, then the
    tiny c_count key."""
    c = T(spark, sf_dir, "customer").select("c_custkey")
    o = T(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    per_cust = (
        c.join(o, F.col("o_custkey") == F.col("c_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


# --------------------------------------------------------------------
# Q16 shape: distinct-supplier counts per part group, with exclusion
# --------------------------------------------------------------------

_Q16_ORACLE = """
SELECT p_brand, p_type, count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#1'
GROUP BY p_brand, p_type
ORDER BY supplier_cnt DESC, p_brand, p_type
"""


@register("q16_supplier_counts", oracle=_Q16_ORACLE, bench=True,
          doc="Q16 shape: distinct suppliers per (brand, type) with a "
              "brand exclusion (lineitem as the part-supplier relation)")
def q16_supplier_counts(spark, sf_dir):
    """The schema has no partsupp table; lineitem's (partkey, suppkey)
    pairs are the observed part-supplier relation. Catalyst goals: the
    brand exclusion pushes into the part scan; the distinct count
    expands to a two-phase aggregate (partial on (brand,type,supp))."""
    p = T(spark, sf_dir, "part").filter(F.col("p_brand") != "Brand#1").select(
        "p_partkey", "p_brand", "p_type"
    )
    li = T(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_type")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type")
    )


# --------------------------------------------------------------------
# Q17: small-quantity revenue with a per-part average threshold
# --------------------------------------------------------------------

_Q17_ORACLE = """
WITH pa AS (
  SELECT l_partkey AS pk,
         sum(l_quantity) * 1.0 / count(*) AS avg_qty
  FROM lineitem GROUP BY l_partkey
)
SELECT floor(sum(CAST(floor(l_extendedprice * 10000.0) AS HUGEINT)) / 10000.0 / 7.0 * 100.0) / 100.0
         AS avg_yearly
FROM lineitem JOIN pa ON pk = l_partkey
WHERE l_quantity < 0.2 * avg_qty
"""


@register("q17_small_quantity_revenue", oracle=_Q17_ORACLE, bench=True,
          doc="Q17: revenue of below-one-fifth-of-average-quantity lines "
              "(correlated avg -> join on the grouped aggregate)")
def q17_small_quantity_revenue(spark, sf_dir):
    """Correlated scalar subquery (avg quantity per part) rewritten to
    a join against the grouped aggregate — the decorrelation every
    engine performs; cross-engine parity holds because avg_qty is an
    exact-integer sum divided once, and the revenue sum goes through
    the integer-domain msum before the final scalar division."""
    li = T(spark, sf_dir, "lineitem").select("l_partkey", "l_quantity", "l_extendedprice")
    pa = li.groupBy("l_partkey").agg(
        (F.sum("l_quantity") * F.lit(1.0) / F.count(F.lit(1))).alias("avg_qty")
    )
    joined = li.join(pa, "l_partkey").filter(
        F.col("l_quantity") < F.lit(0.2) * F.col("avg_qty")
    )
    yearly = F.floor(
        (F.sum(F.floor(F.col("l_extendedprice") * F.lit(10000.0)).cast("decimal(38,0)")) / F.lit(10000.0))
        / F.lit(7.0) * F.lit(100.0)
    ) / F.lit(100.0)
    return joined.agg(yearly.alias("avg_yearly"))


# --------------------------------------------------------------------
# Q8: national market share within a region, by year
# --------------------------------------------------------------------

_Q8_ORACLE = """
WITH vol AS (
  SELECT year(o_orderdate) AS o_year,
         CAST(floor(l_extendedprice * (1 - l_discount) * 10000.0) AS BIGINT) AS v,
         n2.n_name AS supp_nation
  FROM lineitem
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON n1.n_nationkey = c_nationkey
  JOIN region   ON r_regionkey = n1.n_regionkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation n2 ON n2.n_nationkey = s_nationkey
  WHERE r_name = 'ASIA'
)
SELECT o_year,
       floor(sum(CASE WHEN supp_nation = 'NATION_3' THEN v ELSE 0 END) * 1.0
             / sum(v) * 10000.0) / 10000.0 AS mkt_share
FROM vol
GROUP BY o_year
ORDER BY o_year
"""


@register("q8_market_share", oracle=_Q8_ORACLE, bench=True,
          doc="Q8: NATION_3's share of ASIA-customer volume per year "
              "(ratio of exact-integer volume sums)")
def q8_market_share(spark, sf_dir):
    """Both the numerator and denominator are integer-domain volume
    sums (floor(x*1e4) addends — exact in any order), so the share is
    one deterministic division per year. Bounded dims (nation, region)
    carry explicit broadcast hints; customer/supplier grow with SF, so
    their join strategy is left to AQE + autoBroadcastJoinThreshold
    (broadcast at small SF, shuffled hash join at 100 TB)."""
    li = T(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    o = T(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    c = T(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = T(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n1 = T(spark, sf_dir, "nation").select(F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk"))
    n2 = T(spark, sf_dir, "nation").select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    r = T(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA").select("r_regionkey")
    v = F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * F.lit(10000.0)).cast("long")
    vol = (
        li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("c_nk") == F.col("c_nationkey"))
        .join(F.broadcast(r), F.col("r_regionkey") == F.col("c_rk"))
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n2), F.col("s_nk") == F.col("s_nationkey"))
        .select(F.year("o_orderdate").alias("o_year"), v.alias("v"), "supp_nation")
    )
    share = F.floor(
        F.sum(F.when(F.col("supp_nation") == "NATION_3", F.col("v")).otherwise(0).cast("decimal(38,0)"))
        * F.lit(1.0) / F.sum(F.col("v").cast("decimal(38,0)")) * F.lit(10000.0)
    ) / F.lit(10000.0)
    return vol.groupBy("o_year").agg(share.alias("mkt_share")).orderBy("o_year")


# --------------------------------------------------------------------
# Q9 shape: profit by supplier nation and year
# --------------------------------------------------------------------

_Q9_ORACLE = """
SELECT n_name AS nation, year(o_orderdate) AS o_year,
       sum(CAST(floor((l_extendedprice * (1 - l_discount)
                       - p_retailprice * l_quantity * 0.1) * 10000.0) AS BIGINT))
         / 10000.0 AS profit
FROM lineitem
JOIN orders   ON o_orderkey = l_orderkey
JOIN part     ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation   ON n_nationkey = s_nationkey
WHERE p_name LIKE '%a%'
GROUP BY n_name, year(o_orderdate)
ORDER BY nation, o_year DESC
"""


@register("q9_profit_by_nation", oracle=_Q9_ORACLE, bench=True,
          doc="Q9 shape: per-nation per-year profit (revenue minus a "
              "retailprice-based cost; no partsupp in this schema)")
def q9_profit_by_nation(spark, sf_dir):
    li = T(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
        "l_extendedprice", "l_discount",
    )
    o = T(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    p = T(spark, sf_dir, "part").filter(F.col("p_name").like("%a%")).select(
        "p_partkey", "p_retailprice"
    )
    s = T(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = T(spark, sf_dir, "nation").select("n_nationkey", F.col("n_name").alias("nation"))
    amount = F.floor(
        (
            F.col("l_extendedprice") * (1 - F.col("l_discount"))
            - F.col("p_retailprice") * F.col("l_quantity") * F.lit(0.1)
        ) * F.lit(10000.0)
    ).cast("long")
    return (
        li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(p, F.col("p_partkey") == F.col("l_partkey"))
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy("nation", F.year("o_orderdate").alias("o_year"))
        .agg((F.sum(amount.cast("decimal(38,0)")) / F.lit(10000.0)).alias("profit"))
        .orderBy("nation", F.desc("o_year"))
    )


# --------------------------------------------------------------------
# Q11 shape: important part value concentration (HAVING vs global sum)
# --------------------------------------------------------------------

_Q11_ORACLE = """
WITH pv AS (
  SELECT l_partkey AS pk,
         sum(CAST(floor(l_extendedprice * 10000.0) AS BIGINT)) AS val_i
  FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation ON n_nationkey = s_nationkey
  WHERE n_name = 'NATION_3'
  GROUP BY l_partkey
), tot AS (SELECT sum(val_i) AS total_i FROM pv)
SELECT pk AS l_partkey, val_i / 10000.0 AS part_value
FROM pv, tot
WHERE val_i * 5000 > total_i
ORDER BY part_value DESC, l_partkey
"""


@register("q11_important_parts", oracle=_Q11_ORACLE, bench=True,
          doc="Q11 shape: parts whose NATION_3-supplied value exceeds 0.02% "
              "of the national total (integer-exact threshold)")
def q11_important_parts(spark, sf_dir):
    """The HAVING-vs-global-scalar pattern with an EXACT comparison:
    val * 1000 > total compares two integers — no float threshold can
    flip across engines. Scalar total broadcasts (1 row)."""
    li = T(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey", "l_extendedprice")
    s = T(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = T(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3").select("n_nationkey")
    pv = (
        li.join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy("l_partkey")
        .agg(F.sum(F.floor(F.col("l_extendedprice") * F.lit(10000.0)).cast("decimal(38,0)")).alias("val_i"))
    )
    tot = pv.agg(F.sum("val_i").alias("total_i"))
    return (
        pv.crossJoin(F.broadcast(tot))
        .filter(F.col("val_i") * 5000 > F.col("total_i"))
        .select("l_partkey", (F.col("val_i") / F.lit(10000.0)).alias("part_value"))
        .orderBy(F.desc("part_value"), "l_partkey")
    )


# --------------------------------------------------------------------
# Q15: top supplier(s) by revenue (view + max)
# --------------------------------------------------------------------

_Q15_ORACLE = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000.0) AS BIGINT))
           AS rev_i
  FROM lineitem GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, rev_i / 10000.0 AS total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE rev_i = (SELECT max(rev_i) FROM revenue)
ORDER BY s_suppkey
"""


@register("q15_top_supplier", oracle=_Q15_ORACLE, bench=True,
          doc="Q15: supplier(s) with maximum revenue (scalar-max "
              "subquery over a revenue view, integer-exact)")
def q15_top_supplier(spark, sf_dir):
    li = T(spark, sf_dir, "lineitem").select("l_suppkey", "l_extendedprice", "l_discount")
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(
            F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * F.lit(10000.0)).cast("decimal(38,0)")
        ).alias("rev_i")
    )
    mx = rev.agg(F.max("rev_i").alias("max_i"))
    s = T(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("rev_i") == F.col("max_i"))
        .join(s, F.col("s_suppkey") == F.col("supplier_no"))
        .select("s_suppkey", "s_name", (F.col("rev_i") / F.lit(10000.0)).alias("total_revenue"))
        .orderBy("s_suppkey")
    )


# --------------------------------------------------------------------
# Q20 shape: suppliers of high-volume parts (nested semi-join chain)
# --------------------------------------------------------------------

_Q20_ORACLE = """
WITH heavy AS (
  SELECT l_partkey, l_suppkey
  FROM lineitem
  GROUP BY l_partkey, l_suppkey
  HAVING sum(l_quantity) > 60
)
SELECT s_name, s_acctbal
FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey FROM heavy
  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
)
ORDER BY s_name, s_acctbal
"""


@register("q20_heavy_part_suppliers", oracle=_Q20_ORACLE, bench=True,
          doc="Q20 shape: suppliers who moved > 60 units of a "
              "'small%'-named part (nested IN -> semi-join chain)")
def q20_heavy_part_suppliers(spark, sf_dir):
    """Catalyst goal: both INs rewrite to LeftSemi joins — part filter
    pushes into its scan, the quantity HAVING is a partial aggregate,
    and supplier is only touched by the final semi join. Integer
    quantities make the threshold exact."""
    li = T(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey", "l_quantity")
    p = T(spark, sf_dir, "part").filter(F.col("p_name").like("small%")).select("p_partkey")
    heavy = (
        li.groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 60)
        .join(p, F.col("p_partkey") == F.col("l_partkey"), "left_semi")
    )
    s = T(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_acctbal")
    return (
        s.join(heavy.select("l_suppkey").distinct(),
               F.col("l_suppkey") == F.col("s_suppkey"), "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name", "s_acctbal")
    )


# --------------------------------------------------------------------
# Q21 shape: sole late supplier in multi-supplier orders
# --------------------------------------------------------------------

_Q21_ORACLE = """
WITH late AS (
  SELECT DISTINCT l_orderkey, l_suppkey
  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
  WHERE l_shipdate > o_orderdate
), multi AS (
  SELECT l_orderkey
  FROM (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem)
  GROUP BY l_orderkey HAVING count(*) > 1
), sole_late AS (
  SELECT l_orderkey, min(l_suppkey) AS l_suppkey
  FROM late
  GROUP BY l_orderkey HAVING count(*) = 1
)
SELECT s_name, count(*) AS numwait
FROM sole_late
JOIN multi USING (l_orderkey)
JOIN supplier ON s_suppkey = l_suppkey
GROUP BY s_name
ORDER BY numwait DESC, s_name
"""


@register("q21_sole_late_supplier", oracle=_Q21_ORACLE, bench=True,
          doc="Q21 shape: suppliers who were the ONLY late shipper in "
              "multi-supplier orders (exists + not-exists composition)")
def q21_sole_late_supplier(spark, sf_dir):
    """The classic exists/not-exists pair expressed as two aggregates:
    orders with exactly one late supplier (the not-exists: no OTHER
    late supplier) intersected with orders having >1 supplier overall
    (the exists). Shuffles stay on l_orderkey throughout — one
    co-partitioning serves all three aggregations."""
    li = T(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    o = T(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    late = (
        li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate"))
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    multi = (
        li.select("l_orderkey", "l_suppkey").distinct()
        .groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("n_supp"))
        .filter(F.col("n_supp") > 1)
        .select("l_orderkey")
    )
    sole_late = (
        late.groupBy("l_orderkey")
        .agg(F.min("l_suppkey").alias("l_suppkey"), F.count(F.lit(1)).alias("n_late"))
        .filter(F.col("n_late") == 1)
        .select("l_orderkey", "l_suppkey")
    )
    s = T(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        sole_late.join(multi, "l_orderkey")
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
    )
