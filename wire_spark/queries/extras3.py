"""Third extras batch: date-part aggregation, string functions,
edit-distance fuzzy matching.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from wire_spark.catalog import register
from wire_spark.queries._util import T, msum

# --------------------------------------------------------------------
# date-part aggregation
# --------------------------------------------------------------------

_MONTHLY_ORACLE = """
SELECT
  year(o_orderdate)  AS y,
  month(o_orderdate) AS m,
  count(*)           AS n_orders,
  sum(CAST(floor(o_totalprice * 10000.0) AS HUGEINT)) / 10000.0 AS total_value
FROM orders
GROUP BY year(o_orderdate), month(o_orderdate)
ORDER BY y, m
"""


@register("orders_by_month", oracle=_MONTHLY_ORACLE, bench=True,
          doc="calendar rollup by extracted year/month")
def orders_by_month(spark, sf_dir):
    o = T(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.year("o_orderdate").alias("y"), F.month("o_orderdate").alias("m")
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            msum(F.col("o_totalprice")).alias("total_value"),
        )
        .orderBy("y", "m")
    )


# --------------------------------------------------------------------
# string functions: split_part / LIKE / length
# --------------------------------------------------------------------

_STRFN_ORACLE = """
SELECT
  p_partkey,
  split_part(p_name, ' ', 1) AS adjective,
  split_part(p_name, ' ', 2) AS noun,
  p_name LIKE '%widget%'     AS is_widget,
  upper(substring(p_name, 1, 3)) AS prefix3,
  length(p_name)             AS name_len
FROM part
ORDER BY p_partkey
"""


@register("string_functions_part", oracle=_STRFN_ORACLE, bench=True,
          doc="split_part / LIKE / substring / length surface")
def string_functions_part(spark, sf_dir):
    p = T(spark, sf_dir, "part")
    return (
        p.select(
            "p_partkey",
            F.split_part("p_name", F.lit(" "), F.lit(1)).alias("adjective"),
            F.split_part("p_name", F.lit(" "), F.lit(2)).alias("noun"),
            F.col("p_name").like("%widget%").alias("is_widget"),
            F.upper(F.substring("p_name", 1, 3)).alias("prefix3"),
            F.length("p_name").alias("name_len"),
        )
        .orderBy("p_partkey")
    )


# --------------------------------------------------------------------
# edit-distance fuzzy matching over distinct names
# --------------------------------------------------------------------

_FUZZY_ORACLE = """
WITH names AS (SELECT DISTINCT p_name FROM part)
SELECT a.p_name AS name1, b.p_name AS name2,
       levenshtein(a.p_name, b.p_name) AS dist
FROM names a JOIN names b ON a.p_name < b.p_name
WHERE levenshtein(a.p_name, b.p_name) <= 3
ORDER BY name1, name2
"""


@register("fuzzy_match_part_names", oracle=_FUZZY_ORACLE, bench=True,
          doc="Levenshtein near-match pairs over distinct names")
def fuzzy_match_part_names(spark, sf_dir):
    # distinct-name self-join: the candidate space is the VOCABULARY
    # (small), never the row count — the right shape for fuzzy
    # matching at scale (dedupe to names, match, join back if needed)
    names = T(spark, sf_dir, "part").select("p_name").distinct()
    a = names.select(F.col("p_name").alias("name1"))
    b = names.select(F.col("p_name").alias("name2"))
    dist = F.levenshtein("name1", "name2")
    return (
        a.join(b, F.col("name1") < F.col("name2"))
        .filter(dist <= 3)
        .select("name1", "name2", dist.alias("dist"))
        .orderBy("name1", "name2")
    )
