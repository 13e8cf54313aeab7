"""Pipeline diagnostics: join-key skew audit.

Before running a 100 TB join or aggregation, the question is always
"how skewed is the key?" — one hot key serializes a reducer no matter
how many executors exist. This operator computes the key-frequency
profile a capacity plan needs: key count, hottest-key share, and the
concentration of the top keys. (The fix-side tools live in
operators/joins.py: salted_join, AQE skew-join; this is the
measure-side.)
"""

from __future__ import annotations

from pyspark.sql import functions as F

from wire_spark.catalog import register
from wire_spark.queries._util import T

_SKEW_ORACLE = """
WITH per_key AS (
  SELECT user_id, count(*) AS c FROM events GROUP BY user_id
), top10 AS (
  SELECT sum(c) AS t10 FROM (
    SELECT c FROM per_key ORDER BY c DESC, user_id LIMIT 10
  )
)
SELECT count(*) AS n_keys,
       sum(c) AS n_rows,
       max(c) AS max_count,
       floor(max(c) * 10000.0 / sum(c)) / 10000.0 AS max_share,
       floor(any_value(t10) * 10000.0 / sum(c)) / 10000.0 AS top10_share,
       CAST(floor(sum(c) * 1.0 / count(*)) AS BIGINT) AS avg_per_key
FROM per_key CROSS JOIN top10
"""


@register("skew_audit_events_user", oracle=_SKEW_ORACLE,
          doc="join-key skew audit on events.user_id: key count, hottest "
              "share, top-10 concentration")
def skew_audit_events_user(spark, sf_dir):
    """Key-skew profile for events.user_id (the funnel/session join
    key). Scale shape: one shuffle for the per-key counts (partial
    map-side agg — the shuffle carries keys, not rows), the top-10
    via TakeOrdered, then one-row aggregates; ratios are exact
    integer rationals floored at 4 dp. avg_per_key uses integer
    division (exact in both engines)."""
    per_key = (
        T(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    top10 = (
        per_key.orderBy(F.desc("c"), F.asc("user_id")).limit(10)
        .agg(F.sum("c").alias("t10"))
    )
    f4 = lambda c: F.floor(c * F.lit(10000.0)) / F.lit(10000.0)  # noqa: E731
    return (
        per_key.agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.sum("c").alias("n_rows"),
            F.max("c").alias("max_count"),
        )
        .crossJoin(F.broadcast(top10))
        .select(
            "n_keys", "n_rows", "max_count",
            f4(F.col("max_count") * F.lit(1.0) / F.col("n_rows")).alias("max_share"),
            f4(F.col("t10") * F.lit(1.0) / F.col("n_rows")).alias("top10_share"),
            F.floor(F.col("n_rows") * F.lit(1.0) / F.col("n_keys")).cast("long").alias("avg_per_key"),
        )
    )
