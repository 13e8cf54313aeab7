"""Event-time windowing: tumbling, sliding, session windows + event
envelope aggregation.

These are the reference's declared roadmap operators (ROADMAP.md:96-100:
tumbling/sliding/session windows, event-time processing) — implemented
here with Spark's native `window()` / `session_window()` expressions.
The same expressions run unchanged under Structured Streaming with a
watermark (see wire_spark/streaming/); the batch form below is what the
DuckDB oracle can verify.

Scale notes: time-window aggregation state is bounded by
(#keys x #windows-in-watermark); tumbling windows align to epoch so
partition pruning on date-partitioned storage still applies.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from wire_spark.catalog import register
from wire_spark.queries._util import T, msum, r4

_TYPE_STATS_ORACLE = """
SELECT
  event_type,
  count(*)                       AS n_events,
  count(DISTINCT user_id)        AS n_users,
  sum(floor(value * 10000.0)) / 10000.0 AS sum_value,
  round(avg(value), 4)           AS avg_value,
  round(min(value), 4)           AS min_value,
  round(max(value), 4)           AS max_value
FROM events
GROUP BY event_type
ORDER BY event_type
"""


@register("events_type_stats", oracle=_TYPE_STATS_ORACLE,
          doc="event envelope aggregation by type")
def events_type_stats(spark, sf_dir):
    e = T(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            msum(F.col("value")).alias("sum_value"),
            r4(F.avg("value")).alias("avg_value"),
            r4(F.min("value")).alias("min_value"),
            r4(F.max("value")).alias("max_value"),
        )
        .orderBy("event_type")
    )


# Tumbling 1-hour windows align to the epoch => identical to
# date_trunc('hour') bucketing in the oracle.
_TUMBLING_ORACLE = """
SELECT
  strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
  event_type,
  count(*)             AS n_events,
  sum(floor(value * 10000.0)) / 10000.0 AS sum_value
FROM events
GROUP BY date_trunc('hour', ts), event_type
ORDER BY window_start, event_type
"""


@register("window_tumbling_hourly", oracle=_TUMBLING_ORACLE,
          doc="tumbling 1h event-time window (ROADMAP.md:97)", bench=True)
def window_tumbling_hourly(spark, sf_dir):
    e = T(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), msum(F.col("value")).alias("sum_value"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
        .orderBy("window_start", "event_type")
    )


# Sliding 1h windows every 30min: each event belongs to exactly 2
# windows, starting at the enclosing 30-min boundary and 30 min before.
_SLIDING_ORACLE = """
WITH buckets AS (
  SELECT
    to_timestamp(CAST(floor(epoch(ts) / 1800) * 1800 AS BIGINT)) - (n * INTERVAL 30 MINUTE)
      AS window_start,
    value
  FROM events, (SELECT unnest([0, 1]) AS n)
)
SELECT
  strftime(window_start, '%Y-%m-%d %H:%M:%S') AS window_start,
  count(*)             AS n_events,
  sum(floor(value * 10000.0)) / 10000.0 AS sum_value
FROM buckets
GROUP BY window_start
ORDER BY window_start
"""


@register("window_sliding_30m", oracle=_SLIDING_ORACLE,
          doc="sliding 1h/30m event-time window (ROADMAP.md:97)")
def window_sliding_30m(spark, sf_dir):
    e = T(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"), msum(F.col("value")).alias("sum_value"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "n_events",
            "sum_value",
        )
        .orderBy("window_start")
    )


# Session windows (10-minute inactivity gap) per user. Oracle =
# classic gaps-and-islands: a new session starts when the previous
# event of the same user is > gap away; session end = last event + gap
# (matching Spark's session_window end semantics).
_SESSION_ORACLE = """
WITH flagged AS (
  SELECT
    user_id, ts, value,
    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
              >= INTERVAL 10 MINUTE
         OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
         THEN 1 ELSE 0 END AS new_session
  FROM events
), numbered AS (
  SELECT *,
    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM flagged
)
SELECT
  user_id,
  strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f')                       AS session_start,
  strftime(max(ts) + INTERVAL 10 MINUTE, '%Y-%m-%d %H:%M:%S.%f')  AS session_end,
  count(*)                                                        AS n_events,
  sum(floor(value * 10000.0)) / 10000.0                           AS sum_value
FROM numbered
GROUP BY user_id, session_id
ORDER BY user_id, session_start
"""


@register("window_session_10m", oracle=_SESSION_ORACLE,
          doc="session window, 10m gap (ROADMAP.md:97)", bench=True)
def window_session_10m(spark, sf_dir):
    e = T(spark, sf_dir, "events")
    return (
        e.groupBy("user_id", F.session_window("ts", "10 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"), msum(F.col("value")).alias("sum_value"))
        .select(
            "user_id",
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("session_start"),
            F.date_format("w.end", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("session_end"),
            "n_events",
            "sum_value",
        )
        .orderBy("user_id", "session_start")
    )


# JSON payload extraction — the reference parses every payload as JSON
# (SURVEY.md §2.3 from_json/to_json boundary); props is a JSON object
# column in the synthetic events table.
_JSON_ORACLE = """
SELECT
  event_id,
  CAST(json_extract(props, '$.k') AS BIGINT) AS k
FROM events
WHERE CAST(json_extract(props, '$.k') AS BIGINT) > 90
ORDER BY event_id
"""


@register("events_json_extract", oracle=_JSON_ORACLE,
          doc="JSON field extraction + predicate (get_json_object)")
def events_json_extract(spark, sf_dir):
    e = T(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        e.select("event_id", k.alias("k"))
        .filter(F.col("k") > 90)
        .orderBy("event_id")
    )


# per-user activity profile: pivot the event-type dimension to columns
_EV_PIVOT_ORACLE = """
SELECT
  user_id,
  count(*) FILTER (event_type = 'click')    AS n_click,
  count(*) FILTER (event_type = 'view')     AS n_view,
  count(*) FILTER (event_type = 'purchase') AS n_purchase,
  count(*) FILTER (event_type = 'signup')   AS n_signup,
  count(*) FILTER (event_type = 'error')    AS n_error
FROM events
GROUP BY user_id
ORDER BY user_id
"""


@register("events_pivot_by_type", oracle=_EV_PIVOT_ORACLE,
          doc="per-user activity profile (pivot event_type to columns)")
def events_pivot_by_type(spark, sf_dir):
    e = T(spark, sf_dir, "events")
    pivoted = (
        e.groupBy("user_id")
        .pivot("event_type", ["click", "view", "purchase", "signup", "error"])
        .agg(F.count(F.lit(1)))
    )
    return (
        pivoted.select(
            "user_id",
            *[
                F.coalesce(F.col(t), F.lit(0)).alias(f"n_{t}")
                for t in ("click", "view", "purchase", "signup", "error")
            ],
        )
        .orderBy("user_id")
    )
