"""Extended operator coverage: the reference's uppercase transform
under the oracle gate, multimodal decode metadata, as-of join,
grouping sets, exact percentiles, sessionization composition.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from wire_spark.catalog import register
from wire_spark.operators.joins import asof_join
from wire_spark.operators.multimodal import attach_media, decode_media
from wire_spark.queries._util import EVENTS_TIMED_CTE, T, events_sane, events_timed, fmt_ts, r4, t4

# --------------------------------------------------------------------
# the reference's core transform, oracle-verified
# --------------------------------------------------------------------

_UPPER_ORACLE = """
SELECT doc_id, upper(text) AS text_upper
FROM documents
ORDER BY doc_id
"""


@register("transform_uppercase", oracle=_UPPER_ORACLE,
          doc="the reference's uppercase transform (pipeline.go:282-340)")
def transform_uppercase(spark, sf_dir):
    d = T(spark, sf_dir, "documents")
    return d.select("doc_id", F.upper("text").alias("text_upper")).orderBy("doc_id")


# --------------------------------------------------------------------
# multimodal decode metadata — exercises the REAL mapInPandas path on
# the Spark side; the oracle states the stub decode in closed form
# --------------------------------------------------------------------

_MEDIA_ORACLE = """
SELECT
  doc_id,
  octet_length(encode(text))              AS n_bytes,
  md5(text)                               AS sha,
  octet_length(encode(text)) % 640 + 1    AS width,
  (octet_length(encode(text)) * 7) % 480 + 1 AS height,
  octet_length(encode(text)) % 16 + 1     AS n_frames
FROM documents
ORDER BY doc_id
"""


@register("multimodal_decode_meta", oracle=_MEDIA_ORACLE,
          doc="binary media column decode (mapInPandas, stubbed kernel)")
def multimodal_decode_meta(spark, sf_dir):
    d = T(spark, sf_dir, "documents")
    decoded = decode_media(attach_media(d, "text"), id_col="doc_id")
    return (
        decoded.select(
            "doc_id",
            F.col("n_bytes").cast("int").alias("n_bytes"),
            "sha",
            F.col("width").cast("int").alias("width"),
            F.col("height").cast("int").alias("height"),
            F.col("n_frames").cast("int").alias("n_frames"),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------
# as-of join: each click joined to the user's latest prior purchase
# --------------------------------------------------------------------

_ASOF_ORACLE = EVENTS_TIMED_CTE + """,
clicks AS (
  SELECT user_id, event_id, ts FROM events WHERE event_type = 'click'
), purchases AS (
  SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'
)
SELECT
  c.user_id,
  c.event_id,
  strftime(c.ts, '%Y-%m-%d %H:%M:%S.%f') AS click_ts,
  strftime(m.pts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
  floor(m.pv * 10000.0) / 10000.0         AS purchase_value
FROM clicks c
LEFT JOIN (
  -- explicit argmax instead of DuckDB's native ASOF JOIN: with
  -- EQUAL purchase timestamps the native ASOF picks an arbitrary
  -- row, while the Spark operator deterministically takes the max
  -- (ts, value) struct — so the oracle pins the same (ts DESC,
  -- value DESC NULLS LAST) tiebreak (timewarp sweep, epoch-0 ties)
  SELECT user_id, event_id, pts, pv FROM (
    SELECT c2.user_id, c2.event_id, p.ts AS pts, p.value AS pv,
           row_number() OVER (
             PARTITION BY c2.user_id, c2.event_id
             ORDER BY p.ts DESC, p.value DESC NULLS LAST) AS rn
    FROM clicks c2 JOIN purchases p
      ON c2.user_id = p.user_id AND p.ts <= c2.ts
  ) WHERE rn = 1
) m ON c.user_id = m.user_id AND c.event_id = m.event_id
ORDER BY c.user_id, c.event_id
"""


@register("asof_join_click_purchase", oracle=_ASOF_ORACLE, bench=True,
          doc="as-of join (latest purchase <= click time per user)")
def asof_join_click_purchase(spark, sf_dir):
    e = events_timed(spark, sf_dir)
    clicks = e.filter(F.col("event_type") == "click").select("user_id", "event_id", "ts")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    joined = asof_join(
        clicks, purchases, on="user_id", left_time="ts", right_time="ts",
        value_cols=["ts", "value"],
    )
    return (
        joined.select(
            "user_id",
            "event_id",
            fmt_ts(F.col("ts"), with_micros=True).alias("click_ts"),
            fmt_ts(F.col("matched_ts"), with_micros=True).alias("purchase_ts"),
            t4(F.col("matched_value")).alias("purchase_value"),
        )
        .orderBy("user_id", "event_id")
    )


# --------------------------------------------------------------------
# grouping sets (SQL surface)
# --------------------------------------------------------------------

_GSETS_ORACLE = """
SELECT
  coalesce(l_returnflag, 'ALL') AS returnflag,
  coalesce(CAST(l_suppkey AS VARCHAR), 'ALL') AS suppkey,
  round(sum(l_quantity), 2) AS sum_qty
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_suppkey), ())
ORDER BY returnflag, suppkey
"""


@register("grouping_sets_mixed", oracle=_GSETS_ORACLE,
          doc="GROUP BY GROUPING SETS via the SQL surface")
def grouping_sets_mixed(spark, sf_dir):
    T(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_gs")
    return spark.sql(
        """
        SELECT
          coalesce(l_returnflag, 'ALL') AS returnflag,
          coalesce(CAST(l_suppkey AS STRING), 'ALL') AS suppkey,
          round(sum(l_quantity), 2) AS sum_qty
        FROM lineitem_gs
        GROUP BY GROUPING SETS ((l_returnflag), (l_suppkey), ())
        ORDER BY returnflag, suppkey
        """
    )


# --------------------------------------------------------------------
# exact interpolated percentiles
# --------------------------------------------------------------------

# Percentiles hand-rolled identically on both sides (rank the group,
# pick floor/ceil positions of h = (n-1)p, interpolate v_lo +
# (v_hi - v_lo)*frac): the engines' built-in percentile_cont
# implementations compute the same DEFINITION through different
# floating expressions, which is not bit-stable; this formulation is.
_PCT_ORACLE = """
WITH ranked AS (
  SELECT o_orderpriority, o_totalprice,
         row_number() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice, o_orderkey) AS rn,
         count(*)    OVER (PARTITION BY o_orderpriority) AS n
  FROM orders
), pos AS (
  SELECT r.o_orderpriority, p.p, r.n,
         CAST(floor((r.n - 1) * p.p) AS BIGINT) + 1 AS lo_rn,
         CAST(ceil((r.n - 1) * p.p)  AS BIGINT) + 1 AS hi_rn,
         (r.n - 1) * p.p - floor((r.n - 1) * p.p)   AS frac
  FROM (SELECT DISTINCT o_orderpriority, n FROM ranked) r,
       (SELECT unnest([0.5::DOUBLE, 0.9::DOUBLE, 0.99::DOUBLE]) AS p) p
), interp AS (
  SELECT pos.o_orderpriority, pos.p,
         lo.o_totalprice + (hi.o_totalprice - lo.o_totalprice) * pos.frac AS v
  FROM pos
  JOIN ranked lo ON lo.o_orderpriority = pos.o_orderpriority AND lo.rn = pos.lo_rn
  JOIN ranked hi ON hi.o_orderpriority = pos.o_orderpriority AND hi.rn = pos.hi_rn
)
SELECT o_orderpriority,
       floor(max(CASE WHEN p = 0.5  THEN v END) * 10000.0) / 10000.0 AS p50,
       floor(max(CASE WHEN p = 0.9  THEN v END) * 10000.0) / 10000.0 AS p90,
       floor(max(CASE WHEN p = 0.99 THEN v END) * 10000.0) / 10000.0 AS p99
FROM interp
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register("percentile_order_value", oracle=_PCT_ORACLE,
          doc="exact interpolated percentiles per priority class (hand-rolled, bit-stable)")
def percentile_order_value(spark, sf_dir):
    from pyspark.sql import Window as W

    o = T(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    ranked = o.select(
        "o_orderpriority", "o_totalprice",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(W.partitionBy("o_orderpriority")).alias("n"),
    )
    # Single pass over the ranked relation: each row carries its
    # group's n, so every target rank (floor/ceil of (n-1)*p per p)
    # is computable in the filter, and the six lo/hi values pivot out
    # of one conditional aggregate — the old pos/lo/hi three-way
    # self-join executed the window subtree three times (same fix as
    # robust_outliers_mad, r15 plan audit).  Interpolation arithmetic
    # is unchanged: v_lo + (v_hi - v_lo) * ((n-1)*p - floor((n-1)*p))
    # with p the same double literals — bit-identical output.
    def _h(p):
        return (F.col("n") - 1) * F.lit(p)

    def _is_target(p):
        h = _h(p)
        return (F.col("rn") == F.floor(h) + 1) | (F.col("rn") == F.ceil(h) + 1)

    def _v(p):
        h = _h(p)
        v_lo = F.min(
            F.when(F.col("rn") == F.floor(h) + 1, F.col("o_totalprice"))
        )
        v_hi = F.min(
            F.when(F.col("rn") == F.ceil(h) + 1, F.col("o_totalprice"))
        )
        # n is constant per group, so min(n) == n and the frac
        # expression computes on the identical value
        hn = (F.min("n") - 1) * F.lit(p)
        return v_lo + (v_hi - v_lo) * (hn - F.floor(hn))

    t4v = lambda c: F.floor(c * F.lit(10000.0)) / F.lit(10000.0)  # noqa: E731
    return (
        ranked.filter(_is_target(0.5) | _is_target(0.9) | _is_target(0.99))
        .groupBy("o_orderpriority")
        .agg(
            t4v(_v(0.5)).alias("p50"),
            t4v(_v(0.9)).alias("p90"),
            t4v(_v(0.99)).alias("p99"),
        )
        .orderBy("o_orderpriority")
    )


@register("percentile_order_value_bucketed", oracle=_PCT_ORACLE,
          doc="same exact percentiles via two-pass histogram navigation "
              "— the designated scale form (no per-key sort)")
def percentile_order_value_bucketed(spark, sf_dir):
    """Same-oracle scale twin of ``percentile_order_value``: that
    form ranks every order inside |priority|=5 window partitions (a
    data-sized per-key sort — fine until one priority holds a
    terabyte); this one navigates a $1000-wide price histogram
    (two map-combined shuffles + ranking only inside the <=6 buckets
    per class that hold the target ranks — see
    ``sketches.bucketed_quantiles``). Identical results by
    construction, so both register the SAME oracle; keep the pair:
    the sort form verifies, the bucketed form scales — mirroring the
    ``robust_outliers_mad`` / ``_bucketed`` pairing."""
    from wire_spark.queries.sketches import bucketed_quantiles

    o = T(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_orderkey", "o_totalprice"
    )
    interp = bucketed_quantiles(
        o, (0.5, 0.9, 0.99),
        key="o_orderpriority", val="o_totalprice", tie="o_orderkey",
        width=1000.0,
    )
    t4v = lambda c: F.floor(c * F.lit(10000.0)) / F.lit(10000.0)  # noqa: E731
    return (
        interp.groupBy("o_orderpriority")
        .agg(
            t4v(F.max(F.when(F.col("p") == 0.5, F.col("v")))).alias("p50"),
            t4v(F.max(F.when(F.col("p") == 0.9, F.col("v")))).alias("p90"),
            t4v(F.max(F.when(F.col("p") == 0.99, F.col("v")))).alias("p99"),
        )
        .orderBy("o_orderpriority")
    )


# --------------------------------------------------------------------
# sessionization composition: top users by session count
# --------------------------------------------------------------------

_TOP_SESSIONS_ORACLE = EVENTS_TIMED_CTE + """,
flagged AS (
  SELECT user_id, ts, value,
    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
              >= INTERVAL 10 MINUTE
         OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
         THEN 1 ELSE 0 END AS new_session
  FROM events
), numbered AS (
  SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM flagged
), sessions AS (
  SELECT user_id, session_id, count(*) AS n_events
  FROM numbered GROUP BY user_id, session_id
)
SELECT user_id,
       count(*) AS n_sessions,
       CAST(max(n_events) AS BIGINT) AS max_session_events
FROM sessions
GROUP BY user_id
ORDER BY n_sessions DESC, user_id
LIMIT 10
"""


@register("sessionized_top_users", oracle=_TOP_SESSIONS_ORACLE,
          doc="session_window composition: top users by session count")
def sessionized_top_users(spark, sf_dir):
    e = events_timed(spark, sf_dir)
    sessions = (
        e.groupBy("user_id", F.session_window("ts", "10 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    return (
        sessions.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.max("n_events").alias("max_session_events"),
        )
        .orderBy(F.desc("n_sessions"), F.asc("user_id"))
        .limit(10)
    )


# --------------------------------------------------------------------
# multimodal frame-sampling + resize plan (composed, oracle-stated)
# --------------------------------------------------------------------

_FRAME_PLAN_ORACLE = """
WITH meta AS (
  SELECT doc_id,
         octet_length(encode(text)) % 640 + 1        AS width,
         (octet_length(encode(text)) * 7) % 480 + 1  AS height,
         octet_length(encode(text)) % 16 + 1         AS n_frames
  FROM documents
), frames AS (
  SELECT doc_id, width, height,
         unnest(range(0, n_frames, 4)) AS frame_idx
  FROM meta
)
SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
       CAST(width AS INT) AS width, CAST(height AS INT) AS height,
       CAST(CASE WHEN greatest(width, height) <= 224 THEN width
                 ELSE (width * 224) // greatest(width, height) END AS INT)
         AS target_w,
       CAST(CASE WHEN greatest(width, height) <= 224 THEN height
                 ELSE (height * 224) // greatest(width, height) END AS INT)
         AS target_h
FROM frames
ORDER BY doc_id, frame_idx
"""


@register("multimodal_frame_plan", oracle=_FRAME_PLAN_ORACLE,
          doc="composed media pipeline plan: decode metadata -> "
              "every-4th-frame sampling -> aspect-preserving resize "
              "targets, all typed columns")
def multimodal_frame_plan(spark, sf_dir):
    """The full pre-processing PLAN a video/image ingestion pipeline
    executes per asset — decode metadata, sample every 4th frame,
    compute aspect-preserving resize targets — with the Spark side
    running the real operator composition (mapInPandas decode ->
    sequence/explode frame sampling -> integer resize arithmetic)
    and the oracle stating the stub kernel in closed form. When a
    codec lands in the env only the decode kernel changes; the
    sampling/resize plumbing verified here is the part that must
    scale.

    Scale shape: decode is Arrow-batched mapInPandas (the one
    Python stage); frame explosion is a JVM sequence (bounded by
    n_frames, never data-dependent joins); resize targets are pure
    integer column arithmetic — (side * 224) div longest — so the
    plan hash-matches cross-engine with no float rounding.
    """
    from wire_spark.operators.multimodal import (
        attach_media, decode_media, frame_offsets, resize_plan)

    d = T(spark, sf_dir, "documents")
    decoded = decode_media(attach_media(d, "text"), id_col="doc_id")
    planned = resize_plan(frame_offsets(decoded, every=4), max_side=224)
    return (
        planned.select(
            "doc_id",
            F.col("frame_idx").cast("int").alias("frame_idx"),
            F.col("width").cast("int").alias("width"),
            F.col("height").cast("int").alias("height"),
            "target_w", "target_h",
        )
        .orderBy("doc_id", "frame_idx")
    )


# --------------------------------------------------------------------
# multimodal feature extraction — the Arrow-batched feature kernel,
# aggregated to a per-source mean feature profile
# --------------------------------------------------------------------

_FEATURE_ORACLE = """
WITH pos AS (
  -- BYTE grain, not characters: the kernel histograms the UTF-8
  -- payload bytes (it stands in for a binary-media embedding), so
  -- the oracle walks hex(encode(text)) in byte pairs; ord(char)
  -- would diverge on multibyte text (unicode sweep).  The pairs
  -- come from ONE linear regexp_extract_all scan — the earlier
  -- per-index substring(h, 2*i+1, 2) walk is O(position) per call,
  -- quadratic in document bytes (r11 longdocs: this oracle ran
  -- 400+ s on 100 KB docs; the regex form is sub-second)
  SELECT doc_id, source,
         octet_length(encode(text)) AS n,
         unnest(regexp_extract_all(hex(encode(text)), '..')) AS bp
  FROM documents WHERE octet_length(encode(text)) > 0
), hist AS (
  SELECT doc_id, source, n,
         CAST(CONCAT('0x', bp) AS INT) % 16 AS bkt,
         CAST(count(*) AS BIGINT) AS c
  FROM pos GROUP BY doc_id, source, n, bkt
), share AS (
  SELECT doc_id, source, bkt, (c * 10000) // n AS s FROM hist
), nd AS (
  SELECT source, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
  FROM documents GROUP BY source
)
SELECT sh.source, CAST(sh.bkt AS BIGINT) AS bkt, nd.n_docs,
       CAST(sum(sh.s) // nd.n_docs AS BIGINT) AS mean_share_1e4
FROM share sh JOIN nd USING (source)
GROUP BY sh.source, sh.bkt, nd.n_docs
ORDER BY sh.source, sh.bkt
"""


@register("multimodal_feature_stats", oracle=_FEATURE_ORACLE, bench=True,
          doc="media feature-extract kernel (Arrow-batched byte "
              "histogram stand-in) aggregated to per-source mean "
              "feature profiles, exact fixed-point")
def multimodal_feature_stats(spark, sf_dir):
    """The feature-extraction leg of the multimodal family (decode /
    feature-extract / resize / frame-sample): every media blob runs
    through the Arrow-batched ``extract_features`` kernel — the
    deterministic byte-histogram stand-in for a content embedding,
    with the REAL mapInPandas plumbing (binary batches in, vectorized
    numpy, typed long-form features out) — then features aggregate to
    a per-source mean profile, the fingerprint that catches a source
    whose media payloads changed encoder or got corrupted.

    Scale shape: kernel output is <= 16 rows per asset (feature
    grain); the doc->source attachment is a doc-grain equi-join; the
    profile aggregation keys on (source, bkt) — bounded. Per-doc
    shares are exact integers (floor(c*1e4/n)), so the mean (integer
    div by the broadcast per-source doc count) hash-matches
    cross-engine under any partitioning. When a real embedding lands,
    only the kernel body changes; grain and plumbing hold."""
    from wire_spark.operators.multimodal import extract_features

    d = T(spark, sf_dir, "documents").select("doc_id", "source", "text")
    feats = extract_features(attach_media(d, "text"), id_col="doc_id")
    nd = d.groupBy("source").agg(F.countDistinct("doc_id").alias("n_docs"))
    return (
        feats.join(d.select("doc_id", "source"), "doc_id")
        .groupBy("source", "bkt")
        .agg(F.sum("share_1e4").alias("ssum"))
        .join(F.broadcast(nd), "source")
        .select(
            "source",
            F.col("bkt").cast("long").alias("bkt"),
            "n_docs",
            F.expr("ssum div n_docs").alias("mean_share_1e4"),
        )
        .orderBy("source", "bkt")
    )
