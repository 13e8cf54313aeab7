"""Fifth extras batch: bucketed band (interval) self-join and
Heaps'-law vocabulary growth — two shapes a 100 TB pipeline needs
that neither the TPC-H set nor the dedup family exercises.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from wire_spark.catalog import register
from wire_spark.queries._util import T

# --------------------------------------------------------------------
# band join: order pairs within 7 days of each other (bucket-blocked)
# --------------------------------------------------------------------

# |t1 - t2| <= 7d is a BAND join — a theta join no equi-join planner
# handles natively. The scale-correct DataFrame expression: block time
# into band-width buckets, emit the probe side into its bucket and both
# neighbors, equi-join on (customer, bucket), then apply the exact
# predicate. A qualifying pair differs by at most one bucket, so it
# meets in exactly one (of the three distinct) emitted buckets — no
# dedup pass needed, no cross product anywhere.
_BURSTS_ORACLE = """
WITH o AS (
  SELECT o_orderkey, o_custkey, epoch_us(o_orderdate) // 1000000 AS es
  FROM orders
), p AS (
  SELECT o1.o_custkey AS custkey,
         abs(o1.es - o2.es) // 86400 AS gap_days
  FROM o o1 JOIN o o2
    ON o1.o_custkey = o2.o_custkey
   AND o1.o_orderkey < o2.o_orderkey
   AND abs(o1.es - o2.es) <= 604800
)
SELECT custkey,
       CAST(count(*) AS BIGINT)    AS n_burst_pairs,
       CAST(min(gap_days) AS BIGINT) AS min_gap_days,
       CAST(max(gap_days) AS BIGINT) AS max_gap_days
FROM p GROUP BY custkey
ORDER BY n_burst_pairs DESC, custkey
LIMIT 25
"""


@register("range_join_order_bursts", oracle=_BURSTS_ORACLE, bench=True,
          doc="band join via bucket blocking: per-customer order pairs "
              "placed within 7 days of each other")
def range_join_order_bursts(spark, sf_dir):
    """Customers whose orders cluster in time: every (o1, o2) pair of
    one customer's orders placed within 7 days, aggregated to burst
    counts and gap extrema. The band join is the building block for
    interval overlap, near-time correlation, and slowly-changing-
    dimension alignment — none expressible as a plain equi-join.

    Scale shape: one side is exploded into its 7-day bucket plus both
    neighbors (3x amplification, constant), then the join is a pure
    equi-join on (custkey, bucket) that AQE can plan like any other —
    shuffle cost O(3|orders|), never the O(|orders|^2 / |customers|)
    of a naive per-customer cross join, and skew on a hot customer is
    still bounded by the bucket width. The exact |diff| <= 7d
    predicate filters post-join; each qualifying pair matches in
    exactly one bucket (gap <= one bucket width implies bucket ids
    differ by <= 1, and the three emitted ids are distinct).
    Arithmetic is all integer epoch-seconds (gap days via integer
    div), so the oracle's plain theta join hash-matches.
    """
    o = T(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey",
        F.expr("unix_micros(o_orderdate) div 1000000").alias("es"),
    )
    bk = F.expr("es div 604800")
    probe = o.select(
        F.col("o_orderkey").alias("k1"),
        F.col("o_custkey").alias("custkey"),
        F.col("es").alias("es1"),
        F.explode(F.array(bk - 1, bk, bk + 1)).alias("bucket"),
    )
    build = o.select(
        F.col("o_orderkey").alias("k2"),
        F.col("o_custkey").alias("custkey"),
        F.col("es").alias("es2"),
        bk.alias("bucket"),
    )
    pairs = (
        probe.join(build, ["custkey", "bucket"])
        .filter((F.col("k1") < F.col("k2"))
                & (F.abs(F.col("es1") - F.col("es2")) <= 604800))
        .select("custkey",
                F.expr("abs(es1 - es2) div 86400").alias("gap_days"))
    )
    return (
        pairs.groupBy("custkey")
        .agg(
            F.count(F.lit(1)).alias("n_burst_pairs"),
            F.min("gap_days").alias("min_gap_days"),
            F.max("gap_days").alias("max_gap_days"),
        )
        .orderBy(F.desc("n_burst_pairs"), "custkey")
        .limit(25)
    )


# --------------------------------------------------------------------
# Heaps'-law vocabulary growth (scale-correct cumulative distinct)
# --------------------------------------------------------------------

# Cumulative distinct over a document order is inherently sequential
# if computed naively; the distributed form: each token's vocabulary
# contribution lands exactly once, at its FIRST-seen bucket
# (min(bucket) per token — one map-combinable groupBy), after which
# the cumulative sums run over a constant-size bucket table.
_VOCAB_GROWTH_ORACLE = """
WITH mx AS (SELECT max(doc_id) AS m FROM documents),
tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
), bucketed AS (
  SELECT (doc_id * 20) // (m + 1) AS bucket, token FROM tok, mx
), per_bucket_tokens AS (
  SELECT bucket, CAST(count(*) AS BIGINT) AS n_tokens
  FROM bucketed GROUP BY bucket
), first_seen AS (
  SELECT token, min(bucket) AS fb FROM bucketed GROUP BY token
), new_vocab AS (
  SELECT fb AS bucket, CAST(count(*) AS BIGINT) AS n_new
  FROM first_seen GROUP BY fb
), docs_per_bucket AS (
  SELECT (doc_id * 20) // (m + 1) AS bucket, count(*) AS n_docs
  FROM documents, mx GROUP BY 1
)
SELECT d.bucket, d.n_docs,
       CAST(sum(p.n_tokens) OVER
              (ORDER BY d.bucket ROWS UNBOUNDED PRECEDING) AS BIGINT)
         AS cum_tokens,
       CAST(sum(coalesce(v.n_new, 0)) OVER
              (ORDER BY d.bucket ROWS UNBOUNDED PRECEDING) AS BIGINT)
         AS cum_vocab
FROM docs_per_bucket d
JOIN per_bucket_tokens p ON d.bucket = p.bucket
LEFT JOIN new_vocab v ON d.bucket = v.bucket
ORDER BY d.bucket
"""


@register("text_vocab_growth", oracle=_VOCAB_GROWTH_ORACLE, bench=True,
          doc="Heaps'-law curve: cumulative vocabulary vs cumulative "
              "tokens over 20 doc_id buckets, via first-occurrence "
              "attribution")
def text_vocab_growth(spark, sf_dir):
    """Vocabulary growth curve (Heaps' law V ~ k*n^beta): cumulative
    distinct token count against cumulative token count across 20
    equal doc_id ranges. A corpus whose curve flattens early is
    repetitive (dup/boilerplate heavy); a curve that keeps climbing
    signals genuine diversity — a one-glance corpus health gauge used
    when staging training mixes.

    Scale shape: "cumulative distinct" never runs as a distinct per
    prefix. Each token contributes at exactly its first-seen bucket
    (min(bucket) per token — one shuffle on the token key, partial
    min map-side), so the heavy relation is touched once; the window
    cumsum then runs over a 20-row table on one task. The bucket id
    derives from max(doc_id) via a broadcast 1-row relation, integer
    arithmetic end-to-end.
    """
    d = T(spark, sf_dir, "documents")
    m = d.agg(F.max("doc_id").alias("m"))
    bucket = F.expr("(doc_id * 20) div (m + 1)")
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    bucketed = tok.crossJoin(F.broadcast(m)).select(
        bucket.alias("bucket"), "token")
    per_bucket = bucketed.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_tokens"))
    first_seen = bucketed.groupBy("token").agg(F.min("bucket").alias("fb"))
    new_vocab = first_seen.groupBy(F.col("fb").alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_new"))
    docs_pb = (
        d.crossJoin(F.broadcast(m))
        .select(bucket.alias("bucket"))
        .groupBy("bucket").agg(F.count(F.lit(1)).alias("n_docs"))
    )
    wc = W.orderBy("bucket").rowsBetween(W.unboundedPreceding, 0)
    return (
        docs_pb.join(per_bucket, "bucket")
        .join(new_vocab, "bucket", "left")
        .select(
            "bucket", "n_docs",
            F.sum("n_tokens").over(wc).alias("cum_tokens"),
            F.sum(F.coalesce(F.col("n_new"), F.lit(0))).over(wc)
            .alias("cum_vocab"),
        )
        .orderBy("bucket")
    )
