"""Deterministic sampling & split operators for training-data
pipelines: hash-based sampling, train/val/test assignment, and token
Zipf statistics.

Why hash-based, not ``df.sample``: random sampling is seed- and
partitioning-dependent (not reproducible across engines, runs, or
cluster layouts). Hashing a stable key gives a sample that is (a)
identical on every engine — the DuckDB oracles mirror the arithmetic
exactly, (b) stable under repartitioning/retries, and (c) consistent
across derived tables (joining a 10% sample of documents to any
side table keeps exactly those documents). This is the standard
reproducible-pipeline design for corpus curation at any scale — one
narrow projection, no shuffle at all for the sample filter itself.

The hash is the portable md5-prefix primitive (`md5_long`,
queries/_util.py), bucketed by modulus.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from wire_spark.catalog import register
from wire_spark.functions.text import ascii_lower
from wire_spark.queries._util import T, md5_long, t4

# --------------------------------------------------------------------
# 10% deterministic sample
# --------------------------------------------------------------------

_SAMPLE_ORACLE = """
SELECT doc_id, lang, n_chars
FROM documents
WHERE CAST(CONCAT('0x', SUBSTRING(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 10 = 0
ORDER BY doc_id
"""


@register("sample_hash_documents", oracle=_SAMPLE_ORACLE, bench=True,
          doc="deterministic 10% corpus sample: md5(doc_id) % 10 == 0")
def sample_hash_documents(spark, sf_dir):
    """Reproducible 10% sample — the filter is a pure projection
    (no shuffle, pushes nothing but the scan), identical under any
    partitioning and on any engine."""
    d = T(spark, sf_dir, "documents")
    h = md5_long(F.col("doc_id").cast("string"))
    return (
        d.filter(h % 10 == 0)
        .select("doc_id", "lang", "n_chars")
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------
# train/val/test split assignment
# --------------------------------------------------------------------

_SPLIT_ORACLE = """
WITH assigned AS (
  SELECT
    lang,
    CASE
      WHEN b < 80 THEN 'train'
      WHEN b < 90 THEN 'val'
      ELSE 'test'
    END AS split
  FROM (
    SELECT lang,
           CAST(CONCAT('0x', SUBSTRING(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 AS b
    FROM documents
  )
)
SELECT lang, split, count(*) AS n_docs
FROM assigned
GROUP BY lang, split
ORDER BY lang, split
"""


@register("train_val_test_split", oracle=_SPLIT_ORACLE, bench=True,
          doc="deterministic 80/10/10 train/val/test split by doc_id hash, "
              "counted per language")
def train_val_test_split(spark, sf_dir):
    """Hash-range split assignment (80/10/10): stable across runs,
    engines, and table layouts — a document never migrates between
    splits when the corpus grows, which sampled or ordered splits
    cannot guarantee. Output is the per-(lang, split) audit count."""
    d = T(spark, sf_dir, "documents")
    b = md5_long(F.col("doc_id").cast("string")) % 100
    split = (
        F.when(b < 80, "train").when(b < 90, "val").otherwise("test")
    )
    return (
        d.select("lang", split.alias("split"))
        .groupBy("lang", "split")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("lang", "split")
    )


# --------------------------------------------------------------------
# token Zipf statistics
# --------------------------------------------------------------------

_ZIPF_ORACLE = """
WITH tok AS (
  SELECT unnest(string_split(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), ' ')) AS token FROM documents
), freq AS (
  SELECT token, count(*) AS freq FROM tok WHERE token != '' GROUP BY token
), total_t AS (SELECT sum(freq) AS total FROM freq),
ranked AS (
  SELECT token, freq,
         row_number() OVER (ORDER BY freq DESC, token) AS rank
  FROM freq
)
SELECT rank, token, freq,
       floor(sum(freq) OVER (ORDER BY rank) * 1.0 / total * 10000.0) / 10000.0
         AS cum_share
FROM ranked, total_t
WHERE rank <= 100
ORDER BY rank
"""


@register("token_zipf", oracle=_ZIPF_ORACLE, bench=True,
          doc="token rank-frequency (Zipf) profile: top-100 tokens with "
              "cumulative corpus share")
def token_zipf(spark, sf_dir):
    """Corpus token distribution — the curve you inspect before
    tokenizer training / vocab pruning. Counts are exact integers
    (cross-engine safe); the cumulative share is an exact integer sum
    divided once, floor-truncated (t4) for float parity. One shuffle
    for the count, partial top-k for the rank cut."""
    d = T(spark, sf_dir, "documents")
    tok = d.select(
        F.explode(F.split(ascii_lower(F.col("text")), " ")).alias("token")
    ).filter(F.col("token") != "")
    freq = tok.groupBy("token").agg(F.count(F.lit(1)).alias("freq"))
    total = freq.agg(F.sum("freq").alias("total"))
    from pyspark.sql import Window as W

    # Partial top-k FIRST: orderBy+limit compiles to
    # TakeOrderedAndProject — each partition keeps its own top-100,
    # only 100·n_partitions candidate rows reach the driver-side
    # merge. The rank/cumulative windows then run over <=100
    # survivor rows, where a single partition is the right plan.
    # (A bare row_number() window over the full distinct-token table
    # would funnel billions of rows through one task at 100 TB —
    # plan-asserted against in tests/test_plans.py.)
    top = freq.orderBy(F.desc("freq"), F.asc("token")).limit(100)
    ranked = top.withColumn(
        "rank", F.row_number().over(W.orderBy(F.desc("freq"), F.asc("token")))
    )
    cum = F.sum("freq").over(W.orderBy("rank"))
    return (
        ranked.crossJoin(F.broadcast(total))
        .select(
            "rank", "token", "freq",
            t4(cum * F.lit(1.0) / F.col("total")).alias("cum_share"),
        )
        .orderBy("rank")
    )


# --------------------------------------------------------------------
# stratified (per-language) deterministic sampling
# --------------------------------------------------------------------

_STRATIFIED_ORACLE = """
WITH ranked AS (
  SELECT doc_id, lang,
         row_number() OVER (
           PARTITION BY lang
           ORDER BY CAST(CONCAT('0x', SUBSTRING(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT),
                    doc_id
         ) AS rnk
  FROM documents
)
SELECT lang, doc_id, rnk
FROM ranked WHERE rnk <= 20
ORDER BY lang, rnk
"""


@register("sample_stratified_by_lang", oracle=_STRATIFIED_ORACLE, bench=True,
          doc="stratified sample: 20 docs per language by hash rank — "
              "deterministic source rebalancing")
def sample_stratified_by_lang(spark, sf_dir):
    """Equal-allocation stratified sampling: the top-20 documents per
    language by md5 hash rank. Hash-ranking makes the selection (a)
    uniform within each stratum, (b) stable across runs/engines/
    layouts, and (c) prefix-consistent — growing the per-stratum
    budget keeps every previously selected doc (hash order doesn't
    reshuffle), which sampled-fraction approaches cannot guarantee.
    Scale shape: ``lang`` is a LOW-cardinality partition key — a
    single window over it would funnel each billion-row stratum
    through one task. The top-k is therefore two-level: per
    (lang, hash-bucket) top-20 first (64x the parallelism, each
    window bounded), then the per-lang merge ranks <= 64*20 survivor
    rows. Identical output to the direct form (each bucket keeps its
    own 20 best, and the global 20 best all lie in some bucket's
    top-20). The text column is never read."""
    from pyspark.sql import Window as W

    d = T(spark, sf_dir, "documents")
    h = md5_long(F.col("doc_id").cast("string"))
    bucketed = d.select("lang", "doc_id", h.alias("h")).withColumn(
        "b", F.pmod(F.col("h"), F.lit(64))
    )
    w1 = W.partitionBy("lang", "b").orderBy("h", F.asc("doc_id"))
    survivors = (
        bucketed.withColumn("r1", F.row_number().over(w1))
        .filter(F.col("r1") <= 20)
    )
    w2 = W.partitionBy("lang").orderBy("h", F.asc("doc_id"))
    return (
        survivors.withColumn("rnk", F.row_number().over(w2))
        .filter(F.col("rnk") <= 20)
        .select("lang", "doc_id", "rnk")
        .orderBy("lang", "rnk")
    )


# --------------------------------------------------------------------
# source-mixing weights toward a target token distribution
# --------------------------------------------------------------------

_MIXING_ORACLE = """
WITH per_source AS (
  SELECT source,
         count(*) AS n_docs,
         CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source
), tot AS (SELECT sum(n_tokens) AS t, count(*) AS n_sources FROM per_source)
SELECT source, n_docs, n_tokens,
       floor(n_tokens * 10000.0 / t) / 10000.0 AS current_share,
       floor(10000.0 / n_sources) / 10000.0 AS target_share,
       floor((t * 1.0 / n_sources) * 10000.0 / n_tokens) / 10000.0
         AS sampling_weight
FROM per_source CROSS JOIN tot
ORDER BY source
"""


@register("curation_mixing_weights", oracle=_MIXING_ORACLE,
          doc="per-source sampling weights to reach a uniform token "
              "budget across sources (data-mixing planning)")
def curation_mixing_weights(spark, sf_dir):
    """Data-mixture planning: per-source token counts, current corpus
    share, and the sampling weight (target/current) that would equalize
    token budgets across sources — the table a pretraining run's
    mixing config is derived from (uniform target here; any target
    vector is the same arithmetic). All ratios are exact-integer
    rationals floored at 4 dp. Scale shape: one aggregation keyed on
    source (low cardinality, partial-agg), one broadcast of the
    one-row total."""
    d = T(spark, sf_dir, "documents")
    per_source = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split(F.col("text"), " "))).alias("n_tokens"),
    )
    tot = per_source.agg(
        F.sum("n_tokens").alias("t"), F.count(F.lit(1)).alias("n_sources")
    )
    f4 = lambda c: F.floor(c * F.lit(10000.0)) / F.lit(10000.0)  # noqa: E731
    return (
        per_source.crossJoin(F.broadcast(tot))
        .select(
            "source", "n_docs", "n_tokens",
            f4(F.col("n_tokens") * F.lit(1.0) / F.col("t")).alias("current_share"),
            f4(F.lit(1.0) / F.col("n_sources")).alias("target_share"),
            f4((F.col("t") * F.lit(1.0) / F.col("n_sources")) / F.col("n_tokens")).alias("sampling_weight"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------
# weighted interleave schedule (stride scheduling of the data loader)
# --------------------------------------------------------------------

_INTERLEAVE_ORACLE = """
WITH per_doc AS (
  SELECT source, doc_id,
         len(list_filter(string_split(text, ' '), x -> x != '')) AS n_tokens,
         CAST(CONCAT('0x', SUBSTRING(md5(CAST(doc_id AS VARCHAR)), 1, 15))
              AS BIGINT) AS hk
  FROM documents
), per_source AS (
  SELECT source, CAST(sum(n_tokens) AS BIGINT) AS src_tokens
  FROM per_doc GROUP BY source
), ranked AS (
  SELECT d.source, d.doc_id, s.src_tokens,
         row_number() OVER (PARTITION BY d.source ORDER BY d.hk, d.doc_id)
           AS rank_in_source
  FROM per_doc d JOIN per_source s USING (source)
), strided AS (
  SELECT source, doc_id, rank_in_source,
         CAST(rank_in_source AS BIGINT) * src_tokens AS stride_key
  FROM ranked
)
SELECT row_number() OVER (ORDER BY stride_key, source, doc_id) AS schedule_pos,
       source, doc_id, rank_in_source, stride_key
FROM strided
ORDER BY schedule_pos
LIMIT 60
"""


@register("curation_interleave_schedule", oracle=_INTERLEAVE_ORACLE, bench=True,
          doc="weighted interleave schedule: stride scheduling of docs "
              "so low-token sources surface proportionally more often "
              "(token-equalizing loader order), first 60 positions")
def curation_interleave_schedule(spark, sf_dir):
    """The deterministic data-loader order behind
    ``curation_mixing_weights``: each source's docs are shuffled by a
    stable hash, then stride-scheduled at virtual time
    ``rank_in_source * src_tokens`` — a source holding 1/10th the
    tokens emits docs 10x as densely, so cumulative token share stays
    equalized at every prefix (classic stride scheduling, all
    exact-integer keys so both engines agree on the total order).

    Scale shape: per-source rank is a window on the source key (the
    same partitioning the rollup uses); the global order materializes
    only the top-60 via TakeOrdered — the full schedule is never
    sorted globally, a consumer writes it bucketed by stride_key
    range instead.
    """
    from pyspark.sql import Window as W

    d = T(spark, sf_dir, "documents").select(
        "source",
        "doc_id",
        F.expr("size(filter(split(text, ' '), x -> x != ''))").alias("n_tokens"),
        md5_long(F.col("doc_id").cast("string")).alias("hk"),
    )
    per_source = d.groupBy("source").agg(F.sum("n_tokens").alias("src_tokens"))
    w_rank = W.partitionBy("source").orderBy(F.asc("hk"), F.asc("doc_id"))
    ranked = (
        d.join(F.broadcast(per_source), "source")
        .withColumn("rank_in_source", F.row_number().over(w_rank))
        .select(
            "source", "doc_id", "rank_in_source",
            (F.col("rank_in_source").cast("long") * F.col("src_tokens")).alias(
                "stride_key"
            ),
        )
    )
    # Partial top-k FIRST (same fix as token_zipf): orderBy+limit
    # compiles to TakeOrderedAndProject, so each partition forwards
    # only its own top-60 — the global schedule_pos window then runs
    # over <=60 survivor rows instead of sorting the whole corpus
    # through one task.
    top = ranked.orderBy(
        F.asc("stride_key"), F.asc("source"), F.asc("doc_id")
    ).limit(60)
    w_sched = W.orderBy(F.asc("stride_key"), F.asc("source"), F.asc("doc_id"))
    return (
        top.withColumn("schedule_pos", F.row_number().over(w_sched))
        .select("schedule_pos", "source", "doc_id", "rank_in_source", "stride_key")
        .orderBy("schedule_pos")
    )


# --------------------------------------------------------------------
# dedup-aware weighted sampling: each near-dup cluster counts once
# --------------------------------------------------------------------

_DEDUP_WSAMPLE_ORACLE = ("""
WITH RECURSIVE w AS (
  SELECT doc_id, translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz') AS t FROM documents
), g AS (
  SELECT doc_id, unnest(range(1, length(t) - 1)) AS i, t FROM w
), sh AS (
  SELECT DISTINCT doc_id, substring(t, i, 3) AS shingle FROM g
), sizes AS (
  SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS i
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), pairs AS (
  SELECT d1, d2 FROM inter
  JOIN sizes s1 ON d1 = s1.doc_id
  JOIN sizes s2 ON d2 = s2.doc_id
  WHERE i * 1.0 / (s1.n + s2.n - i) >= 0.8
), edges AS (
  SELECT d1 AS a, d2 AS b FROM pairs
  UNION SELECT d2, d1 FROM pairs
  UNION SELECT d1, d1 FROM pairs
  UNION SELECT d2, d2 FROM pairs
), reach AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
), comp AS (
  SELECT a AS doc_id, min(b) AS component_id FROM reach GROUP BY a
), csize AS (
  SELECT component_id, CAST(count(*) AS BIGINT) AS cluster_size
  FROM comp GROUP BY component_id
), weighted AS (
  SELECT d.doc_id,
         COALESCE(cs.cluster_size, 1) AS cluster_size,
         -ln((CAST(CONCAT('0x', SUBSTRING(md5(CAST(d.doc_id AS VARCHAR)
              || ':dw'), 1, 15)) AS BIGINT) + 1) / 1152921504606846976.0)
           * COALESCE(cs.cluster_size, 1) AS key
  FROM documents d
  LEFT JOIN comp ON d.doc_id = comp.doc_id
  LEFT JOIN csize cs ON comp.component_id = cs.component_id
)
SELECT doc_id, cluster_size,
       floor(key * 100000000.0) / 100000000.0 AS sample_key
FROM weighted
ORDER BY sample_key, doc_id
LIMIT 40
""")


@register("sample_dedup_weighted", oracle=_DEDUP_WSAMPLE_ORACLE,
          doc="dedup-aware A-ES sample: inverse-cluster-size weights, "
              "so each near-dup cluster contributes ~one expected doc")
def sample_dedup_weighted(spark, sf_dir):
    """Duplication-corrected corpus sampling: every document's weight
    is 1/|its near-dup cluster| (singletons weigh 1), so in
    expectation each CLUSTER — not each copy — contributes equally to
    the sample. This is the sampling-time alternative to hard
    dedup-then-sample: boilerplate that survived as 30 near-copies
    no longer gets 30x the draw probability, but no document is
    irrevocably deleted either (soft dedup, the knob curation teams
    actually want when cluster membership is noisy).

    Composition: exact-Jaccard clusters (``connected_components``
    over the capped shingle join) feed cluster sizes into the same
    deterministic A-ES machinery as ``sample_weighted_by_length``
    (key = -ln(md5-uniform) / w = -ln(u) * cluster_size); smallest
    40 keys win, fully reproducible cross-engine.

    Scale shape: clustering cost is the edge generator's (swap in
    the LSH edge source at 100 TB, as everywhere); the sampling
    itself adds one broadcast-joinable cluster-size table (clusters
    << docs) over a stateless projection + TakeOrdered — no global
    sort, no driver pass."""
    from wire_spark.operators.graph import connected_components
    from wire_spark.queries.dedup import _jaccard_pairs
    from wire_spark.queries._util import md5_long

    pairs = _jaccard_pairs(spark, sf_dir, 0.8).select("d1", "d2")
    comps = connected_components(pairs, src="d1", dst="d2")
    csize = comps.groupBy("comp").agg(F.count(F.lit(1)).alias("cluster_size"))
    membership = comps.join(csize, "comp").select(
        F.col("id").alias("doc_id"), "cluster_size"
    )
    docs = T(spark, sf_dir, "documents").select("doc_id")
    u = (
        md5_long(F.concat(F.col("doc_id").cast("string"), F.lit(":dw"))) + 1
    ) / F.lit(1152921504606846976.0)
    weighted = (
        docs.join(F.broadcast(membership), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("cluster_size", F.lit(1)).cast("long").alias("cluster_size"),
        )
    )
    key = -F.log(u) * F.col("cluster_size")
    return (
        weighted.select(
            "doc_id", "cluster_size",
            (F.floor(key * F.lit(100000000.0)) / F.lit(100000000.0)).alias(
                "sample_key"
            ),
        )
        .orderBy("sample_key", "doc_id")
        .limit(40)
    )
