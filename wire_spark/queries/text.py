"""Text analysis for LLM-data pipelines: token stats, quality scoring,
language-ID heuristic, document fingerprinting.

These extend the reference's surface per the north star (BASELINE.json)
— the reference's only text op is recursive uppercase
(internal/pipeline/pipeline.go:324-340); a training-data pipeline needs
the ops below. Everything is built from JVM-side `pyspark.sql.functions`
(regexp/md5/array ops) — no Python UDFs in these hot paths, so the
whole stage stays in whole-stage codegen and scales linearly with
documents.

Cross-engine parity: regex patterns restricted to the common
Java-regex/RE2 subset (`\\b`, `\\S`, non-capturing groups); hashes are
md5 (identical everywhere); per-row ratios floor-truncate to 4 dp
(see _util.t4 — decimal `round` is not cross-engine-stable on exact
.5 boundaries).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from wire_spark.catalog import register
from wire_spark.functions.text import (
    LANG_MARKERS,
    bpe_tokens,
    fingerprint,
    quality_score,
    stopword_tokens,
    ws_tokens,
)
from wire_spark.queries._util import T, t4

# --------------------------------------------------------------------
# token statistics
# --------------------------------------------------------------------

_TOKEN_ORACLE = r"""
SELECT
  doc_id,
  n_chars,
  length(regexp_extract_all(text, '\S+'))                       AS n_tokens,
  length(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]')) AS n_bpe_tokens,
  length(list_distinct(regexp_extract_all(text, '\S+')))        AS n_distinct_tokens,
  floor((length(regexp_replace(text, '\s', '', 'g')) * 1.0
        / length(regexp_extract_all(text, '\S+'))) * 10000.0) / 10000.0 AS avg_token_len
FROM documents
ORDER BY doc_id
"""


@register("text_token_stats", oracle=_TOKEN_ORACLE, bench=True,
          doc="whitespace + BPE-ish token counting per document")
def text_token_stats(spark, sf_dir):
    d = T(spark, sf_dir, "documents")
    toks = ws_tokens("text")
    return (
        d.select(
            "doc_id",
            "n_chars",
            F.size(toks).alias("n_tokens"),
            F.size(bpe_tokens("text")).alias("n_bpe_tokens"),
            F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
            t4(
                # nullif: Spark 4 ANSI raises on 0/0 where the DuckDB
                # oracle NULL-bands (zero-token docs, unicode sweep)
                F.length(F.regexp_replace("text", r"\s", "")) * F.lit(1.0)
                / F.nullif(F.size(toks), F.lit(0))
            ).alias("avg_token_len"),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------
# quality scoring
# --------------------------------------------------------------------

# quality = 0.4*length_score + 0.3*lexical_diversity + 0.3*stopword_signal
# (shape follows published heuristic-filter pipelines: length, diversity
# and stopword presence as cheap quality proxies).
_QUALITY_ORACLE = r"""
SELECT
  doc_id,
  floor(least(1.0, n_chars / 500.0) * 10000.0) / 10000.0 AS length_score,
  floor(length(list_distinct(regexp_extract_all(text, '\S+'))) * 1.0
        / length(regexp_extract_all(text, '\S+')) * 10000.0) / 10000.0 AS diversity,
  floor(length(regexp_extract_all(text, '\b(?:the|a|of|and|in)\b')) * 1.0
        / length(regexp_extract_all(text, '\S+')) * 10000.0) / 10000.0 AS stopword_ratio,
  floor((0.4 * least(1.0, n_chars / 500.0)
      + 0.3 * (length(list_distinct(regexp_extract_all(text, '\S+'))) * 1.0
               / length(regexp_extract_all(text, '\S+')))
      + 0.3 * (length(regexp_extract_all(text, '\b(?:the|a|of|and|in)\b')) * 1.0
               / length(regexp_extract_all(text, '\S+')))) * 10000.0) / 10000.0 AS quality
FROM documents
ORDER BY doc_id
"""


@register("text_quality_score", oracle=_QUALITY_ORACLE, bench=True,
          doc="length/diversity/stopword quality heuristic")
def text_quality_score(spark, sf_dir):
    d = T(spark, sf_dir, "documents")
    toks = ws_tokens("text")
    # nullif: zero-token docs get NULL ratios matching the oracle's
    # 0/0 NULL-band (Spark-ANSI would raise — unicode-sweep class)
    n_tokens = F.nullif(F.size(toks), F.lit(0))
    length_score = F.least(F.lit(1.0), F.col("n_chars") / F.lit(500.0))
    diversity = F.size(F.array_distinct(toks)) * F.lit(1.0) / n_tokens
    stop_ratio = F.size(stopword_tokens("text")) * F.lit(1.0) / n_tokens
    return (
        d.select(
            "doc_id",
            t4(length_score).alias("length_score"),
            t4(diversity).alias("diversity"),
            t4(stop_ratio).alias("stopword_ratio"),
            t4(quality_score("text", "n_chars")).alias("quality"),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------
# language-ID heuristic (stopword-marker n-gram voting)
# --------------------------------------------------------------------

_LANG_ORACLE = r"""
WITH scored AS (
  SELECT
    doc_id, lang,
    length(regexp_extract_all(text, '\b(?:the|a|of|and|in)\b'))   AS en_cnt,
    length(regexp_extract_all(text, '\b(?:el|los|una|que)\b'))    AS es_cnt,
    length(regexp_extract_all(text, '\b(?:le|les|une|est)\b'))    AS fr_cnt,
    length(regexp_extract_all(text, '\b(?:der|und|ein|ist)\b'))   AS de_cnt
  FROM documents
)
SELECT
  doc_id, lang,
  CASE
    WHEN greatest(en_cnt, es_cnt, fr_cnt, de_cnt) = 0 THEN 'unknown'
    WHEN en_cnt >= greatest(es_cnt, fr_cnt, de_cnt) THEN 'en'
    WHEN es_cnt >= greatest(fr_cnt, de_cnt) THEN 'es'
    WHEN fr_cnt >= de_cnt THEN 'fr'
    ELSE 'de'
  END AS pred_lang,
  en_cnt, es_cnt, fr_cnt, de_cnt
FROM scored
ORDER BY doc_id
"""


@register("text_lang_id", oracle=_LANG_ORACLE,
          doc="marker-stopword language-ID heuristic")
def text_lang_id(spark, sf_dir):
    d = T(spark, sf_dir, "documents")
    cnt = lambda pat: F.size(F.regexp_extract_all("text", F.lit(pat), 0))  # noqa: E731
    scored = d.select(
        "doc_id",
        "lang",
        cnt(LANG_MARKERS["en"]).alias("en_cnt"),
        cnt(LANG_MARKERS["es"]).alias("es_cnt"),
        cnt(LANG_MARKERS["fr"]).alias("fr_cnt"),
        cnt(LANG_MARKERS["de"]).alias("de_cnt"),
    )
    top = F.greatest("en_cnt", "es_cnt", "fr_cnt", "de_cnt")
    pred = (
        F.when(top == 0, "unknown")
        .when(F.col("en_cnt") >= F.greatest("es_cnt", "fr_cnt", "de_cnt"), "en")
        .when(F.col("es_cnt") >= F.greatest("fr_cnt", "de_cnt"), "es")
        .when(F.col("fr_cnt") >= F.col("de_cnt"), "fr")
        .otherwise("de")
    )
    return (
        scored.select(
            "doc_id", "lang", pred.alias("pred_lang"),
            "en_cnt", "es_cnt", "fr_cnt", "de_cnt",
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------
# document fingerprinting
# --------------------------------------------------------------------

_FP_ORACLE = r"""
SELECT
  doc_id,
  md5(translate(regexp_replace(text, '\s+', ' ', 'g'), 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz')) AS fingerprint,
  substring(md5(translate(regexp_replace(text, '\s+', ' ', 'g'), 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz')), 1, 4) AS shard_key
FROM documents
ORDER BY doc_id
"""


@register("text_fingerprint", oracle=_FP_ORACLE,
          doc="content fingerprint (md5 of normalized text) + shard key")
def text_fingerprint(spark, sf_dir):
    d = T(spark, sf_dir, "documents")
    fp = fingerprint("text")
    return (
        d.select(
            "doc_id",
            fp.alias("fingerprint"),
            # prefix as a partition/shard key: uniform by construction,
            # the right bucketing column for exact-dedup at 100 TB
            F.substring(fp, 1, 4).alias("shard_key"),
        )
        .orderBy("doc_id")
    )
