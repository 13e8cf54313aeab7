"""Trainable language identification: character-trigram profiles
learned from the corpus itself, then used to classify every document,
with the resulting confusion matrix as the output.

This upgrades text.py's fixed-heuristic `text_lang_id` (stopword
lists) to the classic trained n-gram profile method (Cavnar & Trenkle
1994): the model IS a DataFrame, training is an aggregation, and
classification is a broadcast join — no Python in the loop, and the
whole train-then-classify cycle stays declarative, which is exactly
how a model-light classifier should look on Spark.

Cross-engine: profiles and overlap scores are pure integer counts
with total-order tiebreaks (count desc, trigram asc / lang asc), so
the trained model and every prediction are bit-identical in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from wire_spark.catalog import register
from wire_spark.functions.text import ascii_lower
from wire_spark.queries._util import T

_LANGID_ORACLE = """
WITH d AS (SELECT doc_id, lang, translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz') AS t FROM documents
           WHERE lang IS NOT NULL),
-- char trigrams as a zip of three shifted char-array slices: both a
-- slicing comprehension and per-index substring() are O(position)
-- on UTF-8 strings, turning the explode quadratic in document
-- length (the r11 longdocs sweep: 100 KB docs pushed this oracle
-- past 380 s; the zip form is linear)
cd AS (SELECT doc_id, lang, t, string_split(t, '') AS cs
       FROM d WHERE length(t) >= 3),
tri AS (
  SELECT doc_id, lang,
         unnest(list_transform(
           list_zip(cs[1:length(t)-2], cs[2:length(t)-1], cs[3:length(t)]),
           z -> z[1] || z[2] || z[3])) AS tri
  FROM cd
),
cnt AS (SELECT lang, tri, count(*) AS c FROM tri GROUP BY 1, 2),
prof AS (
  SELECT lang AS plang, tri FROM (
    SELECT lang, tri,
           row_number() OVER (PARTITION BY lang ORDER BY c DESC, tri) AS r
    FROM cnt
  ) WHERE r <= 50
),
dtri AS (SELECT DISTINCT doc_id, tri FROM tri),
ov AS (
  SELECT dt.doc_id, p.plang, count(*) AS ov
  FROM dtri dt JOIN prof p USING (tri) GROUP BY 1, 2
),
pred AS (
  SELECT doc_id, plang FROM (
    SELECT doc_id, plang,
           row_number() OVER (PARTITION BY doc_id ORDER BY ov DESC, plang) AS r
    FROM ov
  ) WHERE r = 1
)
SELECT d.lang AS true_lang, COALESCE(p.plang, 'unk') AS pred_lang,
       count(*) AS n
FROM d LEFT JOIN pred p USING (doc_id)
GROUP BY 1, 2
ORDER BY 1, 2
"""


@register("text_langid_trigram_trained", oracle=_LANGID_ORACLE, bench=True,
          doc="trainable char-trigram lang-ID (Cavnar-Trenkle profiles, "
              "top-50 per language) — confusion matrix of self-"
              "classification")
def text_langid_trigram_trained(spark, sf_dir):
    """Train: count character trigrams per labeled language, keep each
    language's top-50 as its profile. Classify: score every document
    by profile-overlap of its distinct trigrams, predict the argmax
    (ties break to the alphabetically-first language; profile-less
    docs fall back to 'unk'). Output: the confusion matrix.

    Scale shape: NEITHER phase shuffles at corpus-trigram grain —
    training explodes trigrams and map-combines straight to the
    (lang, tri) grain (partial aggregates bounded by the trigram
    domain), and classification derives each document's distinct
    trigrams ROW-LOCALLY (array_distinct over the in-row transform,
    zero shuffle), so the scoring path's first shuffle is the
    bounded (doc_id, plang) overlap. The top-50-per-lang window is
    WindowGroupLimit-bounded (rank filter, bounded key set); the
    trained profile is languages x 50 rows — broadcast into the
    scoring join so the document side never reshuffles on the
    trigram; the per-doc argmax partitions by doc_id. Training data =
    classification data here (self-classification), which is the
    deterministic-oracle form; train/test splitting composes with
    `train_val_test_split`."""
    d = T(spark, sf_dir, "documents").filter(
        F.col("lang").isNotNull()
    ).select(
        "doc_id", "lang", ascii_lower(F.col("text")).alias("t")
    )
    # char trigrams as a zip of three shifted slices of the char
    # array.  The transform(sequence(...), i -> substring(t, i, 3))
    # form was quadratic twice over: projection collapse re-inlines
    # the ascii_lower() behind t into the lambda (re-evaluated per
    # element — the word_shingles lesson), and substring() itself is
    # O(position) on UTF8String — 100 KB docs timed the query out in
    # the r11 longdocs sweep.  Every expression here is top-level and
    # the lambdas touch only their element arguments.
    trigrams = (
        "zip_with(zip_with("
        " slice(split(t, ''), 1, length(t) - 2),"
        " slice(split(t, ''), 2, length(t) - 2),"
        " (a, b) -> concat(a, b)),"
        " slice(split(t, ''), 3, length(t) - 2),"
        " (a, b) -> concat(a, b))"
    )
    # training counts map-combine straight to the (lang, tri) grain:
    # each map task's partial aggregate is bounded by the trigram
    # domain, so the shuffle never carries corpus-grain rows
    cnt = (
        d.filter(F.length("t") >= 3)
        .select("lang", F.explode(F.expr(trigrams)).alias("tri"))
        .groupBy("lang", "tri")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    wl = W.partitionBy("lang").orderBy(F.desc("c"), F.asc("tri"))
    prof = (
        cnt.withColumn("r", F.row_number().over(wl))
        .filter(F.col("r") <= 50)
        .select(F.col("lang").alias("plang"), "tri")
    )
    # per-doc DISTINCT trigrams derived row-locally (array_distinct
    # over the in-row transform): a generate, zero shuffle — the
    # scoring path's first shuffle is the bounded (doc_id, plang)
    # overlap aggregate below.  An earlier form shared a
    # (doc_id, lang, tri) aggregate with training via an eager
    # checkpoint; the share saved this re-explode but paid a
    # corpus-grain shuffle + disk materialization (~40% of the
    # query's wall time at sf0.1 — NOTES round 9).
    dtri = d.filter(F.length("t") >= 3).select(
        "doc_id",
        F.explode(F.expr(f"array_distinct({trigrams})")).alias("tri"),
    )
    ov = (
        dtri.join(F.broadcast(prof), "tri")
        .groupBy("doc_id", "plang")
        .agg(F.count(F.lit(1)).alias("ov"))
    )
    wd = W.partitionBy("doc_id").orderBy(F.desc("ov"), F.asc("plang"))
    pred = (
        ov.withColumn("r", F.row_number().over(wd))
        .filter(F.col("r") == 1)
        .select("doc_id", "plang")
    )
    return (
        d.join(pred, "doc_id", "left")
        .groupBy(
            F.col("lang").alias("true_lang"),
            F.coalesce(F.col("plang"), F.lit("unk")).alias("pred_lang"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("true_lang", "pred_lang")
    )
