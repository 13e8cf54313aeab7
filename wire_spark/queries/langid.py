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


def _trained_profile(spark, sf_dir):
    """Training phase, shared with the plan tests: returns
    ``(d2, prof)`` where ``d2`` is the cached (lang, trigram-array)
    document relation and ``prof`` the top-50-per-language trained
    profile (WindowGroupLimit-bounded rank filter).  Split out so the
    scale property of the training window stays plan-assertable now
    that classification collects the profile during construction."""
    from wire_spark.queries._util import tracked_cache

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
    # the trigram array is computed ONCE per document and cached as a
    # narrow (lang, trigram-array) relation feeding BOTH phases —
    # training explodes it, classification array_distincts it.  The
    # split/zip_with chain is the query's single most expensive
    # expression (measured ~1.1 s per evaluation at sf0.1, r15), and
    # the old form evaluated it twice (train + classify); the r9
    # checkpoint-share experiment failed because it shared the
    # EXPLODED corpus-grain relation through a shuffle — this caches
    # the pre-explode document-grain rows in executor memory, no
    # shuffle anywhere.
    d2 = tracked_cache(d.select(
        "lang",
        F.when(F.length("t") >= 3, F.expr(trigrams))
        .otherwise(F.expr("CAST(array() AS ARRAY<STRING>)")).alias("_tf"),
    ))
    # training counts map-combine straight to the (lang, tri) grain:
    # each map task's partial aggregate is bounded by the trigram
    # domain, so the shuffle never carries corpus-grain rows
    cnt = (
        d2.select("lang", F.explode("_tf").alias("tri"))
        .groupBy("lang", "tri")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    wl = W.partitionBy("lang").orderBy(F.desc("c"), F.asc("tri"))
    prof = (
        cnt.withColumn("r", F.row_number().over(wl))
        .filter(F.col("r") <= 50)
        .select(F.col("lang").alias("plang"), "tri")
    )
    return d2, prof


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
    domain), and classification is fully SCAN-LOCAL: the trained
    profile (languages x 50 rows) is collected once and re-enters
    the plan as array literals, each document scores all languages
    via in-row array_intersect, and the argmax is an in-row
    array_max — zero document-grain shuffles anywhere in the scoring
    path (the confusion-matrix aggregate is |langs|^2 groups,
    map-combined).  The top-50-per-lang window is
    WindowGroupLimit-bounded (rank filter, bounded key set).
    Training data = classification data here (self-classification),
    which is the deterministic-oracle form; train/test splitting
    composes with `train_val_test_split`."""
    d2, prof = _trained_profile(spark, sf_dir)
    # Classification is SCAN-LOCAL (r15 optimization round): the
    # trained profile is tiny (|langs| x 50 trigrams — the same order
    # as bloom_join_prune's collected bitmap), so it is collected once
    # and re-enters the plan as per-language array literals.  Each
    # document's overlap with language k is then
    # size(array_intersect(distinct-trigram-array, profile_k)) —
    # identical to the old explode -> broadcast-join -> count(DISTINCT
    # doc trigram in profile) but computed in the row, so the whole
    # scoring path has ZERO shuffles at document grain (the old form
    # paid a (doc_id, plang) aggregate exchange plus a per-doc argmax
    # window; at 100 TB those shuffles are corpus-sized).  The argmax
    # rides array_max over (ov, -lang_rank) structs: max ov first,
    # ties to the alphabetically-first language (= highest -rank),
    # exactly the oracle's (ov DESC, plang ASC) rank-1 row; docs with
    # no positive overlap (including <3-char docs, whose trigram
    # array is empty) fall back to 'unk' like the oracle's left join.
    #   (An earlier form shared a (doc_id, lang, tri) aggregate with
    #   training via an eager checkpoint; the share paid a corpus-
    #   grain shuffle + disk materialization — ~40% of the query's
    #   wall time at sf0.1, NOTES round 9.)
    prows = prof.collect()
    by_lang: dict[str, list[str]] = {}
    for r in prows:
        by_lang.setdefault(r["plang"], []).append(r["tri"])
    langs = sorted(by_lang)
    if not langs:
        pred_lang = F.lit("unk")
        scoring = d2
    else:
        # two-stage intersect: first cut the document's distinct
        # trigrams to the UNION of all profiles (one hash pass over
        # the full array), then score each language over that <=
        # |profiles|-element remainder — 5x less per-row hashing than
        # intersecting the full array per language
        all_tris = sorted({x for tris in by_lang.values() for x in tris})
        pref = F.array_intersect(
            F.array_distinct(F.col("_tf")),
            F.array(*[F.lit(x) for x in all_tris]),
        )
        scored = [
            F.struct(
                F.size(F.array_intersect(
                    F.col("_pref"), F.array(*[F.lit(x) for x in by_lang[lg]])
                )).alias("ov"),
                F.lit(-k).alias("nr"),
            )
            for k, lg in enumerate(langs)
        ]
        best = F.array_max(F.array(*scored))
        lang_lits = F.array(*[F.lit(lg) for lg in langs])
        pred_lang = F.when(
            best["ov"] > 0,
            F.element_at(lang_lits, (-best["nr"] + 1).cast("int")),
        ).otherwise(F.lit("unk"))
        scoring = d2.withColumn("_pref", pref)
    return (
        scoring.groupBy(
            F.col("lang").alias("true_lang"),
            pred_lang.alias("pred_lang"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("true_lang", "pred_lang")
    )
