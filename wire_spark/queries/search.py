"""Search-engine primitives over the document corpus: inverted-index
conjunctive retrieval and positional phrase search.

Both are expressed the way a distributed index answers them — posting
lists as (term, doc) relations, positions as (doc, pos, token) — not
by scanning raw text with LIKE. That shape is what scales: the
posting relation is term-partitioned (only query-term postings are
touched), and phrase adjacency is an equi-join on (doc, pos+1).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from wire_spark.catalog import register
from wire_spark.queries._util import T

_QUERY_TERMS = ("batch", "stream", "window")

# --------------------------------------------------------------------
# conjunctive (AND) retrieval via posting-list intersection
# --------------------------------------------------------------------

_CONJ_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents
), hits AS (
  SELECT doc_id, t FROM tok
  WHERE t IN ('{_QUERY_TERMS[0]}', '{_QUERY_TERMS[1]}', '{_QUERY_TERMS[2]}')
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_occurrences,
       CAST(count(DISTINCT t) AS BIGINT) AS n_terms
FROM hits
GROUP BY doc_id
HAVING count(DISTINCT t) = 3
ORDER BY n_occurrences DESC, doc_id
LIMIT 50
"""


@register("search_conjunctive_terms", oracle=_CONJ_ORACLE, bench=True,
          doc="inverted-index AND query: documents containing all of "
              "'batch', 'stream', 'window', ranked by occurrences")
def search_conjunctive_terms(spark, sf_dir):
    """Documents containing ALL three query terms, ranked by total
    term occurrences — conjunctive retrieval as posting-list
    intersection: filter the token relation to the query terms (the
    only postings touched), then one groupBy per doc checking
    distinct-term count equals the query arity.

    Scale shape: with a materialized (term, doc_id) posting table
    partitioned by term, the filter IS partition pruning — the scan
    reads exactly the query terms' postings, and the intersection is
    a map-combinable groupBy on doc_id. Here the postings are
    derived inline from the text (the index-build step), which is
    the one-time cost a real deployment amortizes. Ranking is
    partial top-k.
    """
    tok = T(spark, sf_dir, "documents").select(
        "doc_id", F.explode(F.split("text", " ")).alias("t"))
    hits = tok.filter(F.col("t").isin(*_QUERY_TERMS))
    return (
        hits.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct("t").alias("n_terms"),
        )
        .filter(F.col("n_terms") == 3)
        .orderBy(F.desc("n_occurrences"), "doc_id")
        .limit(50)
    )


# --------------------------------------------------------------------
# positional phrase search: adjacency join on (doc, pos+1)
# --------------------------------------------------------------------

_PHRASE = ("batch", "batch")

_PHRASE_ORACLE = f"""
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS words FROM documents
), tokpos AS (
  SELECT doc_id, unnest(range(1, len(words) + 1)) AS pos, words FROM w
), tok AS (
  SELECT doc_id, pos, words[pos] AS token FROM tokpos
), a AS (
  SELECT doc_id, pos FROM tok WHERE token = '{_PHRASE[0]}'
), b AS (
  SELECT doc_id, pos FROM tok WHERE token = '{_PHRASE[1]}'
)
SELECT a.doc_id, CAST(count(*) AS BIGINT) AS n_matches
FROM a JOIN b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
GROUP BY a.doc_id
ORDER BY n_matches DESC, a.doc_id
LIMIT 50
"""


@register("search_phrase_positional", oracle=_PHRASE_ORACLE, bench=True,
          doc="positional phrase search: occurrences of the exact "
              "bigram 'batch batch' via a (doc, pos+1) adjacency join")
def search_phrase_positional(spark, sf_dir):
    """Exact-phrase matching the positional-index way: token
    positions for each phrase term, joined on (doc, pos + offset).
    Generalizes to any phrase length by chaining offsets, and to
    NEAR/k proximity by widening the position predicate to a band —
    none of which a LIKE scan can index.

    Scale shape: both sides of the adjacency join are pre-filtered
    to the phrase's terms (partition-pruned posting reads on a real
    positional index), and the join key (doc, position) is exact, so
    candidate pairs are bounded by term frequency, never document
    length. posexplode keeps positions JVM-side; 1-based to match
    the oracle's array indexing.
    """
    tok = T(spark, sf_dir, "documents").select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos0", "token")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "token")
    a = tok.filter(F.col("token") == _PHRASE[0]).select(
        F.col("doc_id").alias("ad"), "pos")
    b = tok.filter(F.col("token") == _PHRASE[1]).select(
        F.col("doc_id").alias("bd"), F.col("pos").alias("bpos"))
    return (
        a.join(b, (F.col("ad") == F.col("bd"))
               & (F.col("bpos") == F.col("pos") + 1))
        .select(F.col("ad").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_matches"))
        .orderBy(F.desc("n_matches"), "doc_id")
        .limit(50)
    )


# --------------------------------------------------------------------
# BM25 ranking for the 3-term query
# --------------------------------------------------------------------

# Determinism recipe (established by text_unigram_logprob): the single
# transcendental (idf's ln) is evaluated once per query TERM on an
# exact integer ratio and floored to 1e6 fixed point; each (doc, term)
# contribution is then floored to an integer BEFORE the per-doc sum,
# so the 3-addend accumulation is exact integer addition — float
# summation order can never flip the ranking hash.
_BM25_ORACLE = f"""
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS words FROM documents
), dl AS (
  SELECT doc_id, CAST(len(words) AS BIGINT) AS dl FROM w
), stats AS (
  SELECT CAST(count(*) AS BIGINT) AS nd, CAST(sum(len(words)) AS BIGINT) AS tot
  FROM w
), tok AS (
  SELECT doc_id, unnest(words) AS t FROM w
), hits AS (
  SELECT doc_id, t, CAST(count(*) AS BIGINT) AS tf FROM tok
  WHERE t IN ('{_QUERY_TERMS[0]}', '{_QUERY_TERMS[1]}', '{_QUERY_TERMS[2]}')
  GROUP BY doc_id, t
), dfq AS (
  SELECT t, CAST(count(*) AS BIGINT) AS df FROM hits GROUP BY t
), idf AS (
  SELECT t, CAST(floor(ln((nd - df + 0.5::DOUBLE) / (df + 0.5::DOUBLE))
                       * 1000000.0::DOUBLE) AS BIGINT) AS idf6
  FROM dfq, stats
), contrib AS (
  SELECT h.doc_id,
         CAST(floor((i.idf6 * h.tf * 2.2::DOUBLE)
                    / (h.tf + 1.2::DOUBLE * (0.25::DOUBLE + 0.75::DOUBLE * d.dl
                                     / (s.tot * 1.0::DOUBLE / s.nd)))) AS BIGINT)
           AS c6
  FROM hits h
  JOIN idf i ON h.t = i.t
  JOIN dl d ON h.doc_id = d.doc_id, stats s
)
SELECT c.doc_id, d.dl, CAST(sum(c.c6) AS BIGINT) AS bm25_6
FROM contrib c JOIN dl d ON c.doc_id = d.doc_id
GROUP BY c.doc_id, d.dl
ORDER BY bm25_6 DESC, c.doc_id
LIMIT 25
"""


@register("search_bm25_ranked", oracle=_BM25_ORACLE, bench=True,
          doc="BM25 (k1=1.2, b=0.75) ranking of the 3-term query with "
              "per-term fixed-point idf and integer-summed "
              "contributions")
def search_bm25_ranked(spark, sf_dir):
    """Top-25 documents for the query by BM25 — the retrieval scoring
    function production search engines default to, combining term
    rarity (idf), within-doc saturation (k1), and length
    normalization (b). Completes the search family: boolean
    retrieval (conjunctive), phrase constraint (positional), ranked
    scoring (this).

    Scale shape: ONE corpus shuffle — a single conditional
    aggregation yields each doc's length and every query-term tf,
    and all marginals (N, total length, dfs, idfs) collapse into a
    1-row broadcast, so scoring is a scalar expression over the
    per-doc relation. The
    idf ln evaluates on |query| exact ratios only (floored 1e6 fixed
    point, libm parity verified at all 3 SFs per the repo's ln rule);
    per-(doc, term) contributions floor to integers before summing so
    accumulation order is irrelevant.
    """
    tok = T(spark, sf_dir, "documents").select(
        "doc_id", F.explode(F.split("text", " ")).alias("t"))
    # ONE shuffle: per-doc length and all query-term tfs from the same
    # conditional aggregation (dl = token count, tf_i = term count)
    aggs = [F.count(F.lit(1)).alias("dl")] + [
        F.count(F.when(F.col("t") == term, 1)).alias(f"tf{i}")
        for i, term in enumerate(_QUERY_TERMS)
    ]
    perdoc = tok.groupBy("doc_id").agg(*aggs)
    # corpus stats + per-term dfs collapse into a single 1-row
    # broadcast relation; idf6 becomes three scalar columns
    marg = perdoc.agg(
        F.count(F.lit(1)).alias("nd"), F.sum("dl").alias("tot"),
        *[F.count(F.when(F.col(f"tf{i}") > 0, 1)).alias(f"df{i}")
          for i in range(len(_QUERY_TERMS))],
    ).select(
        "nd", "tot",
        *[F.expr(f"CAST(floor(ln((nd - df{i} + 0.5D) / (df{i} + 0.5D)) "
                 f"* 1000000.0D) AS BIGINT)").alias(f"idf6_{i}")
          for i in range(len(_QUERY_TERMS))],
    )
    c6 = " + ".join(
        f"(CASE WHEN tf{i} > 0 THEN CAST(floor((idf6_{i} * tf{i} * 2.2D) / "
        f"(tf{i} + 1.2D * (0.25D + 0.75D * dl / (tot * 1.0D / nd)))) "
        f"AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
        for i in range(len(_QUERY_TERMS))
    )
    return (
        perdoc.crossJoin(F.broadcast(marg))
        .filter(sum(F.col(f"tf{i}") for i in range(len(_QUERY_TERMS))) > 0)
        .select("doc_id", F.col("dl").cast("long").alias("dl"),
                F.expr(c6).alias("bm25_6"))
        .orderBy(F.desc("bm25_6"), "doc_id")
        .limit(25)
    )
