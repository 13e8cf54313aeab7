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
