"""Search-engine primitives over the document corpus: inverted-index
conjunctive retrieval and positional phrase search.

Both are expressed the way a distributed index answers them — posting
lists as (term, doc) relations, positions as (doc, pos, token) — not
by scanning raw text with LIKE. That shape is what scales: the
posting relation is term-partitioned (only query-term postings are
touched), and phrase adjacency is an equi-join on (doc, pos+1).
"""

from __future__ import annotations

from pyspark.sql import Window as W
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
# Shared CTE chain for every BM25-based oracle (the repo rule: sibling
# oracles compose from one constant, never by string-slicing another).
_BM25_CTE = f"""
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
, scores AS (
  SELECT c.doc_id, d.dl, CAST(sum(c.c6) AS BIGINT) AS bm25_6
  FROM contrib c JOIN dl d ON c.doc_id = d.doc_id
  GROUP BY c.doc_id, d.dl
)"""

_BM25_ORACLE = _BM25_CTE + """
SELECT doc_id, dl, bm25_6
FROM scores
ORDER BY bm25_6 DESC, doc_id
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
    return (
        _bm25_relation(spark, sf_dir)
        .orderBy(F.desc("bm25_6"), "doc_id")
        .limit(25)
    )


def _bm25_relation(spark, sf_dir):
    """(doc_id, dl, bm25_6) for every doc matching >=1 query term —
    the unlimited relation behind search_bm25_ranked, shared with the
    hybrid-fusion query so the two can never drift."""
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
    )


# --------------------------------------------------------------------
# hybrid retrieval: reciprocal-rank fusion of BM25 and embedding cosine
# --------------------------------------------------------------------

# The production RAG retrieval stack in one query: the lexical ranking
# (BM25 over the 3-term query) and the semantic ranking (cosine of
# every embedding against the query vector, vec_id 0) each produce a
# top-50 list, fused by Reciprocal Rank Fusion —
#   rrf = sum over lists of 1/(60 + rank)
# — the standard parameter-free fusion (Cormack et al.), which needs
# only RANKS, so the two scoring scales never have to be calibrated
# against each other.  Contributions are exact integers
# (1000000 // (60 + rank)); documents absent from a list contribute 0
# through the full outer join's coalesce.
_HYBRID_ORACLE = _BM25_CTE + """
, lex0 AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY bm25_6 DESC, doc_id) AS r
  FROM scores
), lex AS (SELECT doc_id, r FROM lex0 WHERE r <= 50),
e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
      WHERE list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) > 0.0
        AND list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) < 1.0e12),
qv AS (SELECT v FROM e WHERE vec_id = 0),
sims AS (
  SELECT e.vec_id AS doc_id,
         CAST(floor(list_dot_product(e.v, qv.v)
              / (sqrt(list_dot_product(e.v, e.v))
                 * sqrt(list_dot_product(qv.v, qv.v)))
              * 1000000.0::DOUBLE) AS BIGINT) AS sim6
  FROM e, qv
), sem0 AS (
  SELECT doc_id, row_number() OVER (ORDER BY sim6 DESC, doc_id) AS r
  FROM sims
), sem AS (SELECT doc_id, r FROM sem0 WHERE r <= 50),
fused AS (
  SELECT COALESCE(l.doc_id, s.doc_id) AS doc_id,
         CAST(COALESCE(l.r, 0) AS BIGINT) AS rank_lex,
         CAST(COALESCE(s.r, 0) AS BIGINT) AS rank_sem,
         CAST(COALESCE(1000000 // (60 + l.r), 0)
              + COALESCE(1000000 // (60 + s.r), 0) AS BIGINT) AS rrf_1e6
  FROM lex l FULL OUTER JOIN sem s ON l.doc_id = s.doc_id
)
SELECT doc_id, rank_lex, rank_sem, rrf_1e6
FROM fused
ORDER BY rrf_1e6 DESC, doc_id
LIMIT 20
"""


@register("search_hybrid_rrf", oracle=_HYBRID_ORACLE, bench=True,
          doc="hybrid retrieval: reciprocal-rank fusion (k=60) of the "
              "BM25 top-50 and the embedding-cosine top-50, exact "
              "integer rank arithmetic")
def search_hybrid_rrf(spark, sf_dir):
    """Hybrid lexical+semantic retrieval, fused by RRF: the BM25
    list catches exact-term matches embeddings blur, the cosine list
    catches paraphrases BM25 cannot see, and rank fusion combines
    them without calibrating the two incomparable score scales (only
    ranks enter; 1/(60+rank) in exact integer micro-units).  This is
    the retrieval shape RAG stacks deploy; docs on one list only
    still fuse via the outer join with a 0 contribution.

    Scale shape: the lexical side is the shared ``_bm25_relation``
    (one corpus shuffle); the semantic side is a projection against
    ONE broadcast query vector (no pairwise join — at 100 TB swap in
    the IVF probe from ann_ivf_cosine for the same top-50 contract);
    each list is a partial top-50, and fusion joins two 50-row
    relations.  Rank windows run over candidate lists, never the
    corpus."""
    lex = (
        _bm25_relation(spark, sf_dir)
        .withColumn(
            "r",
            F.row_number().over(
                W.orderBy(F.desc("bm25_6"), F.asc("doc_id"))
            ),
        )
        .filter(F.col("r") <= 50)
        .select("doc_id", F.col("r").alias("rank_lex"))
    )
    from wire_spark.queries.similarity import _dot, _vectors

    e = _vectors(spark, sf_dir)
    qv = e.filter(F.col("vec_id") == 0).select(
        F.col("v").alias("qv"), F.col("nrm").alias("qn")
    )
    sem = (
        e.crossJoin(F.broadcast(qv))
        .select(
            F.col("vec_id").alias("doc_id"),
            F.floor(
                _dot(F.col("v"), F.col("qv"))
                / (F.col("nrm") * F.col("qn"))
                * F.lit(1000000.0)
            ).cast("long").alias("sim6"),
        )
        .withColumn(
            "r",
            F.row_number().over(
                W.orderBy(F.desc("sim6"), F.asc("doc_id"))
            ),
        )
        .filter(F.col("r") <= 50)
        .select("doc_id", F.col("r").alias("rank_sem"))
    )
    return (
        lex.join(sem, "doc_id", "full_outer")
        .select(
            "doc_id",
            F.coalesce("rank_lex", F.lit(0)).alias("rank_lex"),
            F.coalesce("rank_sem", F.lit(0)).alias("rank_sem"),
            (
                F.coalesce(
                    F.expr("1000000 div (60 + rank_lex)"), F.lit(0)
                )
                + F.coalesce(
                    F.expr("1000000 div (60 + rank_sem)"), F.lit(0)
                )
            ).cast("long").alias("rrf_1e6"),
        )
        .orderBy(F.desc("rrf_1e6"), "doc_id")
        .limit(20)
    )
