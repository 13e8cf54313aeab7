"""Information-theoretic text quality: per-document token entropy.

Completes the quality-scorer family (text.py ratios, text2.py
TF-IDF/logprob/repetition): Shannon entropy of the within-document
token distribution is the classic gibberish-vs-boilerplate axis —
low entropy = repeated boilerplate, abnormally high = random noise.

Cross-engine: H = ln(n) - (1/n)*sum(c*ln c) — each distinct token's
``c*ln(c)`` addend is floored into integer micro-units BEFORE the
(order-free) sum, per NOTES.md rule 1/6; one deterministic division
chain at the end, floor-truncated to 4dp.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from wire_spark.catalog import register
from wire_spark.queries._util import T

_ENTROPY_ORACLE = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token
  FROM documents
), tok2 AS (SELECT doc_id, token FROM tok WHERE token != ''),
pt AS (SELECT doc_id, token, count(*) AS c FROM tok2 GROUP BY 1, 2),
pd AS (
  SELECT doc_id, sum(c) AS n,
         sum(CAST(floor(c * ln(c) * 1000000.0) AS BIGINT)) AS clnc6
  FROM pt GROUP BY doc_id
)
SELECT doc_id, n AS n_tokens,
       floor((ln(n) - clnc6 / 1000000.0 / n) * 10000.0) / 10000.0 AS entropy
FROM pd ORDER BY entropy ASC, doc_id LIMIT 30
"""


@register("text_token_entropy", oracle=_ENTROPY_ORACLE,
          doc="Shannon entropy of each document's token distribution — "
              "30 lowest-entropy (most boilerplate) documents")
def text_token_entropy(spark, sf_dir):
    """Within-document Shannon entropy over tokens, via the
    sum-free-of-order identity H = ln(n) - (1/n) * sum(c * ln c):
    the per-token-type addend c*ln(c) is floored in integer
    micro-units so the fold is exact in any order, and ln appears
    only on exact integers (identical doubles in both engines).

    Scale shape: one shuffle on (doc_id, token) with map-side
    combine, one rollup on doc_id (reuses the partitioning prefix),
    top-30 via TakeOrdered. Text never shuffles — only (id, token,
    count) triples."""
    pt = (
        T(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.explode(F.split(F.lower(F.col("text")), " ")).alias("token"),
        )
        .filter(F.col("token") != "")
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    pd = pt.groupBy("doc_id").agg(
        F.sum("c").alias("n"),
        F.sum(
            F.floor(F.col("c") * F.log(F.col("c")) * F.lit(1000000.0)).cast("long")
        ).alias("clnc6"),
    )
    ent = F.floor(
        (F.log(F.col("n")) - F.col("clnc6") / F.lit(1000000.0) / F.col("n"))
        * F.lit(10000.0)
    ) / F.lit(10000.0)
    return (
        pd.select("doc_id", F.col("n").alias("n_tokens"), ent.alias("entropy"))
        .orderBy(F.asc("entropy"), F.asc("doc_id"))
        .limit(30)
    )
