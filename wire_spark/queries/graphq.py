"""Graph analytics over the document near-dup graph: fixed-iteration
PageRank centrality.

Connected components (dedup.py / operators/graph.py) answers "which
docs form one dup cluster"; PageRank answers "which docs are the
HUBS of near-duplication" — the canonical pick-one-survivor signal
(keep the most central copy, drop satellites) and a second
demonstration of iterative graph compute on Spark beyond label
propagation.

Cross-engine exactness: ranks live in BIGINT fixed-point (scale
1e12). Every step is integer arithmetic — contribution is
``rank div degree`` (truncating division, identical in Spark ``div``
and DuckDB ``//`` for non-negative values), damping is
``(85 * sum) div 100``, teleport is ``(SCALE*15/100) div N`` — so
three chained iterations produce bit-identical BIGINTs in both
engines with no float in sight.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from wire_spark.catalog import register
from wire_spark.queries.dedup import _SHINGLES_CTE, _jaccard_pairs

_SCALE = 1_000_000_000_000  # 1e12 fixed-point rank units
_TELEPORT = _SCALE * 15 // 100  # exact: 150_000_000_000

_PAGERANK_ORACLE = _SHINGLES_CTE + f"""
, inter AS (
  SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS i
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), pairs AS (
  SELECT d1, d2 FROM inter
  JOIN sizes s1 ON d1 = s1.doc_id
  JOIN sizes s2 ON d2 = s2.doc_id
  WHERE i * 1.0 / (s1.n + s2.n - i) >= 0.8
), ed AS (
  SELECT d1 AS a, d2 AS b FROM pairs
  UNION ALL
  SELECT d2, d1 FROM pairs
), deg AS (
  SELECT a AS node, count(*) AS d FROM ed GROUP BY 1
), nn AS (SELECT count(*) AS n FROM deg),
r0 AS (
  SELECT node, d, CAST({_SCALE} AS BIGINT) // nn.n AS r FROM deg, nn
),
i1 AS (
  SELECT e.b AS node,
         CAST({_TELEPORT} AS BIGINT) // nn.n
           + (85 * sum(p.r // p.d)) // 100 AS r
  FROM ed e JOIN r0 p ON e.a = p.node, nn
  GROUP BY e.b, nn.n
), i1d AS (
  SELECT i1.node, deg.d, i1.r FROM i1 JOIN deg ON i1.node = deg.node
),
i2 AS (
  SELECT e.b AS node,
         CAST({_TELEPORT} AS BIGINT) // nn.n
           + (85 * sum(p.r // p.d)) // 100 AS r
  FROM ed e JOIN i1d p ON e.a = p.node, nn
  GROUP BY e.b, nn.n
), i2d AS (
  SELECT i2.node, deg.d, i2.r FROM i2 JOIN deg ON i2.node = deg.node
),
i3 AS (
  SELECT e.b AS node,
         CAST({_TELEPORT} AS BIGINT) // nn.n
           + (85 * sum(p.r // p.d)) // 100 AS r
  FROM ed e JOIN i2d p ON e.a = p.node, nn
  GROUP BY e.b, nn.n
)
SELECT i3.node AS doc_id, deg.d AS degree, CAST(i3.r AS BIGINT) AS pr_fixed
FROM i3 JOIN deg ON i3.node = deg.node
ORDER BY pr_fixed DESC, doc_id
LIMIT 50
"""


@register("graph_pagerank_neardup", oracle=_PAGERANK_ORACLE, bench=True,
          doc="3-iteration integer-exact PageRank over the >=0.8 "
              "Jaccard near-dup graph: 50 most central documents")
def graph_pagerank_neardup(spark, sf_dir):
    """PageRank (damping 0.85, 3 fixed iterations) over the
    undirected near-dup graph, ranks in 1e12 fixed-point BIGINTs so
    the oracle matches bit-for-bit.

    Scale shape: edge building is the capped-Jaccard join (cost
    bounded by the stop-shingle cap — see ``_jaccard_pairs``; at
    100 TB swap in the LSH edge set exactly as
    ``dedup_components_lsh`` does, the iteration code is edge-source
    agnostic). Each iteration is one shuffle on the node key of a
    node-sized rank table joined to the edge list — the classic
    Pregel-as-DataFrame step; 3 iterations = 3 bounded shuffles,
    never a corpus-sized pass. Every node of the undirected graph
    has degree >= 1, so there are no dangling-mass corrections to
    fold in."""
    from wire_spark.operators.graph import pagerank_fixed

    pairs = _jaccard_pairs(spark, sf_dir, 0.8).select("d1", "d2")
    edges = pairs.union(
        pairs.select(F.col("d2").alias("d1"), F.col("d1").alias("d2"))
    ).select(F.col("d1").alias("src"), F.col("d2").alias("dst"))
    ranks = pagerank_fixed(edges, iterations=3)
    return (
        ranks.select(
            F.col("node").alias("doc_id"),
            F.col("d").alias("degree"),
            F.col("r").alias("pr_fixed"),
        )
        .orderBy(F.desc("pr_fixed"), "doc_id")
        .limit(50)
    )
