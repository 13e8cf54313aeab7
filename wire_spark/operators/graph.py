"""Iterative graph operators: connected components via min-label
propagation.

Needed for FULL near-duplicate clustering: pairwise dup edges form
clusters only under transitive closure (a~b, b~c => {a,b,c}), which no
single join can compute. The algorithm is the standard distributed
label propagation: every vertex takes the min label among itself and
its neighbors until fixpoint — O(diameter) rounds, each one
shuffle-on-id.

Scale notes: per round: one join (edges x labels, shuffle on id) +
one min-aggregation. Lineage is truncated per round with
localCheckpoint (on a cluster: checkpoint to storage) or the plan
grows exponentially. Diameter of near-dup clusters is tiny (dup
clusters are cliques-ish), so 3-5 rounds suffice in practice;
large-diameter graphs want the large-star/small-star variant, same
primitive shapes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Return (id, comp) where comp = min vertex id reachable from id.

    ``edges`` is an undirected edge list (any orientation); isolated
    vertices absent from it are absent from the output.

    ``checkpoint_dir``: when set, per-round lineage truncation uses
    RELIABLE ``df.checkpoint()`` into that directory (survives executor
    loss — required on a real cluster); when None, ``localCheckpoint``
    (executor-local, fine for single-JVM runs, lost on executor death).
    """
    spark = edges.sparkSession
    if checkpoint_dir is not None:
        spark.sparkContext.setCheckpointDir(checkpoint_dir)

    def _persist_round(df: DataFrame) -> DataFrame:
        if checkpoint_dir is not None:
            return df.checkpoint(eager=True)
        return df.localCheckpoint(eager=True)

    sym = _persist_round(
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
    )
    labels = (
        sym.select(F.col("a").alias("id")).distinct().withColumn("comp", F.col("id"))
    )
    for _ in range(max_iter):
        neighbor_labels = (
            sym.join(labels, sym.b == labels.id)
            .select(F.col("a").alias("id"), F.col("comp"))
        )
        new_labels = _persist_round(  # truncate lineage per round
            labels.union(neighbor_labels)
            .groupBy("id")
            .agg(F.min("comp").alias("comp"))
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.comp") != F.col("o.comp"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels
