"""MinHash-LSH text index at rest: build once into parquet, probe
new batches from storage — the text-dedup sibling of
``vector_index.py``.

The catalog queries (``dedup_minhash_lsh``, ``dedup_incremental_lsh``)
compute signatures inline per run — right for the oracle gate, but a
production corpus signs each document ONCE and amortizes the index
over every future ingest batch.  This module materializes three
relations:

- ``bands/``     (doc_id, band, bsig)  partitioned by ``pb`` =
                 hash(band, bsig) % 64 — a probe batch reads only the
                 band-buckets its own signatures land in
- ``shingles/``  (doc_id, shingle)     partitioned by ``db`` =
                 doc_id % 64 — the exact-verify step reads only the
                 candidate docs' buckets
- ``sizes/``     (doc_id, n)           doc-grain, tiny per row

Probe = sign the new batch (same arithmetic as the catalog queries:
one md5 per shingle, 24 Carter-Wegman permutations, 6 bands of 4),
join the stored bands on (band, bsig) — with the touched ``pb``
partitions pushed as an IN-literal so the scan is PARTITION-PRUNED,
not just filtered — then exact-verify Jaccard on candidates only,
reading only the touched ``db`` shingle buckets.

The driver-side ``collect()`` of touched bucket ids is bounded by
construction (<= 64 values each — the ``upsert.py`` touched-bucket
discipline), never by corpus or batch size.  At 100 TB raise the
bucket counts with the corpus; the probe cost stays proportional to
the BATCH (signatures) plus the touched buckets (candidate grain),
never the indexed corpus.

Append = the same builder in append mode: signatures are per-doc
(never global state), so incrementally indexed corpora are
bit-identical to a from-scratch build — asserted in
tests/test_text_index.py.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wire_spark.queries._util import t4, word_shingles

_N_BUCKETS = 64  # hive partitions per relation; scale with corpus


def _doc_shingles(docs: DataFrame) -> DataFrame:
    return docs.select(
        "doc_id", F.explode(word_shingles("text", 3)).alias("shingle")
    )


def _band_signatures(docs: DataFrame) -> DataFrame:
    """(doc_id, band, bsig) — DELEGATES to the catalog's
    ``minhash_band_signatures`` (queries/dedup.py), the single home
    of the MinHash arithmetic: stored signatures and freshly-signed
    probes must agree bit-for-bit, so the index must never carry its
    own copy that could drift (r9 review finding)."""
    from wire_spark.queries.dedup import minhash_band_signatures

    return minhash_band_signatures(_doc_shingles(docs))


def _pb(band, bsig):
    # deterministic bucket of a band signature: the same md5-derived
    # integer arithmetic as every other hash in the repo, so probe
    # and build can never disagree on a bucket
    return (
        F.conv(
            F.substring(F.md5(F.concat_ws(":", band.cast("string"), bsig)), 1, 15),
            16, 10,
        ).cast("long") % _N_BUCKETS
    )


def build_minhash_index(docs: DataFrame, path: str, mode: str = "overwrite") -> dict:
    """Materialize (or, with ``mode='append'``, extend) the index for
    a (doc_id, text) frame.  Signatures are per-document — no global
    state — so appended batches compose bit-identically with a
    from-scratch build over the union.  Returns the stored index's
    total band/doc row counts after this write (metadata-only scans
    of the just-written parquet)."""
    bands = _band_signatures(docs).withColumn("pb", _pb(F.col("band"), F.col("bsig")))
    sh = _doc_shingles(docs).withColumn("db", F.col("doc_id") % _N_BUCKETS)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    (
        bands.repartition("pb")
        .write.mode(mode).partitionBy("pb").parquet(os.path.join(path, "bands"))
    )
    (
        sh.repartition("db")
        .write.mode(mode).partitionBy("db").parquet(os.path.join(path, "shingles"))
    )
    sizes.write.mode(mode).parquet(os.path.join(path, "sizes"))
    # stats from the JUST-WRITTEN parquet (footer-metadata counts) —
    # counting the lazy frames would re-run the whole signing
    # pipeline twice more (r9 review finding)
    spark = docs.sparkSession
    return {
        "bands": spark.read.parquet(os.path.join(path, "bands")).count(),
        "docs": spark.read.parquet(os.path.join(path, "sizes")).count(),
    }


def probe_minhash_index(
    spark: SparkSession,
    path: str,
    new_docs: DataFrame,
    threshold: float = 0.8,
) -> DataFrame:
    """Near-dup pairs (index_doc_id, new_doc_id, jaccard) between the
    STORED corpus and a new (doc_id, text) batch.

    Candidate generation touches only the ``pb`` partitions the
    batch's own signatures hash into, and exact verification touches
    only the ``db`` partitions of candidate docs — both pushed as
    IN-literals so the scans are partition-pruned (plan-asserted in
    tests/test_text_index.py).  Recall is the LSH band guarantee
    (identical docs share every band, so exact duplicates are always
    candidates); precision is 1.0 by exact Jaccard verification."""
    nb = _band_signatures(new_docs).withColumn(
        "pb", _pb(F.col("band"), F.col("bsig"))
    )
    # the touched-bucket collects below EXECUTE the batch-side
    # signing, and the final plan re-derives it lazily — deliberate:
    # re-signing a bounded batch is cheaper than a checkpoint, and it
    # keeps the whole probe (including both partition-pruned stored
    # scans) in ONE inspectable plan (tests assert PartitionFilters)
    touched_pb = sorted({r.pb for r in nb.select("pb").distinct().collect()})
    bands = spark.read.parquet(os.path.join(path, "bands")).filter(
        F.col("pb").isin(touched_pb)
    )
    cand = (
        bands.alias("i")
        .join(
            nb.alias("q"),
            (F.col("i.pb") == F.col("q.pb"))
            & (F.col("i.band") == F.col("q.band"))
            & (F.col("i.bsig") == F.col("q.bsig")),
        )
        .select(
            F.col("i.doc_id").alias("d1"), F.col("q.doc_id").alias("d2")
        )
        .distinct()
        .withColumn("db", F.col("d1") % _N_BUCKETS)
    )
    touched_db = sorted({r.db for r in cand.select("db").distinct().collect()})
    if not touched_db:
        return cand.select(
            "d1", "d2", F.lit(0.0).alias("jaccard")
        ).limit(0)
    ish = spark.read.parquet(os.path.join(path, "shingles")).filter(
        F.col("db").isin(touched_db)
    )
    isz = spark.read.parquet(os.path.join(path, "sizes"))
    qsh = _doc_shingles(new_docs)
    qsz = qsh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    inter = (
        cand.join(ish.select(F.col("doc_id").alias("d1"), "shingle"), "d1")
        .join(qsh.select(F.col("doc_id").alias("d2"), "shingle"), ["d2", "shingle"])
        .groupBy("d1", "d2")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    jac = F.col("i") * F.lit(1.0) / (F.col("n1") + F.col("n2") - F.col("i"))
    return (
        inter.join(isz.select(F.col("doc_id").alias("d1"), F.col("n").alias("n1")), "d1")
        .join(F.broadcast(qsz.select(F.col("doc_id").alias("d2"), F.col("n").alias("n2"))), "d2")
        .filter(jac >= threshold)
        .select("d1", "d2", t4(jac).alias("jaccard"))
    )
