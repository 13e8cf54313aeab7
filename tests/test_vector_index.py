"""IVF-PQ index at rest: build -> parquet tables -> search matches
the inline catalog query bit-for-bit, and the codes read is
partition-pruned to the probed cells."""

from __future__ import annotations

from pyspark.sql import functions as F

from wire_spark.engine import load_table
from wire_spark.operators.vector_index import build_index, search_index


def test_stored_index_search_matches_inline_query(spark, tmp_path):
    sf_dir = "/root/testdata/sf0.001"
    idx = str(tmp_path / "ivfpq")
    emb = load_table(spark, sf_dir, "embeddings")
    stats = build_index(emb, idx)
    assert stats["cells"] == emb.count()
    assert stats["codes"] == stats["cells"] * 8  # one code per subspace

    queries = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    got = search_index(spark, idx, queries, k=5, nprobe=2).collect()

    # the inline catalog query computes the identical index per call
    from wire_spark.catalog import load_registry

    want = load_registry()["ann_ivfpq_adc"].fn(spark, sf_dir).collect()
    as_t = lambda rows: [(r.qid, r.nid, r.adist, r.rn) for r in rows]  # noqa: E731
    assert as_t(got) == as_t(want)


def test_stored_index_codes_read_is_cell_pruned(spark, tmp_path):
    """The codes relation is laid out partitionBy(cid); the search
    plan's codes scan must carry a partition filter / pruned
    partition count, not a full-table read."""
    sf_dir = "/root/testdata/sf0.001"
    idx = str(tmp_path / "ivfpq2")
    emb = load_table(spark, sf_dir, "embeddings")
    build_index(emb, idx)
    queries = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    df = search_index(spark, idx, queries, k=5, nprobe=2)
    df.collect()
    from wire_spark.plans import formatted_plan

    plan = formatted_plan(df)
    # the cid equi-join against the partitionBy(cid) layout must allow
    # partition pruning: the scan exposes cid as a partition column
    assert "PartitionFilters" in plan or "dynamicpruning" in plan.lower()
