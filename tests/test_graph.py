"""Connected components: transitivity, chains, and singleton pairs."""

from __future__ import annotations

from wire_spark.operators.graph import connected_components


def test_components_chain_and_islands(spark):
    # chain 1-2-3 (transitive), island 5-6, cycle 8-9-1 merging into
    # the first component through vertex 1
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6), (8, 9), (9, 1)], ["src", "dst"]
    )
    got = {r.id: r.comp for r in connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 8: 1, 9: 1, 5: 5, 6: 5}


def test_components_converges_on_long_chain(spark):
    # a 12-vertex path needs multiple propagation rounds
    edges = spark.createDataFrame([(i, i + 1) for i in range(12)], ["src", "dst"])
    got = {r.id: r.comp for r in connected_components(edges).collect()}
    assert got == {i: 0 for i in range(13)}


def test_components_reliable_checkpoint_path(spark, tmp_path):
    """checkpoint_dir engages reliable df.checkpoint() (cluster-safe
    lineage truncation) and must produce the identical labeling."""
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 20)], ["src", "dst"]
    )
    local = {r.id: r.comp for r in connected_components(edges).collect()}
    reliable = {
        r.id: r.comp
        for r in connected_components(
            edges, checkpoint_dir=str(tmp_path / "ckpt")
        ).collect()
    }
    assert reliable == local == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20}
    # reliable checkpoint data actually landed in the directory
    import glob, os
    assert glob.glob(os.path.join(str(tmp_path / "ckpt"), "**"), recursive=True)
