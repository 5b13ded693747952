"""Connected components / dedup clusters (ext/graph.py)."""

from __future__ import annotations

from data_lakehouse_project_spark.ext.graph import (
    connected_components,
    dedup_clusters,
)


def test_transitive_chain(spark):
    """a-b, b-c, c-d → one component labeled by the min id."""
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "id_a long, id_b long"
    )
    got = {r.node: r.cluster_id for r in connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_long_chain_converges(spark):
    """A 12-node path graph needs ~diameter rounds — exercises the
    iteration/checkpoint loop, not just one-hop propagation."""
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "id_a long, id_b long"
    )
    got = {r.node: r.cluster_id for r in connected_components(edges).collect()}
    assert set(got.values()) == {0}
    assert len(got) == 13


def test_dedup_clusters_includes_singletons(spark):
    all_ids = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
    pairs = spark.createDataFrame([(0, 3), (3, 5)], "id_a long, id_b long")
    got = {r.doc_id: r.cluster_id for r in dedup_clusters(all_ids, pairs, "doc_id").collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 0, 4: 4, 5: 0}
