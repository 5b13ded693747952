"""Connected components / dedup clusters (ext/graph.py)."""

from __future__ import annotations

from data_lakehouse_project_spark.ext.graph import (
    canonical_representatives,
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


def test_canonical_representatives_keeps_best_per_cluster(spark):
    """One survivor per cluster: max quality wins; ties -> smallest id;
    singletons survive as themselves."""
    clusters = spark.createDataFrame(
        [(0, 0), (3, 0), (5, 0), (1, 1), (2, 2), (4, 2)],
        "doc_id long, cluster_id long",
    )
    scores = spark.createDataFrame(
        [(0, 0.5), (3, 0.9), (5, 0.9), (1, 0.2), (2, 0.7), (4, 0.7)],
        "doc_id long, quality_score double",
    )
    rows = {
        r.cluster_id: r
        for r in canonical_representatives(clusters, scores).collect()
    }
    assert set(rows) == {0, 1, 2}
    # cluster 0: 3 and 5 tie at 0.9 -> smallest id (3) survives
    assert rows[0].keep_id == 3 and rows[0].cluster_size == 3
    assert rows[0].best_quality == 0.9
    # singleton survives as itself
    assert rows[1].keep_id == 1 and rows[1].cluster_size == 1
    # cluster 2: tie at 0.7 -> id 2
    assert rows[2].keep_id == 2 and rows[2].cluster_size == 2


def test_pagerank_star_hub_and_numpy_parity(spark):
    """Undirected 4-star: hub collects 3 spokes' full mass. Checked
    against a dense numpy power iteration with the same GraphX-style
    update — any drift in join/aggregate wiring shows up here."""
    import numpy as np

    from data_lakehouse_project_spark.ext.graph import pagerank

    edges = [(0, 1), (0, 2), (0, 3)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {
        r.node: r.rank
        for r in pagerank(df, iterations=5, round_to=9).collect()
    }

    # dense reference: A[dst, src] = 1/outdeg(src), undirected
    und = edges + [(b, a) for a, b in edges]
    outdeg = {0: 3, 1: 1, 2: 1, 3: 1}
    A = np.zeros((4, 4))
    for s, d in und:
        A[d, s] = 1.0 / outdeg[s]
    r = np.ones(4)
    for _ in range(5):
        r = (1 - 0.85) + 0.85 * (A @ r)
    for n in range(4):
        assert abs(got[n] - r[n]) < 1e-9, (n, got[n], r[n])
    assert got[0] > got[1] == got[2] == got[3]


def test_pagerank_directed_dangling_decay(spark):
    """Directed chain 1->2->3: node 3 is dangling (GraphX semantics:
    its mass leaves the system, ranks need not sum to N)."""
    from data_lakehouse_project_spark.ext.graph import pagerank

    df = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
    got = {
        r.node: r.rank
        for r in pagerank(
            df, iterations=10, undirected=False, round_to=9
        ).collect()
    }
    # source node keeps only the teleport share
    assert abs(got[1] - 0.15) < 1e-9
    # downstream accumulates: 2 gets 0.15 + 0.85*rank1, 3 even more lag
    assert got[1] < got[2] < got[3]
    assert sum(got.values()) < 3.0  # dangling decay


def test_triangle_stats_hand_computed(spark):
    """4-clique {0,1,2,3} (every node: 3 triangles, coeff 1.0) glued by
    a bridge to a path 3-4-5 (no triangles; 4 has degree 2, coeff 0);
    edge orientation in the input must not matter."""
    from pyspark.sql import functions as F

    from data_lakehouse_project_spark.ext.graph import triangle_stats

    edges = [(0, 1), (2, 0), (0, 3), (1, 2), (3, 1), (2, 3), (3, 4), (5, 4)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    out = {r.node: r for r in triangle_stats(df).collect()}

    for n in (0, 1, 2):
        assert out[n].n_triangles == 3
        assert out[n].degree == 3
        assert out[n].clustering_coeff == 1.0
    # node 3 is in the clique's 3 triangles plus the bridge to 4
    assert out[3].degree == 4
    assert out[3].n_triangles == 3
    assert abs(out[3].clustering_coeff - 0.5) < 1e-9  # 2*3/(4*3)
    assert out[4].n_triangles == 0 and out[4].clustering_coeff == 0.0
    assert out[5].degree == 1 and out[5].clustering_coeff == 0.0
    # total triangle incidences = 3 * number of triangles (4-clique: 4)
    assert sum(r.n_triangles for r in out.values()) == 3 * 4


def test_label_propagation_planted_communities(spark):
    from data_lakehouse_project_spark.ext.graph import label_propagation

    # two 4-cliques bridged by a single edge: LPA must keep them as two
    # communities (the bridge is outvoted by clique neighbors)
    c1 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    c2 = [(a, b) for a in range(10, 14) for b in range(a + 1, 14)]
    edges = c1 + c2 + [(3, 10)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    labels = {r.node: r.label for r in label_propagation(df, iterations=6).collect()}
    assert len({labels[n] for n in range(4)}) == 1
    assert len({labels[n] for n in range(10, 14)}) == 1
    assert labels[0] != labels[10]


def test_label_propagation_deterministic(spark):
    from data_lakehouse_project_spark.ext.graph import label_propagation

    import random

    rng = random.Random(5)
    edges = [(rng.randrange(60), rng.randrange(60)) for _ in range(120)]
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    r1 = sorted(map(tuple, label_propagation(df, iterations=4).collect()))
    r2 = sorted(
        map(tuple, label_propagation(df.repartition(7), iterations=4).collect())
    )
    assert r1 == r2  # partitioning-independent (synchronous + min-tie)


def test_pagerank_small_graph_fast_path_parity(spark):
    """small_graph: the driver-vectorized rounds must agree with the
    distributed loop at the output rounding (same GraphX update, same
    floor-round) on a graph with hubs, chains, and a dangling sink —
    and engage only under the bound."""
    import random

    from data_lakehouse_project_spark.ext.graph import pagerank

    rng = random.Random(7)
    edges = {(0, i) for i in range(1, 8)}            # hub
    edges |= {(i, i + 1) for i in range(8, 14)}      # chain
    edges |= {
        (rng.randrange(15), rng.randrange(15)) for _ in range(40)
    }
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, "id_a long, id_b long")

    dist = sorted(map(tuple, pagerank(df, iterations=5).collect()))
    fast = sorted(
        map(
            tuple,
            pagerank(df, iterations=5, small_graph=10**6).collect(),
        )
    )
    assert [n for n, _ in dist] == [n for n, _ in fast]
    for (n, a), (_, b) in zip(dist, fast):
        assert abs(a - b) <= 1e-6, (n, a, b)

    # directed + string ids through the fast path: input id type kept
    sdf = spark.createDataFrame(
        [("a", "b"), ("b", "c")], "id_a string, id_b string"
    )
    got = pagerank(
        sdf, iterations=10, undirected=False, small_graph=100
    )
    assert dict(got.dtypes)["node"] == "string"
    vals = {r.node: r.rank for r in got.collect()}
    assert abs(vals["a"] - 0.15) < 1e-9 and vals["a"] < vals["b"] < vals["c"]

    # bound not met -> distributed loop (same result, exercised above)
    tiny = pagerank(df, iterations=5, small_graph=1)
    assert sorted(map(tuple, tiny.collect())) == dist
