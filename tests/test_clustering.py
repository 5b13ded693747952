"""Distributed k-means + SemDeDup pruning (ext/clustering.py):
determinism, convergence, and pruning semantics."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from data_lakehouse_project_spark.ext import clustering
from data_lakehouse_project_spark.ext.similarity import _as_double


@pytest.fixture(scope="module")
def emb(testdata):
    return testdata["embeddings"]


def test_kmeans_deterministic_and_partition_independent(emb):
    c1 = clustering.kmeans_fit(emb, "embedding", "vec_id", k=4, iters=4)
    c2 = clustering.kmeans_fit(
        emb.repartition(7), "embedding", "vec_id", k=4, iters=4
    )
    assert c1.shape == (4, 64)
    assert np.allclose(c1, c2)


def test_kmeans_reduces_inertia(emb, spark):
    def inertia(centroids):
        dists = [
            clustering._sq_dist(_as_double(F.col("embedding")), c)
            for c in centroids
        ]
        best = dists[0]
        for d in dists[1:]:
            best = F.least(best, d)
        return emb.agg(F.sum(best)).first()[0]

    c0 = clustering.kmeans_fit(emb, "embedding", "vec_id", k=4, iters=0)
    c5 = clustering.kmeans_fit(emb, "embedding", "vec_id", k=4, iters=5)
    assert inertia(c5) <= inertia(c0) + 1e-9


def test_semantic_dedup_prune_drops_exact_vector_dups(spark):
    base = [
        [1.0, 0.0, 0.0, 0.0],
        [0.0, 1.0, 0.0, 0.0],
        [0.0, 0.0, 1.0, 0.0],
        [0.0, 0.0, 0.0, 1.0],
    ]
    rows = []
    for i, v in enumerate(base):
        rows.append((i * 10, v))        # originals: ids 0, 10, 20, 30
        rows.append((i * 10 + 1, v))    # exact dup of each, higher id
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    kept = clustering.semantic_dedup_prune(
        df, "embedding", "vec_id", threshold=0.99, k=4, iters=3
    )
    ids = {r.vec_id for r in kept.collect()}
    assert ids == {0, 10, 20, 30}  # smallest id of each dup pair survives
    assert set(kept.columns) == {"vec_id", "embedding"}


def test_semantic_dedup_prune_no_surviving_incluster_pair(emb):
    cents = clustering.kmeans_fit(emb, "embedding", "vec_id", k=6, iters=4)
    kept = clustering.semantic_dedup_prune(
        emb, "embedding", "vec_id", threshold=0.9, k=6, centroids=cents
    )
    assert 0 < kept.count() <= emb.count()
    # invariant: within any cluster, no surviving pair at/above threshold
    from data_lakehouse_project_spark.ext.similarity import cosine

    cl = clustering.assign_clusters(kept, "embedding", cents)
    a = cl.select("cluster", F.col("vec_id").alias("ia"),
                  _as_double(F.col("embedding")).alias("va"))
    b = cl.select("cluster", F.col("vec_id").alias("ib"),
                  _as_double(F.col("embedding")).alias("vb"))
    bad = (
        a.join(b, "cluster")
        .where(F.col("ia") < F.col("ib"))
        .where(cosine(F.col("va"), F.col("vb")) >= 0.9)
        .count()
    )
    assert bad == 0
