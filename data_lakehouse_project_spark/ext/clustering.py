"""Distributed embedding clustering + SemDeDup-style semantic pruning.

K-means here is the *bounding structure* for semantic dedup (SemDeDup,
Abbas et al. 2023: cluster the corpus, then look for near-duplicate
pairs only WITHIN a cluster): pair generation cost drops from |corpus|²
to Σ|cluster|², the same Σ|bucket|² envelope as every other dedup family
in this engine — but driven by learned structure instead of random
hyperplanes, which concentrates true duplicates into the same bucket far
better at equal bucket count.

Scale design:

- **Lloyd's iterations are DataFrame jobs.** Assignment is a JVM argmin
  over k broadcast literal centroid arrays (no Python in the loop);
  the update step is posexplode → groupBy(cluster, dim) avg. Per
  iteration, exactly one shuffle of (k×d) partial sums — the vectors
  themselves never move.
- **Driver state is k×d floats** (the centroids), collected once per
  iteration. Nothing else leaves the executors.
- **Deterministic**: initial centroids are the k vectors with the
  smallest md5(id) (engine-independent order, same posture as
  ext/sampling.py), so reruns and repartitions converge identically.
  No RNG anywhere.

Reference anchor: none (the reference has no vector ops at all); this is
north-star surface per SURVEY §2.8.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_lakehouse_project_spark.cacheutil import release_on_gc
from data_lakehouse_project_spark.ext.similarity import _as_double, cosine
from data_lakehouse_project_spark.functions.scalar import lit_double_array


def _sq_dist(vec: Column, centroid: np.ndarray) -> Column:
    """Squared L2 distance to a literal centroid, as one JVM expression:
    |v|² - 2·v·c + |c|² with |c|² constant-folded."""
    c = lit_double_array(centroid)
    dot = F.aggregate(
        F.zip_with(vec, c, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    vnorm2 = F.aggregate(vec, F.lit(0.0), lambda acc, x: acc + x * x)
    return vnorm2 - 2.0 * dot + float((centroid**2).sum())


def _reduced_score(vec: Column, centroid: np.ndarray) -> Column:
    """-2·v·c + |c|²: monotone in |v-c|² (|v|² is constant across the
    argmin) — half the per-centroid work of the true distance."""
    c = lit_double_array(centroid)
    dot = F.aggregate(
        F.zip_with(vec, c, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return -2.0 * dot + float((centroid**2).sum())


def nearest_centroid(vec: Column, centroids: np.ndarray) -> Column:
    """Index of the nearest centroid (ties → lowest index): the k reduced
    scores land in ONE array expression, argmin = array_position of the
    array_min. Each score is evaluated once — a when-chain formulation
    duplicates the running best at every level (O(2^k) expression tree,
    measured 200+ s at k=8); this stays linear in k."""
    scores = F.array(*[_reduced_score(vec, c) for c in centroids])
    return (F.array_position(scores, F.array_min(scores)) - 1).cast("int")


def kmeans_fit(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 8,
    iters: int = 10,
) -> np.ndarray:
    """Distributed deterministic Lloyd's; returns (k, d) centroids.

    Init: the k vectors with smallest md5(id) — engine-independent and
    partitioning-independent. Each iteration runs one assignment
    projection and one (cluster, dim) aggregation; empty clusters keep
    their previous centroid (deterministic, no re-seeding jitter).
    """
    seed_rows = (
        df.select(
            F.md5(F.col(id_col).cast("string")).alias("_h"),
            _as_double(F.col(vec_col)).alias("_v"),
        )
        .orderBy("_h")
        .limit(k)
        .collect()
    )
    if len(seed_rows) < k:
        raise ValueError(f"kmeans_fit: k={k} but only {len(seed_rows)} rows")
    centroids = np.array([r._v for r in seed_rows], dtype=np.float64)

    for _ in range(iters):
        assigned = df.select(
            nearest_centroid(_as_double(F.col(vec_col)), centroids).alias(
                "_c"
            ),
            F.posexplode(_as_double(F.col(vec_col))).alias("_i", "_x"),
        )
        parts = (
            assigned.groupBy("_c", "_i")
            .agg(F.avg("_x").alias("_m"))
            .collect()
        )
        nxt = centroids.copy()  # empty clusters keep their centroid
        by_cluster: dict[int, dict[int, float]] = {}
        for r in parts:
            by_cluster.setdefault(r._c, {})[r._i] = r._m
        for c, dims in by_cluster.items():
            for i, m in dims.items():
                nxt[c, i] = m
        if np.allclose(nxt, centroids, atol=1e-12):
            break
        centroids = nxt
    return centroids


def assign_clusters(
    df: DataFrame, vec_col: str, centroids: np.ndarray
) -> DataFrame:
    """Append a `cluster` column (JVM argmin over the literal centroids)."""
    return df.withColumn(
        "cluster", nearest_centroid(_as_double(F.col(vec_col)), centroids)
    )


def semantic_dedup_prune(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    threshold: float = 0.95,
    k: int = 8,
    iters: int = 10,
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """SemDeDup: drop every vector that has a higher-priority semantic
    duplicate (cosine >= threshold) in ITS OWN cluster; the smallest id
    of each duplicate group survives.

    Pair generation is bounded by Σ|cluster|² — the clusters play the
    role MinHash bands play for text. Cross-cluster near-duplicates are
    the method's documented recall loss (SemDeDup accepts it; raise k
    for tighter clusters, or run the LSH family for recall guarantees).

    Returns the surviving rows of ``df`` (all original columns).
    """
    if centroids is None:
        centroids = kmeans_fit(df, vec_col, id_col, k=k, iters=iters)
    # One materialization serves both sides of the pair join and the
    # final anti-join. persist + release_on_gc (cacheutil): the cache is
    # unpersisted when the caller drops the result — a bare .persist()
    # with no unpersist point accumulated cached partitions for the life
    # of the session, and localCheckpoint blocks turned out to be pinned
    # by the py4j bridge forever (r5 measurement; cacheutil docstring).
    clustered = assign_clusters(df, vec_col, centroids).persist()

    a = clustered.select(
        F.col("cluster"),
        F.col(id_col).alias("_ida"),
        _as_double(F.col(vec_col)).alias("_va"),
    )
    b = clustered.select(
        F.col("cluster"),
        F.col(id_col).alias("_idb"),
        _as_double(F.col(vec_col)).alias("_vb"),
    )
    # within-cluster pairs only: equi-join on cluster, then the id order
    # makes each unordered pair appear once with _ida < _idb
    dropped = (
        a.join(b, "cluster")
        .where(F.col("_ida") < F.col("_idb"))
        .where(cosine(F.col("_va"), F.col("_vb")) >= threshold)
        .select(F.col("_idb").alias(id_col))
        .distinct()
    )
    return release_on_gc(
        clustered.join(dropped, id_col, "left_anti").drop("cluster"),
        clustered,
    )
