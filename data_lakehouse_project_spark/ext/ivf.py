"""IVF-style approximate nearest neighbor (the second ANN scale path,
alongside sign-LSH in ext/similarity.py).

Classic inverted-file design: k-means centroids learned on a sample
(pyspark.ml, seeded → deterministic), every vector assigned to its
nearest centroid ("list"), queries probe only the ``nprobe`` nearest
lists. At 100 TB the assigned table is written *partitioned by
list_id*, so a probe is a partition-pruned scan of nprobe/k of the data.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_lakehouse_project_spark.ext.similarity import _as_double, cosine
from data_lakehouse_project_spark.functions.scalar import lit_double_array


def train_centroids(
    df: DataFrame,
    vec_col: str,
    k: int = 16,
    sample_fraction: float = 1.0,
    seed: int = 42,
) -> np.ndarray:
    """Learn k centroids with seeded k-means on a (sampled) vector column.

    Sampling keeps training cost flat as the table grows — centroid
    quality needs only a representative sample, never the full corpus.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    train = df if sample_fraction >= 1.0 else df.sample(sample_fraction, seed)
    feats = train.select(array_to_vector(_as_double(F.col(vec_col))).alias("features"))
    model = KMeans(k=k, seed=seed, maxIter=20).fit(feats)
    return np.array([np.asarray(c) for c in model.clusterCenters()])


def _nearest_centroid(vec: Column, centroids: np.ndarray) -> Column:
    """Index of the closest centroid (squared L2), as one JVM expression:
    argmin via array of (dist, idx) structs + array_min."""
    scored = F.array(
        *[
            F.struct(
                F.aggregate(
                    F.zip_with(
                        vec,
                        lit_double_array(c),
                        lambda a, b: (a - b) * (a - b),
                    ),
                    F.lit(0.0),
                    lambda acc, v: acc + v,
                ).alias("dist"),
                F.lit(i).alias("idx"),
            )
            for i, c in enumerate(centroids)
        ]
    )
    return F.array_min(scored)["idx"]


def assign_lists(
    df: DataFrame, vec_col: str, centroids: np.ndarray
) -> DataFrame:
    """Append ``list_id`` — at scale, persist partitioned/bucketed by it."""
    return df.withColumn(
        "list_id", _nearest_centroid(_as_double(F.col(vec_col)), centroids)
    )


def ivf_topk(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    query: list[float],
    k: int = 10,
    n_clusters: int = 16,
    nprobe: int = 4,
    seed: int = 42,
    centroids: np.ndarray | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Probe the nprobe nearest inverted lists, brute-force within them.

    Scan fraction ≈ nprobe/n_clusters; recall grows with nprobe (exact at
    nprobe == n_clusters). Pass precomputed ``centroids`` to amortize
    training across queries (the real deployment shape).
    """
    if centroids is None:
        centroids = train_centroids(df, vec_col, k=n_clusters, seed=seed)
    q = np.asarray(query, dtype=np.float64)
    order = np.argsort(((centroids - q) ** 2).sum(axis=1))
    probe_ids = [int(i) for i in order[:nprobe]]

    assigned = assign_lists(df, vec_col, centroids)
    qcol = lit_double_array(query)
    score = cosine(_as_double(F.col(vec_col)), qcol)
    return (
        assigned.where(F.col("list_id").isin(probe_ids))
        .select(F.col(id_col), F.round(score, round_to).alias("score"))
        .orderBy(F.desc("score"), F.col(id_col))
        .limit(k)
    )


def write_ivf_index(
    df: DataFrame,
    vec_col: str,
    path: str,
    n_clusters: int = 16,
    seed: int = 42,
    centroids: np.ndarray | None = None,
) -> np.ndarray:
    """Persist the IVF index: vectors assigned to inverted lists and
    written *partitioned by list_id*, so a probe is a partition-pruned
    scan of nprobe/k of the data — the file layout IS the index. Returns
    the centroids (caller persists them beside the data; they are the
    only driver-side state, k×dim floats).
    """
    if centroids is None:
        centroids = train_centroids(df, vec_col, k=n_clusters, seed=seed)
    assign_lists(df, vec_col, centroids).write.mode("overwrite").partitionBy(
        "list_id"
    ).parquet(path)
    return centroids


def probe_ivf_index(
    spark,
    path: str,
    vec_col: str,
    id_col: str,
    query: list[float],
    centroids: np.ndarray,
    k: int = 10,
    nprobe: int = 4,
    round_to: int = 6,
) -> DataFrame:
    """Top-k over a persisted IVF index. The `list_id IN (...)` filter
    lands on the partition column, so Spark plans a partition-pruned
    scan (PartitionFilters in the FileScan — gated in tests): only
    nprobe/n_clusters of the index files are ever opened. Brute-force
    cosine inside the probed lists, TakeOrderedAndProject for the
    global k.
    """
    q = np.asarray(query, dtype=np.float64)
    order = np.argsort(((centroids - q) ** 2).sum(axis=1))
    probe_ids = [int(i) for i in order[:nprobe]]

    df = spark.read.parquet(path)
    qcol = lit_double_array(query)
    score = cosine(_as_double(F.col(vec_col)), qcol)
    return (
        df.where(F.col("list_id").isin(probe_ids))
        .select(F.col(id_col), F.round(score, round_to).alias("score"))
        .orderBy(F.desc("score"), F.col(id_col))
        .limit(k)
    )


def append_to_ivf_index(
    df: DataFrame, vec_col: str, path: str, centroids: np.ndarray
) -> None:
    """Admit NEW vectors into a persisted IVF index without rebuilding:
    assign each arriving vector to its inverted list under the EXISTING
    centroids and append into the matching ``list_id=`` partition
    directories (dynamic-partition append — only partitions that
    actually receive rows gain a file).

    The growing-corpus ANN shape: probes keep partition-pruning, old
    files are never rewritten, and the index stays correct because
    membership depends only on the frozen centroids. Re-train and
    rebuild only when drift degrades recall (centroids are the sole
    driver-side state, so that decision is an offline metric, not an
    online cost). Mirrors incremental_dedup's admission-control posture
    for the embedding side.
    """
    assign_lists(df, vec_col, centroids).write.mode("append").partitionBy(
        "list_id"
    ).parquet(path)
