"""Vector-column analytics: normalization, elementwise aggregation,
per-label centroids.

Elementwise array aggregation has no Spark built-in; the scalable shape
is posexplode → (group, position) aggregate → re-assemble sorted. The
shuffle carries (label, pos, partial) — dim × |labels| × partitions rows,
independent of corpus size after partial aggregation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_lakehouse_project_spark.ext.similarity import _as_double, _norm


def l2_normalize(vec: Column) -> Column:
    """Unit-norm an array<float|double> column (JVM expressions)."""
    v = _as_double(vec)
    n = _norm(v)
    return F.transform(v, lambda x: x / n)


def label_centroids(
    df: DataFrame, vec_col: str, label_col: str, round_to: int = 6
) -> DataFrame:
    """Per-label centroid (elementwise mean) of an embedding column.

    posexplode → partial avg per (label, position) → reassemble ordered.
    Components rounded with the engine's floor form for reproducibility.
    """
    scale = float(10**round_to)
    exploded = df.select(
        F.col(label_col), F.posexplode(_as_double(F.col(vec_col)))
    )
    per_pos = exploded.groupBy(label_col, "pos").agg(
        (F.floor(F.avg("col") * scale + F.lit(0.5)).cast("double") / scale).alias(
            "v"
        )
    )
    return per_pos.groupBy(label_col).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "v"))), lambda s: s["v"]
        ).alias("centroid")
    )
