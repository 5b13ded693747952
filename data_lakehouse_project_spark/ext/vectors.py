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


def label_centroid_components(
    df: DataFrame, vec_col: str, label_col: str, round_to: int = 6
) -> DataFrame:
    """Per-label centroid components at (label, i, v) grain, i 1-based.

    posexplode → partial avg per (label, position). The shuffle carries
    dim × |labels| × partitions rows after partial aggregation,
    independent of corpus size. Scalar grain (no array columns) so the
    result is hashable by any downstream canonicalizer.
    """
    scale = float(10**round_to)
    exploded = df.select(
        F.col(label_col), F.posexplode(_as_double(F.col(vec_col)))
    )
    return exploded.groupBy(label_col, (F.col("pos") + 1).alias("i")).agg(
        (F.floor(F.avg("col") * scale + F.lit(0.5)).cast("double") / scale).alias(
            "v"
        )
    )


def label_centroids(
    df: DataFrame, vec_col: str, label_col: str, round_to: int = 6
) -> DataFrame:
    """Per-label centroid (elementwise mean) of an embedding column,
    re-assembled into an ordered array<double> per label.

    Array-typed output: for oracle-checked queries prefer
    :func:`label_centroid_components` (scalar grain).
    """
    per_pos = label_centroid_components(df, vec_col, label_col, round_to)
    return per_pos.groupBy(label_col).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("i", "v"))), lambda s: s["v"]
        ).alias("centroid")
    )
