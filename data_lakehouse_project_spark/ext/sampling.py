"""Deterministic sampling & dataset splitting for training-data
pipelines.

Random sampling (``df.sample``/``sampleBy``) is seed- and
partitioning-dependent — rerun the pipeline after a repartition and the
sample changes, which poisons experiment reproducibility and makes
train/eval splits leak. The training-pipeline-grade alternative is
**hash sampling**: bucket every row by a stable content hash of its key
and keep buckets below the rate cutoff. Properties that matter at
100 TB:

- **Deterministic & engine-independent**: same keys → same sample, on
  any cluster size, partitioning, or engine (md5 is standardized, so
  external systems — and the SQL oracle — reproduce the exact rows).
- **Map-only**: a filter on a hash expression; no shuffle, no state,
  fully pushdown-compatible with column pruning.
- **Stable under growth**: a key keeps its bucket forever, so
  yesterday's 1% sample is a subset of today's 2% sample (rate changes
  are monotone), and train/eval membership never flips.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BUCKETS = 10_000  # rate resolution: 0.01%


def hash_bucket(key: Column, buckets: int = BUCKETS) -> Column:
    """Stable [0, buckets) bucket from the md5 of the key's string form.

    First 8 hex chars → 32-bit int → mod. md5 (not xxhash64/crc32)
    because every engine renders identical hex for identical bytes —
    the sample is reproducible outside Spark.
    """
    return (
        F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10)
        .cast("long")
        % buckets
    )


def hash_sample(
    df: DataFrame, key_col: str, fraction: float, buckets: int = BUCKETS
) -> DataFrame:
    """Keep ~``fraction`` of rows, deterministically by key hash."""
    return df.where(hash_bucket(F.col(key_col), buckets) < int(fraction * buckets))


def split_column(
    key: Column, eval_fraction: float, buckets: int = BUCKETS
) -> Column:
    """'eval' for the held-out slice, 'train' otherwise — membership is a
    pure function of the key, so no leakage across reruns/repartitions."""
    return F.when(
        hash_bucket(key, buckets) < int(eval_fraction * buckets), F.lit("eval")
    ).otherwise(F.lit("train"))


def stratified_hash_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    buckets: int = BUCKETS,
) -> DataFrame:
    """Per-stratum deterministic sampling — the 'data mixing weights'
    primitive (e.g. keep 100% of wiki, 10% of web crawl). The rate map
    becomes a CASE expression: still a map-only filter, no shuffle, and
    the per-stratum keep decision stays independent of every other row.
    """
    cutoff = F.lit(int(default_rate * buckets))
    for stratum, rate in sorted(rates.items()):
        cutoff = F.when(
            F.col(strata_col) == stratum, F.lit(int(rate * buckets))
        ).otherwise(cutoff)
    return df.where(hash_bucket(F.col(key_col), buckets) < cutoff)


def temperature_mix_report(
    df: DataFrame,
    strata_col: str,
    alpha: float = 0.5,
    target_total: int | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Temperature-scaled mixture weights per stratum — the standard
    multi-source/multilingual rebalancing rule (weight_i ∝ n_i^alpha):
    alpha=1 keeps natural proportions, alpha=0 is uniform, 0<alpha<1
    up-samples small sources. Returns one row per stratum:
    (stratum, n_docs, weight, sample_rate) where sample_rate =
    min(1, target_total·weight / n_i) is directly feedable to
    ``stratified_hash_sample``.

    Shape: one partial+final aggregation over the strata column, then a
    1-row broadcast scalar (denominator/total) crossed back — no window
    over an empty partitioning, no second scan. Rounding uses the
    explicit floor form so external engines reproduce it bit-for-bit.
    """
    scale = float(10**round_to)

    def _rnd(c: Column) -> Column:
        return F.floor(c * scale + F.lit(0.5)).cast("double") / scale

    counts = df.groupBy(F.col(strata_col).alias("stratum")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    powed = counts.withColumn("n_pow", F.pow(F.col("n_docs"), F.lit(alpha)))
    denom = powed.agg(
        F.sum("n_pow").alias("_denom"), F.sum("n_docs").alias("_total")
    )
    target = (
        F.lit(float(target_total))
        if target_total is not None
        else F.col("_total").cast("double")
    )
    weight = F.col("n_pow") / F.col("_denom")
    return (
        powed.crossJoin(F.broadcast(denom))
        .select(
            "stratum",
            "n_docs",
            _rnd(weight).alias("weight"),
            _rnd(
                F.least(F.lit(1.0), target * weight / F.col("n_docs"))
            ).alias("sample_rate"),
        )
    )
