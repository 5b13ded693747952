"""ML feature engineering: smoothed target encoding + standard scaling.

Training-pipeline surface (SURVEY §2.8): turning warehouse tables into
model matrices is a per-row map plus a handful of GLOBAL or PER-GROUP
statistics — the whole trick at 100 TB is that every statistic rides a
broadcast (1 row, or |categories| rows) so the encode itself is a
map-only stage with zero extra shuffles over the fact.

- **Smoothed target encoding** (the Kaggle/CatBoost-family shape):
  enc(c) = (Σ target_c + m·prior) / (n_c + m) — shrinks rare
  categories toward the global prior instead of memorizing them.
- **Standard scaling**: (x − μ) / σ_pop per column.

Leakage note: same-row target participates in its own category mean
(full-fit encoding). For out-of-fold encoding compose with
ext/sampling.py::split_column and fit on the complement — the operator
stays the same, only the fit input changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def target_encode(
    df: DataFrame,
    cat_col: str,
    target_col: str,
    m: float = 10.0,
    out_col: str | None = None,
) -> DataFrame:
    """Append ``out_col`` (default ``{cat_col}_enc``): the smoothed
    per-category target mean. Two aggregates (global prior: 1 row;
    per-category sums: |categories| rows), both broadcast back — the
    fact table is touched by exactly one map stage."""
    out_col = out_col or f"{cat_col}_enc"
    prior = df.agg(
        F.avg(F.col(target_col)).alias("_prior")
    )
    per_cat = df.groupBy(cat_col).agg(
        F.sum(F.col(target_col)).alias("_sum_t"),
        F.count(F.lit(1)).alias("_n_c"),
    )
    return (
        df.join(F.broadcast(per_cat), cat_col)
        .crossJoin(F.broadcast(prior))
        .withColumn(
            out_col,
            (F.col("_sum_t") + F.lit(m) * F.col("_prior"))
            / (F.col("_n_c") + F.lit(m)),
        )
        .drop("_sum_t", "_n_c", "_prior")
    )


def standard_scale(
    df: DataFrame, cols: list[str], suffix: str = "_z"
) -> DataFrame:
    """Append ``{col}{suffix}`` z-scores for each column: ONE global
    aggregate (2·|cols| statistics in a single row) broadcast back,
    then a map-only projection. σ is population stddev; a constant
    column (σ = 0) yields null rather than ±inf."""
    stats = df.agg(
        *[
            a
            for c in cols
            for a in (
                F.avg(F.col(c)).alias(f"_mu_{c}"),
                F.stddev_pop(F.col(c)).alias(f"_sd_{c}"),
            )
        ]
    )
    out = df.crossJoin(F.broadcast(stats))
    for c in cols:
        out = out.withColumn(
            f"{c}{suffix}",
            F.when(
                F.col(f"_sd_{c}") > 0,
                (F.col(c) - F.col(f"_mu_{c}")) / F.col(f"_sd_{c}"),
            ),
        )
    return out.drop(
        *[n for c in cols for n in (f"_mu_{c}", f"_sd_{c}")]
    )
