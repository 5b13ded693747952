"""Distributed ML evaluation metrics: binary AUC and calibration bins.

Training pipelines score billions of rows (quality filters, dedup
verdicts, classifiers — ext/classifier.py); evaluating those scores at
the same scale needs metrics whose plan is aggregate-shaped, not
sort-everything-to-the-driver:

- **binary_auc**: the Mann-Whitney U formulation with average ranks
  for ties. Rather than ranking N rows (a global sort of the fact),
  rows collapse to DISTINCT-SCORE grain first (one map-side-combined
  groupBy); the rank arithmetic then runs over |distinct scores| rows
  — for quantized/bucketed scores (every practical filter) that is
  orders of magnitude smaller than N. A window cumsum over distinct
  scores yields each tie-group's average rank; AUC falls out of the
  rank-sum identity. Exact, including ties.
- **calibration_bins**: equal-width score buckets → (mean score,
  positive rate, n) per bucket; one aggregate.

Both are pure built-in expressions with 1:1 SQL oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def binary_auc(
    df: DataFrame, label_col: str, score_col: str
) -> DataFrame:
    """Exact ROC-AUC of ``score_col`` against boolean/0-1 ``label_col``.

    One groupBy on score + one window over the distinct-score table +
    one final 1-row aggregate. Returns 1 row: (n_pos, n_neg, auc);
    auc is null when either class is empty.
    """
    by_score = (
        df.select(
            F.col(score_col).cast("double").alias("s"),
            F.col(label_col).cast("int").alias("y"),
        )
        .where(F.col("s").isNotNull())
        .groupBy("s")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("y").alias("pos"),
        )
    )
    w = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, -1)
    ranked = by_score.withColumn(
        "cum_less", F.coalesce(F.sum("n").over(w), F.lit(0))
    ).withColumn("avg_rank", F.col("cum_less") + (F.col("n") + 1) / 2.0)
    agg = ranked.agg(
        F.sum("pos").alias("n_pos"),
        (F.sum("n") - F.sum("pos")).alias("n_neg"),
        F.sum(F.col("pos") * F.col("avg_rank")).alias("rank_sum_pos"),
    )
    u = F.col("rank_sum_pos") - F.col("n_pos") * (F.col("n_pos") + 1) / 2.0
    return agg.select(
        "n_pos",
        "n_neg",
        F.when(
            (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
            u / (F.col("n_pos") * F.col("n_neg")),
        ).alias("auc"),
    )


def calibration_bins(
    df: DataFrame,
    label_col: str,
    score_col: str,
    bins: int = 10,
    lo: float = 0.0,
    hi: float = 1.0,
) -> DataFrame:
    """Equal-width calibration table over [lo, hi]: per bin the mean
    score, positive rate and count — the reliability-diagram input. One
    map-side-combined aggregate; scores outside [lo, hi] clamp to the
    edge bins."""
    width = (hi - lo) / bins
    s = F.col(score_col).cast("double")
    bin_ix = F.least(
        F.greatest(F.floor((s - lo) / width), F.lit(0)), F.lit(bins - 1)
    ).cast("long")
    return (
        df.select(
            bin_ix.alias("bin"),
            s.alias("s"),
            F.col(label_col).cast("int").alias("y"),
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg("s").alias("mean_score"),
            F.avg("y").alias("pos_rate"),
        )
    )
