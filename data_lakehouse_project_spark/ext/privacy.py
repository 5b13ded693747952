"""Privacy risk analytics: k-anonymity and l-diversity over
quasi-identifier (QI) columns.

Complements the content-level PII redaction in ext/text.py (which
scrubs emails/phones INSIDE free text) with the record-level
re-identification measures a data-release review runs over STRUCTURED
columns: a row is k-anonymous when at least k rows share its full QI
combination, and an equivalence class is l-diverse when its sensitive
attribute takes at least l distinct values (Sweeney 2002; Machanavajjhala
et al. 2007).

Scale shape: both measures are ONE aggregation on the QI key (partial +
final hash aggregate, no join, no window over an unpartitioned frame);
the per-row annotation variant is a single window count over the same
key. Generalization (banding a numeric QI) happens in the caller's
projection, so Catalyst folds it into the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _rn(col: Column, digits: int) -> Column:
    scale = float(10**digits)
    return F.floor(col * scale + F.lit(0.5)).cast("double") / F.lit(scale)


def k_anonymity_classes(
    df: DataFrame, qi_cols: list[str], k: int = 10
) -> DataFrame:
    """One row per QI equivalence class: the class values, its size,
    and whether it meets the k threshold. The release rule: rows in
    classes with ``meets_k = false`` must be suppressed or generalized
    before publication.
    """
    return (
        df.groupBy(*qi_cols)
        .agg(F.count(F.lit(1)).alias("class_size"))
        .select(
            *qi_cols,
            "class_size",
            (F.col("class_size") >= k).alias("meets_k"),
        )
    )


def k_anonymity_summary(
    df: DataFrame, qi_cols: list[str], k: int = 10
) -> DataFrame:
    """Single-row release-risk report: class count, rows in sub-k
    classes (the suppression cost of publishing as-is), the smallest
    class (worst-case re-identification set), and the suppressed-rows
    fraction."""
    classes = k_anonymity_classes(df, qi_cols, k)
    return classes.agg(
        F.count(F.lit(1)).alias("n_classes"),
        F.sum("class_size").cast("long").alias("n_rows"),
        F.min("class_size").alias("min_class_size"),
        F.sum(F.when(~F.col("meets_k"), F.col("class_size")).otherwise(0))
        .cast("long")
        .alias("rows_below_k"),
        _rn(
            F.sum(
                F.when(~F.col("meets_k"), F.col("class_size")).otherwise(0)
            )
            / F.sum("class_size"),
            6,
        ).alias("suppressed_frac"),
    )


def l_diversity_classes(
    df: DataFrame,
    qi_cols: list[str],
    sensitive_col: str,
    l_threshold: int = 2,
    k: int = 10,
) -> DataFrame:
    """k-anonymity classes extended with distinct-l-diversity of a
    sensitive attribute: a class that is large enough (meets k) can
    still leak the sensitive value outright when every member shares it
    (homogeneity attack) — ``distinct_sensitive >= l`` guards that.

    Exact count_distinct per group — one aggregation; Spark plans the
    usual expand for the mixed distinct/plain aggregate, which is the
    right exact plan at one distinct column (the HLL switch in
    operators/profile.py is for the many-distinct-columns case).
    """
    return (
        df.groupBy(*qi_cols)
        .agg(
            F.count(F.lit(1)).alias("class_size"),
            F.count_distinct(F.col(sensitive_col)).alias(
                "distinct_sensitive"
            ),
        )
        .select(
            *qi_cols,
            "class_size",
            "distinct_sensitive",
            (F.col("class_size") >= k).alias("meets_k"),
            (F.col("distinct_sensitive") >= l_threshold).alias("meets_l"),
        )
    )
