"""A/B experiment readout: two-proportion z-test over user-grain
conversion.

Warehouse-analytics north star (SURVEY §2.9) — the reference ingests
raw events; an experimentation readout on top is the canonical
"analytics engine" ask. The whole computation is TWO aggregates
(user grain, then variant grain) and closed-form arithmetic on a
2-row frame — at 100 TB the only real cost is the user-grain
aggregation, one map-side-combined shuffle on user_id.

The z-score uses the pooled-proportion standard error:
    z = (p_b − p_a) / sqrt(p̂(1−p̂)(1/n_a + 1/n_b)),  p̂ pooled.
No p-value column: Spark has no erf built-in, and shipping a UDF for
a monotone transform of z adds nothing the caller can't table-lookup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def ab_test_proportions(
    users: DataFrame,
    variant_col: str = "variant",
    converted_col: str = "converted",
) -> DataFrame:
    """Two-variant conversion readout from a USER-GRAIN frame
    (one row per user: variant label + 0/1 conversion flag).

    Output (1 row): n_a, n_b, conv_a, conv_b, rate_a, rate_b,
    lift (rate_b − rate_a), z_score (pooled SE; null when a variant is
    empty or the pooled rate is degenerate 0/1 — no information).
    """
    per_variant = users.groupBy(variant_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col(converted_col).cast("long")).alias("conv"),
    )
    wide = per_variant.groupBy().pivot(variant_col, ["A", "B"]).agg(
        F.first("n").alias("n"), F.first("conv").alias("conv")
    )
    n_a, n_b = F.col("A_n"), F.col("B_n")
    c_a, c_b = F.col("A_conv"), F.col("B_conv")
    p_a = c_a / n_a
    p_b = c_b / n_b
    pooled = (c_a + c_b) / (n_a + n_b)
    se = F.sqrt(pooled * (1.0 - pooled) * (1.0 / n_a + 1.0 / n_b))
    return wide.select(
        n_a.alias("n_a"),
        n_b.alias("n_b"),
        c_a.alias("conv_a"),
        c_b.alias("conv_b"),
        p_a.alias("rate_a"),
        p_b.alias("rate_b"),
        (p_b - p_a).alias("lift"),
        F.when(se > 0, (p_b - p_a) / se).alias("z_score"),
    )


def assign_and_measure(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    conversion_type: str = "purchase",
) -> DataFrame:
    """Build the user-grain frame from a raw event stream: variant by
    md5 parity of the user key (deterministic, engine-portable — the
    registry's hash convention), conversion = any ``conversion_type``
    event. One shuffle on user_id."""
    per_user = events.groupBy(F.col(user_col).alias("user_id")).agg(
        F.max((F.col(type_col) == conversion_type).cast("int")).alias(
            "converted"
        )
    )
    bucket = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10
    ).cast("long")
    return per_user.withColumn(
        "variant",
        F.when(F.pmod(bucket, F.lit(2)) == 0, "A").otherwise("B"),
    )
