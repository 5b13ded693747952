"""Marketing-funnel conversion attribution over an event stream.

North-star analytics surface (the reference has only raw event
ingestion — SURVEY §2.9 mandates the analytical closure on top). Given
an event table (user_id, ts, event_type, ...), credit each CONVERSION
event (e.g. ``purchase``) to the TOUCH events (e.g. ``view``/``click``)
that preceded it within a lookback window, under a pluggable model:

- ``last``   — full credit to the most recent touch
- ``first``  — full credit to the earliest touch in the window
- ``linear`` — 1/n to each of the n touches in the window
- ``time_decay`` — weight 2^(-age/half_life), normalized per conversion

Scale shape: ONE equi-join on user_id (conversions × touches of the
same user), filtered to the lookback range, then a per-conversion
window to rank/normalize. The join key is the natural partitioning of
event data; per-user event counts are bounded in practice (and a skewed
"bot user" is exactly what AQE skew-split handles — gated in
test_plans). No per-conversion rescans, no driver loops, all built-in
expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

TOUCH_TYPES = ("view", "click")


def attribute_conversions(
    events: DataFrame,
    model: str = "last",
    conversion_type: str = "purchase",
    touch_types: tuple[str, ...] = TOUCH_TYPES,
    lookback_hours: int = 72,
    half_life_hours: float = 24.0,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Per (conversion, touch) credit rows.

    Output: (user_id, conv_id, conv_ts, touch_id, touch_ts, touch_type,
    weight) — weights of one conversion sum to 1. Conversions with no
    touch in the window are dropped (unattributed; callers can anti-join
    to report them).
    """
    if model not in ("last", "first", "linear", "time_decay"):
        raise ValueError(f"unknown attribution model: {model}")

    conv = events.where(F.col(type_col) == conversion_type).select(
        F.col(user_col).alias("user_id"),
        F.col(id_col).alias("conv_id"),
        F.col(ts_col).alias("conv_ts"),
    )
    touch = events.where(F.col(type_col).isin(*touch_types)).select(
        F.col(user_col).alias("user_id"),
        F.col(id_col).alias("touch_id"),
        F.col(ts_col).alias("touch_ts"),
        F.col(type_col).alias("touch_type"),
    )
    # timestamp_diff works uniformly for TIMESTAMP and TIMESTAMP_NTZ
    # (a long cast on NTZ is an analysis error in Spark 4)
    age_s = F.timestamp_diff("SECOND", F.col("touch_ts"), F.col("conv_ts"))
    joined = conv.join(touch, "user_id").where(
        (F.col("touch_ts") <= F.col("conv_ts"))
        & (age_s <= lookback_hours * 3600)
    )

    w = Window.partitionBy("conv_id")
    if model in ("last", "first"):
        order = (
            [F.col("touch_ts").desc(), F.col("touch_id").desc()]
            if model == "last"
            else [F.col("touch_ts").asc(), F.col("touch_id").asc()]
        )
        ranked = joined.withColumn(
            "_rn", F.row_number().over(w.orderBy(*order))
        )
        out = ranked.where(F.col("_rn") == 1).withColumn(
            "weight", F.lit(1.0)
        )
    elif model == "linear":
        out = joined.withColumn(
            "weight", 1.0 / F.count(F.lit(1)).over(w)
        )
    else:  # time_decay
        raw = F.pow(
            F.lit(2.0), -(age_s.cast("double") / (half_life_hours * 3600.0))
        )
        out = joined.withColumn("_raw", raw).withColumn(
            "weight", F.col("_raw") / F.sum("_raw").over(w)
        )

    return out.select(
        "user_id",
        "conv_id",
        "conv_ts",
        "touch_id",
        "touch_ts",
        "touch_type",
        "weight",
    )


def attribution_report(
    events: DataFrame, model: str = "last", **kwargs
) -> DataFrame:
    """Channel-level rollup: credited conversions + value per touch type.

    The standard end shape: after the credit join, one small groupBy on
    touch_type (cardinality = #channels, a broadcast-scale result).
    """
    credits = attribute_conversions(events, model=model, **kwargs)
    return credits.groupBy("touch_type").agg(
        F.count(F.lit(1)).alias("touches_credited"),
        F.countDistinct("conv_id").alias("conversions"),
        F.sum("weight").alias("credit"),
    )
