"""Multi-resolution time rollups (hypertable-style continuous aggregates).

The TimescaleDB/Druid pattern: materialize the finest grain once, derive
every coarser grain FROM the finer rollup instead of rescanning raw
events. At 100 TB the raw table is scanned once per refresh; daily/
monthly aggregates read the (minuscule) hourly table. Decomposable
aggregates only (sum/count; avg derived at read time as sum/count).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hourly_base(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Finest-grain rollup: (hour, event_type) → count + value sum.
    This is the only operator that reads the raw events."""
    return df.groupBy(
        F.date_trunc("hour", F.col(ts_col)).alias("bucket"),
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("event_count"),
        F.sum("value").alias("value_sum"),
    )


def rollup_from(finer: DataFrame, grain: str) -> DataFrame:
    """Derive a coarser rollup from a finer one (no raw-data rescan):
    re-truncate the bucket and re-combine the decomposable partials."""
    return finer.groupBy(
        F.date_trunc(grain, F.col("bucket")).alias("bucket"),
        "event_type",
    ).agg(
        F.sum("event_count").alias("event_count"),
        F.sum("value_sum").alias("value_sum"),
    )


def multires_rollup(
    df: DataFrame, ts_col: str = "ts", grains: tuple[str, ...] = ("day", "month")
) -> dict[str, DataFrame]:
    """{'hour': ..., 'day': ..., 'month': ...} — each coarser level built
    from the previous. Persist the hourly level when refreshing several
    grains in one job (one raw scan total)."""
    out = {"hour": hourly_base(df, ts_col)}
    finer = out["hour"]
    for grain in grains:
        finer = rollup_from(finer, grain)
        out[grain] = finer
    return out


def hll_daily_users(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Daily distinct-user SKETCHES (Apache DataSketches HLL via
    ``hll_sketch_agg``): (day, users_est, sketch). Unlike a
    count-distinct rollup, the sketch column is MERGEABLE — coarser
    grains union the binary sketches without touching raw events, the
    property that makes distinct-count hierarchies affordable at 100 TB
    (count_distinct is NOT summable across buckets; sketches are)."""
    return (
        df.groupBy(F.date_trunc("day", F.col(ts_col)).alias("day"))
        .agg(F.hll_sketch_agg("user_id").alias("user_sketch"))
        .select(
            "day",
            F.hll_sketch_estimate("user_sketch").alias("users_est"),
            "user_sketch",
        )
    )


def hll_monthly_from_daily(daily: DataFrame) -> DataFrame:
    """Merge daily sketches to monthly estimates — no raw-event rescan.
    Sketch union is exact (associative), so this equals sketching the
    month directly; tests assert that identity."""
    return (
        daily.groupBy(F.date_trunc("month", F.col("day")).alias("month"))
        .agg(F.hll_union_agg("user_sketch").alias("user_sketch"))
        .select(
            "month",
            F.hll_sketch_estimate("user_sketch").alias("users_est"),
        )
    )


def kll_daily_value_sketch(
    df: DataFrame, ts_col: str = "ts", value_col: str = "value"
) -> DataFrame:
    """Daily QUANTILE sketches (DataSketches KLL via
    ``kll_sketch_agg_double``): (day, n, sketch). Like the HLL rollup,
    the sketch column is the mergeable partial — percentiles are NOT
    summable across buckets, so a quantile hierarchy at 100 TB needs a
    sketch per fine bucket, merged upward without raw rescans."""
    return (
        df.groupBy(F.date_trunc("day", F.col(ts_col)).alias("day"))
        .agg(F.kll_sketch_agg_double(value_col).alias("value_sketch"))
        .select(
            "day",
            F.kll_sketch_get_n_double("value_sketch").alias("n"),
            "value_sketch",
        )
    )


def _kll_merge_all(sketch_list):
    """Fold the binary ``kll_sketch_merge_double`` over a collected list
    of sketches (Spark ships no KLL merge AGGREGATE; the per-group list
    is one sketch per finer bucket — ≤31 for month-from-day — so the
    collect_list grain is bounded by the calendar, not the data)."""
    rest = F.slice(
        sketch_list, F.lit(2), F.greatest(F.size(sketch_list) - 1, F.lit(0))
    )
    return F.aggregate(
        rest,
        F.element_at(sketch_list, 1),
        lambda acc, x: F.kll_sketch_merge_double(acc, x),
    )


def kll_monthly_quantiles(
    daily: DataFrame, quantiles: tuple[float, ...] = (0.5, 0.95, 0.99)
) -> DataFrame:
    """Merge daily KLL sketches to monthly quantile estimates — no
    raw-event rescan. KLL merge keeps the rank-error guarantee (~1.7%
    at the default k), so the merged p50/p95/p99 match a direct sketch
    of the month within rank tolerance; tests assert that."""
    lst = F.collect_list("value_sketch")
    merged = daily.groupBy(
        F.date_trunc("month", F.col("day")).alias("month")
    ).agg(_kll_merge_all(lst).alias("value_sketch"))
    cols = [
        F.kll_sketch_get_quantile_double("value_sketch", F.lit(q)).alias(
            f"p{int(q * 100)}"
        )
        for q in quantiles
    ]
    return merged.select(
        "month", F.kll_sketch_get_n_double("value_sketch").alias("n"), *cols
    )


def theta_daily_users(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Daily distinct-user THETA sketches: (day, users_est, sketch).
    Theta sketches support union AND intersection/difference — the set
    algebra HLL lacks — so day-over-day overlap questions (returning
    users, churn) become sketch ops instead of raw self-joins."""
    return (
        df.groupBy(F.date_trunc("day", F.col(ts_col)).alias("day"))
        .agg(F.theta_sketch_agg("user_id").alias("user_sketch"))
        .select(
            "day",
            F.theta_sketch_estimate("user_sketch").alias("users_est"),
            "user_sketch",
        )
    )


def theta_returning_users(daily: DataFrame) -> DataFrame:
    """Day-over-day set algebra from the theta rollup alone: for each
    consecutive-day pair, estimated returning users (∩), new users
    (today ∖ yesterday), and churned (yesterday ∖ today). One
    self-join of the TINY daily sketch table — the raw events are never
    rescanned, which is the point: the equivalent exact query is a
    100 TB-scale self-join of raw events per day pair."""
    from pyspark.sql.window import Window

    w = Window.orderBy("day")
    paired = daily.select(
        "day",
        "user_sketch",
        F.lag("user_sketch").over(w).alias("prev_sketch"),
        F.lag("day").over(w).alias("prev_day"),
    ).where(
        F.col("prev_sketch").isNotNull()
        & (F.datediff("day", "prev_day") == 1)
    )
    return paired.select(
        "day",
        F.theta_sketch_estimate(
            F.theta_intersection("prev_sketch", "user_sketch")
        ).alias("returning_est"),
        F.theta_sketch_estimate(
            F.theta_difference("user_sketch", "prev_sketch")
        ).alias("new_est"),
        F.theta_sketch_estimate(
            F.theta_difference("prev_sketch", "user_sketch")
        ).alias("churned_est"),
    )
