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
