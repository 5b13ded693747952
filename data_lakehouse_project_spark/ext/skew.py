"""Skew-mitigation operators.

AQE's skew-join splitting handles skewed JOINs automatically (enabled in
session.py); skewed AGGREGATIONS still hot-spot a single reducer when one
group key carries most rows. ``salted_aggregate`` is the classic two-phase
fix: pre-aggregate on (key, salt) — spreading each hot key over N
reducers — then finalize on key alone. Only decomposable aggregates
(sum/count/min/max, and avg as sum+count) can be salted this way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    sums: dict[str, str] | None = None,
    count_name: str | None = None,
    avgs: dict[str, str] | None = None,
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    sums:  {output_name: input_col} summed
    count_name: output name for COUNT(*)
    avgs:  {output_name: input_col} averaged (decomposed into sum+count)

    Phase 1 shuffles on (keys..., salt) — each hot key fans out over
    ``salt_buckets`` reducers; phase 2 shuffles only |groups|×buckets
    pre-aggregated rows. Results are identical to a plain groupBy (the
    salt is a deterministic row hash, purely a partitioning device).
    """
    sums = sums or {}
    avgs = avgs or {}
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt_buckets))

    phase1_aggs = []
    for name, col in sums.items():
        phase1_aggs.append(F.sum(col).alias(f"_s_{name}"))
    for name, col in avgs.items():
        phase1_aggs.append(F.sum(col).alias(f"_as_{name}"))
        phase1_aggs.append(F.count(col).alias(f"_ac_{name}"))
    if count_name:
        phase1_aggs.append(F.count(F.lit(1)).alias("_cnt"))

    p1 = df.withColumn("_salt", salt).groupBy(*keys, "_salt").agg(*phase1_aggs)

    phase2_aggs = []
    for name in sums:
        phase2_aggs.append(F.sum(f"_s_{name}").alias(name))
    for name in avgs:
        phase2_aggs.append(
            (F.sum(f"_as_{name}") / F.sum(f"_ac_{name}")).alias(name)
        )
    if count_name:
        phase2_aggs.append(F.sum("_cnt").alias(count_name))
    return p1.groupBy(*keys).agg(*phase2_aggs)
