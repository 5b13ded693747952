"""Skew-mitigation operators.

AQE's skew-join splitting handles skewed JOINs automatically (enabled in
session.py); skewed AGGREGATIONS still hot-spot a single reducer when one
group key carries most rows. ``salted_aggregate`` is the classic two-phase
fix: pre-aggregate on (key, salt) — spreading each hot key over N
reducers — then finalize on key alone. Only decomposable aggregates
(sum/count/min/max, and avg as sum+count) can be salted this way.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def fan_out_input(
    df: DataFrame,
    key_col: str | Column | None = None,
    single_only: bool = False,
) -> DataFrame:
    """Parallelize an under-partitioned input ahead of per-row-heavy
    work (guide §2.5 "input skew": one unsplittable file serializes the
    whole map stage behind one task — a single-row-group parquet file
    scans as exactly one split no matter how small maxPartitionBytes
    is). Repartitions to the session's default parallelism, hashed on
    ``key_col`` (a column name or an arbitrary deterministic Column
    expression; default: the first column, a key in every caller), when
    the input has materially fewer partitions than the session can run.

    Deliberately a hash repartition, not round-robin: with one upstream
    map task the per-target-partition row order is deterministic, so
    tie-sensitive downstream operators see a stable order across runs.
    ``single_only=True`` tightens the gate to exactly-one-partition
    inputs — the only case where that determinism argument holds; use
    it when the downstream computes order-sensitive float reductions
    (see operators/profile.py). At real scale the gate never fires —
    any table bigger than one input split already fans out at the
    source, shuffle-free — so this costs nothing where it doesn't
    help. Callers are the operators whose per-row kernels (codec
    decode, window shingling, Arrow matmuls, multi-pass tokenize) were
    MEASURED to dominate one row-exchange; cheap codegen'd scans lose
    from the extra exchange and must not call this.
    """
    sc = df.sparkSession.sparkContext
    par = sc.defaultParallelism
    try:
        n = df.rdd.getNumPartitions()
    except Exception:
        return df
    if par <= 1 or n * 4 > par or (single_only and n != 1):
        return df
    key = key_col if key_col is not None else df.columns[0]
    if isinstance(key, str):
        key = F.col(key)
    return df.repartition(par, key)


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
