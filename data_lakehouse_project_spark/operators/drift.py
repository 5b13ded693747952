"""Snapshot-to-snapshot data drift over delta-lite time travel.

The monitoring loop a table format enables: compare any two versions of
a table (yesterday's load vs today's) column by column — moment shifts,
null-rate shifts, and a Population Stability Index over version-A-decile
buckets — without having kept any extra state: time travel IS the
baseline store.

PSI (the standard industry drift score): bucket both snapshots by the
BASELINE's deciles, then Σ (p_b − q_b)·ln(p_b/q_b); <0.1 stable,
0.1–0.25 moderate, >0.25 major shift.

Scale shape: per compared column, one ``approxQuantile`` on the
baseline (driver gets 9 doubles), then ONE aggregation pass per
snapshot computing every column's moments + bucket counts together
(the bucket assignment is a 10-arm CASE expression over literal
edges — JVM, no Python). Nothing driver-side grows with data.

Reference anchor: upgrades the reference's constant-placeholder quality
flag (SURVEY §2.3 P7) to longitudinal quality monitoring.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, functions as F

from data_lakehouse_project_spark.operators.txnlog import TxnTable


def snapshot_drift_report(
    spark: SparkSession,
    table: TxnTable,
    columns: list[str],
    version_a: int | None = None,
    version_b: int | None = None,
) -> DataFrame:
    """One row per column: counts, mean/std, null fractions at versions
    A (baseline, default: previous) and B (default: latest), and the
    PSI of B against A's decile buckets."""
    latest = table.latest_version()
    if version_b is None:
        version_b = latest
    if version_a is None:
        version_a = max(version_b - 1, 0)
    df_a = table.read(spark, version=version_a)
    df_b = table.read(spark, version=version_b)

    edges = {
        c: _dedup_edges(
            df_a.where(F.col(c).isNotNull()).approxQuantile(
                c, [i / 10.0 for i in range(1, 10)], 0.01
            )
        )
        for c in columns
    }
    stats_a = _one_pass_stats(df_a, columns, edges)
    stats_b = _one_pass_stats(df_b, columns, edges)

    rows = []
    for c in columns:
        a, b = stats_a[c], stats_b[c]
        rows.append(
            (
                c,
                version_a,
                version_b,
                a["n"],
                b["n"],
                a["mean"],
                b["mean"],
                a["std"],
                b["std"],
                a["null_frac"],
                b["null_frac"],
                _psi(a["buckets"], b["buckets"]),
            )
        )
    return spark.createDataFrame(
        rows,
        "column string, version_a int, version_b int, n_a long, n_b long,"
        " mean_a double, mean_b double, std_a double, std_b double,"
        " null_frac_a double, null_frac_b double, psi double",
    )


def _dedup_edges(edges: list[float]) -> list[float]:
    out: list[float] = []
    for e in edges:
        if not out or e > out[-1]:
            out.append(e)
    return out


def _bucket_expr(col: str, edges: list[float]):
    """10-arm CASE over the baseline's decile edges (JVM literal
    comparisons; constant arm count, no data-dependent plan growth)."""
    expr = None
    for i, e in enumerate(edges):
        cond = F.col(col) <= F.lit(e)
        expr = F.when(cond, F.lit(i)) if expr is None else expr.when(
            cond, F.lit(i)
        )
    if expr is None:
        return F.lit(0)
    return expr.otherwise(F.lit(len(edges)))


def _one_pass_stats(
    df: DataFrame, columns: list[str], edges: dict[str, list[float]]
) -> dict[str, dict]:
    """EVERY column's moments + bucket histogram in ONE aggregation
    pass over the snapshot."""
    aggs = []
    for c in columns:
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__n"),
            F.avg(c).alias(f"{c}__mean"),
            F.stddev_samp(c).alias(f"{c}__std"),
            F.avg(F.col(c).isNull().cast("double")).alias(f"{c}__nullf"),
        ]
        n_buckets = len(edges[c]) + 1
        bucket = _bucket_expr(c, edges[c])
        aggs += [
            F.sum(
                (F.col(c).isNotNull() & (bucket == i)).cast("long")
            ).alias(f"{c}__b{i}")
            for i in range(n_buckets)
        ]
    row = df.agg(*aggs).first()
    out = {}
    for c in columns:
        n_buckets = len(edges[c]) + 1
        out[c] = {
            "n": row[f"{c}__n"],
            "mean": row[f"{c}__mean"],
            "std": row[f"{c}__std"],
            "null_frac": row[f"{c}__nullf"],
            "buckets": [row[f"{c}__b{i}"] for i in range(n_buckets)],
        }
    return out


def _psi(a: list[int], b: list[int]) -> float:
    """Population Stability Index with the conventional 1e-4 floor on
    empty buckets (keeps the log finite)."""
    ta, tb = max(sum(a), 1), max(sum(b), 1)
    psi = 0.0
    for ca, cb in zip(a, b):
        p = max(ca / ta, 1e-4)
        q = max(cb / tb, 1e-4)
        psi += (p - q) * math.log(p / q)
    return psi
