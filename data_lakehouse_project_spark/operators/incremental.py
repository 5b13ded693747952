"""Incremental materialized-view maintenance over the delta-lite CDF.

The lakehouse pattern the change feed exists for: a gold aggregate that
stays in sync with its base table by applying CHANGE DELTAS instead of
rescanning the base. At 100 TB the base scan is the cost that matters —
a day's mutations touch a sliver of files, and ``read_changes`` reads
only the files those commits rewrote, so refresh cost is proportional
to churn, not table size.

Only decomposable aggregates are maintainable this way (count / sum,
with avg derived at read time as sum/count — same contract as
``streaming/rollup.py``): an insert contributes +1/+value, a delete
−1/−value, and an update (which the CDF surfaces as delete+insert of
the net-changed rows) contributes the difference. min/max are NOT
incrementally maintainable under deletes without auxiliary structures;
callers needing them recompute.

Crash consistency: the view is itself a delta-lite table, and each
refresh commit atomically records ``source_version`` (the base version
it reflects) in its commitInfo — a crashed refresh leaves the previous
consistent view visible, and the retry re-derives the same delta range
from the log. Refresh is idempotent at head (no new base commits → no
new view commit).

Scale note: the refresh rewrites the whole (small, aggregated) view via
overwrite — correct because the view's cardinality is the GROUP grain,
not the base grain. If the group grain itself is huge, partition the
view and let the delta's partition values confine the overwrite.

Reference anchor: upgrades the reference's rescan-everything gold jobs
(``spark/jobs/mysql_gold_aggregation.py:117-125`` recomputes the full
rollup per run) to churn-proportional maintenance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from data_lakehouse_project_spark.operators.txnlog import TxnTable


def refresh_aggregate_view(
    spark: SparkSession,
    base: TxnTable,
    view: TxnTable,
    group_cols: list[str],
    sum_cols: dict[str, str],
    max_cols: dict[str, str] | None = None,
    min_cols: dict[str, str] | None = None,
) -> int:
    """Bring ``view`` (group_cols → cnt + Σ sum_cols [+ min/max]) up to
    date with ``base``; returns the base version the view now reflects.

    First call (no view log yet) computes the full aggregate from the
    base snapshot; later calls apply only ``read_changes`` deltas since
    the last recorded ``source_version``.

    min/max are only SEMI-decomposable: inserts merge via
    greatest/least, but a delete can retire the current extreme and the
    view alone can't know the runner-up. So when min/max columns are
    requested, the delta path applies only while every commit in the
    catch-up range is an ``append`` (or ``optimize`` — content-
    preserving); any merge/delete/overwrite in range triggers a FULL
    recompute of that refresh (correctness over cleverness — the
    standard IVM limitation, stated rather than silently wrong).
    """
    max_cols = max_cols or {}
    min_cols = min_cols or {}
    base_version = base.latest_version()
    if base_version < 0:
        raise FileNotFoundError(f"base table has no commits: {base.path}")

    def _full_aggregate():
        return (
            base.read(spark)
            .groupBy(*group_cols)
            .agg(
                F.count(F.lit(1)).alias("cnt"),
                *[F.sum(src).alias(out) for out, src in sum_cols.items()],
                *[F.max(src).alias(out) for out, src in max_cols.items()],
                *[F.min(src).alias(out) for out, src in min_cols.items()],
            )
        )

    applied = _last_source_version(view)
    if applied is None:
        return _commit_view(view, _full_aggregate(), base_version)
    if applied >= base_version:
        return applied  # idempotent at head

    if max_cols or min_cols:
        ops = _ops_in_range(base, applied + 1, base_version)
        if any(op not in ("append", "optimize") for op in ops):
            return _commit_view(view, _full_aggregate(), base_version)

    sign = F.when(
        F.col("_change_type") == "insert", F.lit(1)
    ).otherwise(F.lit(-1))
    changes = base.read_changes(
        spark, starting_version=applied + 1, ending_version=base_version
    )
    deltas = changes.groupBy(*group_cols).agg(
        F.sum(sign).alias("_dcnt"),
        *[
            F.sum(sign * F.col(src)).alias(f"_d_{out}")
            for out, src in sum_cols.items()
        ],
        # append-only by the gate above, so delta extremes merge safely
        *[
            F.max(src).alias(f"_d_{out}")
            for out, src in max_cols.items()
        ],
        *[
            F.min(src).alias(f"_d_{out}")
            for out, src in min_cols.items()
        ],
    )
    z = F.lit(0)
    merged = (
        view.read(spark)
        .join(deltas, group_cols, "full")
        .select(
            *group_cols,
            (F.coalesce("cnt", z) + F.coalesce("_dcnt", z)).alias("cnt"),
            *[
                (
                    F.coalesce(F.col(out), z)
                    + F.coalesce(F.col(f"_d_{out}"), z)
                ).alias(out)
                for out in sum_cols
            ],
            # greatest/least skip nulls, so new groups and untouched
            # groups both resolve to the surviving side
            *[
                F.greatest(F.col(out), F.col(f"_d_{out}")).alias(out)
                for out in max_cols
            ],
            *[
                F.least(F.col(out), F.col(f"_d_{out}")).alias(out)
                for out in min_cols
            ],
        )
        .where(F.col("cnt") > 0)  # groups whose last member was deleted
    )
    return _commit_view(view, merged, base_version)


def _ops_in_range(base: TxnTable, lo: int, hi: int) -> list[str]:
    """commitInfo operations for versions in [lo, hi]."""
    return [
        h["operation"]
        for h in base.history()
        if lo <= h.get("version", -1) <= hi
    ]


def read_aggregate_view(
    spark: SparkSession, view: TxnTable, avg_of: dict[str, str] | None = None
) -> DataFrame:
    """The current view, optionally with derived averages
    (``avg_col -> sum_col``; avg = sum/cnt at read time)."""
    df = view.read(spark)
    for avg_col, sum_col in (avg_of or {}).items():
        df = df.withColumn(avg_col, F.col(sum_col) / F.col("cnt"))
    return df


def _last_source_version(view: TxnTable) -> int | None:
    if view.latest_version() < 0:
        return None
    info = view.history()[-1]
    return info.get("source_version")


def _commit_view(view: TxnTable, df: DataFrame, base_version: int) -> int:
    view.write(
        df,
        mode="overwrite",
        commit_info={"source_version": base_version},
    )
    return base_version
