"""Table-level data-quality expectations (Deequ-lite).

Completes the quality story the reference stubs out
(``data_quality_check = lit('passed')``, mysql_silver_transformation.py:67):
row-level rules live in ``silver.quality_flag``; this module adds
TABLE-level constraints — uniqueness, referential integrity, completeness,
ranges — each evaluated as one aggregate/join and collected into a
uniform (check, passed, violations) report DataFrame.

Each check is a separate small plan; ``run_expectations`` unions them so
one action materializes the whole report. All checks are
aggregate-shaped: cost is a scan + reduce per check, never a collect.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _report(check: str, violations: Column) -> list[Column]:
    return [
        F.lit(check).alias("check"),
        (violations == 0).alias("passed"),
        violations.cast("long").alias("violations"),
    ]


def expect_unique(df: DataFrame, cols: list[str]) -> DataFrame:
    """Violations = rows beyond the first per key (duplicate count)."""
    dupes = (
        df.groupBy(*cols)
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(F.coalesce(F.sum(F.col("c") - 1), F.lit(0)).alias("v"))
    )
    return dupes.select(*_report(f"unique({','.join(cols)})", F.col("v")))


def expect_not_null(df: DataFrame, cols: list[str]) -> DataFrame:
    """Violations = total null cells across the listed columns."""
    total = None
    for c in cols:
        n = F.count(F.when(F.col(c).isNull(), 1))
        total = n if total is None else total + n
    return df.agg(total.alias("v")).select(
        *_report(f"not_null({','.join(cols)})", F.col("v"))
    )


def expect_range(
    df: DataFrame, col: str, lo: float | None = None, hi: float | None = None
) -> DataFrame:
    cond = F.lit(False)
    if lo is not None:
        cond = cond | (F.col(col) < lo)
    if hi is not None:
        cond = cond | (F.col(col) > hi)
    return df.agg(F.count(F.when(cond, 1)).alias("v")).select(
        *_report(f"range({col},{lo},{hi})", F.col("v"))
    )


def expect_foreign_key(
    child: DataFrame, child_col: str, parent: DataFrame, parent_col: str
) -> DataFrame:
    """Violations = child rows whose key has no match in the parent
    (left-anti join — one shuffle, no row materialization)."""
    orphans = child.select(F.col(child_col)).join(
        parent.select(F.col(parent_col).alias(child_col)),
        child_col,
        "left_anti",
    )
    return orphans.agg(F.count(F.lit(1)).alias("v")).select(
        *_report(f"fk({child_col}->{parent_col})", F.col("v"))
    )


def expect_row_count_between(
    df: DataFrame, min_rows: int, max_rows: int | None = None
) -> DataFrame:
    n = df.agg(F.count(F.lit(1)).alias("n"))
    bad = F.when(F.col("n") < min_rows, F.col("n") - min_rows).otherwise(
        F.when(
            F.lit(max_rows is not None) & (F.col("n") > (max_rows or 0)),
            F.col("n") - (max_rows or 0),
        ).otherwise(F.lit(0))
    )
    return n.select(
        *_report(f"row_count[{min_rows},{max_rows}]", F.abs(bad))
    )


def expect_accepted_values(
    df: DataFrame, col: str, values: list
) -> DataFrame:
    """Violations = non-null rows whose value is outside the accepted
    set (a domain/enum constraint)."""
    bad = F.col(col).isNotNull() & ~F.col(col).isin(*values)
    return df.agg(F.count(F.when(bad, 1)).alias("v")).select(
        *_report(f"accepted({col})", F.col("v"))
    )


def expect_mean_between(
    df: DataFrame, col: str, lo: float, hi: float
) -> DataFrame:
    """Violations = 0 or 1: whether the column mean falls outside
    [lo, hi] (a distribution-drift tripwire)."""
    m = df.agg(F.avg(col).alias("m"))
    bad = (
        F.when(F.col("m").isNull(), 1)
        .when((F.col("m") < lo) | (F.col("m") > hi), 1)
        .otherwise(0)
    )
    return m.select(*_report(f"mean({col},[{lo},{hi}])", bad))


def run_expectations(checks: list[DataFrame]) -> DataFrame:
    """Union all check reports into one (check, passed, violations) table."""
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out


# --- fused single-pass checks ---------------------------------------------
# Every agg-shaped check (not-null, range, accepted-values, row-count,
# mean-bounds) is one aggregate expression over the same table, so they
# can share ONE scan + ONE partial/final aggregate instead of rescanning
# the (at 100 TB, enormous) fact table once per check. Checks that need
# their own shuffle shape (unique → groupBy, foreign key → anti join)
# stay separate and union in via ``run_expectations``.

AggCheck = tuple  # (name: str, violations: Column — an aggregate expr)


def agg_not_null(cols: list[str]) -> AggCheck:
    total = None
    for c in cols:
        n = F.count(F.when(F.col(c).isNull(), 1))
        total = n if total is None else total + n
    return (f"not_null({','.join(cols)})", total)


def agg_range(
    col: str, lo: float | None = None, hi: float | None = None
) -> AggCheck:
    cond = F.lit(False)
    if lo is not None:
        cond = cond | (F.col(col) < lo)
    if hi is not None:
        cond = cond | (F.col(col) > hi)
    return (f"range({col},{lo},{hi})", F.count(F.when(cond, 1)))


def agg_accepted_values(col: str, values: list) -> AggCheck:
    bad = F.col(col).isNotNull() & ~F.col(col).isin(*values)
    return (f"accepted({col})", F.count(F.when(bad, 1)))


def agg_row_count_between(min_rows: int, max_rows: int | None = None) -> AggCheck:
    n = F.count(F.lit(1))
    bad = F.when(n < min_rows, min_rows - n).otherwise(
        F.when(
            F.lit(max_rows is not None) & (n > (max_rows or 0)),
            n - (max_rows or 0),
        ).otherwise(F.lit(0))
    )
    return (f"row_count[{min_rows},{max_rows}]", bad)


def agg_mean_between(col: str, lo: float, hi: float) -> AggCheck:
    m = F.avg(col)
    bad = (
        F.when(m.isNull(), 1)
        .when((m < lo) | (m > hi), 1)
        .otherwise(0)
    )
    return (f"mean({col},[{lo},{hi}])", bad)


def fused_expectations(df: DataFrame, checks: list[AggCheck]) -> DataFrame:
    """Evaluate every agg-shaped check in a single scan + aggregate, then
    unpivot the 1-row result into the uniform (check, passed, violations)
    report via ``stack`` (no shuffle beyond the one global aggregate)."""
    row = df.agg(
        *[v.cast("long").alias(f"_v{i}") for i, (_, v) in enumerate(checks)]
    )
    pairs = ", ".join(f"'{name}', _v{i}" for i, (name, _) in enumerate(checks))
    return row.select(
        F.expr(f"stack({len(checks)}, {pairs}) AS (check, violations)")
    ).select(
        "check",
        (F.col("violations") == 0).alias("passed"),
        F.col("violations").cast("long").alias("violations"),
    )
