"""As-of (temporal) join — an operator Spark's built-ins don't provide.

Composed per the engine's escape-hatch ladder (task brief / SURVEY §2.8):
DataFrame ops can't express "most recent right row ≤ left ts" without an
O(n·m) non-equi join + window dedup, so this uses (b): cogrouped
``applyInPandas`` with ``pd.merge_asof`` — each join key's rows meet in
one Arrow batch, sorted merge is O(n+m) per key, and the only shuffle is
the cogroup hash partition on the key. Semantics match DuckDB/kdb ASOF
JOIN (backward, inclusive).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType


def asof_join(
    left: DataFrame,
    right: DataFrame,
    ts_col: str,
    by: str,
    right_cols: list[str],
    suffix: str = "_asof",
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the nearest right row at-or-before its
    timestamp (per ``by`` key). Right payload columns arrive as
    ``<name><suffix>`` (nullable when no match exists).

    At 100 TB: one shuffle per side on ``by``; within-key sort happens in
    the Arrow batch. Skewed keys are the caveat — salt the key upstream
    if one entity dominates the stream.
    """
    # Re-alias every right column: when left and right derive from the
    # same source DataFrame (self-as-of, e.g. purchases vs clicks of one
    # events table) they share attribute exprIds, and Spark's cogroup
    # attribute dedup then drops the right side's payload columns from the
    # Arrow batch (observed: right pdf arriving with only the key column).
    # .alias() mints fresh exprIds, breaking the false sharing.
    right_sel = right.select(
        *[F.col(c).alias(c) for c in (by, ts_col, *right_cols)]
    )

    out_fields = list(left.schema.fields)
    for f in right_sel.schema.fields:
        if f.name in (by,):
            continue
        out_fields.append(StructField(f.name + suffix, f.dataType, True))
    out_schema = StructType(out_fields)
    left_names = [f.name for f in left.schema.fields]

    def merge(l_pdf: pd.DataFrame, r_pdf: pd.DataFrame) -> pd.DataFrame:
        l_sorted = l_pdf.sort_values(ts_col)
        if r_pdf.empty:
            out = l_sorted.copy()
            for f in out_fields[len(left_names):]:
                out[f.name] = None
            return out
        r_sorted = (
            r_pdf.drop(columns=[by])
            .sort_values(ts_col)
            .rename(columns={c: c + suffix for c in r_pdf.columns if c != by})
        )
        return pd.merge_asof(
            l_sorted,
            r_sorted,
            left_on=ts_col,
            right_on=ts_col + suffix,
            direction=direction,
        )

    return (
        left.groupBy(by)
        .cogroup(right_sel.groupBy(by))
        .applyInPandas(lambda l, r: merge(l, r), schema=out_schema)
    )
