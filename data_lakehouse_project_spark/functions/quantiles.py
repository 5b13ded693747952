"""Exact quantiles in bounded memory — the engine's scale path for
percentile_cont semantics (SURVEY §2.8 "exact quantiles at scale").

``grouped_quantiles_exact`` is bit-identical to Spark's holistic
``F.percentile`` without its per-group every-row aggregation buffer;
consumers: agg_mad, agg_median_percentile, lineitem_mad_outliers,
ship_latency_medians, lineitem_iqr_fences, customer_rfm_segments,
customer_pareto_deciles, ext/text.length_outlier_filter.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F


def grouped_quantiles_exact(df, keys, val, quantiles):
    """EXACT per-group quantiles (percentile_cont interpolation — the
    same arithmetic as ``F.percentile`` / DuckDB ``quantile_cont``) in
    BOUNDED memory: collapse to the (keys, value) distinct-count
    grain, running prefix sum over a partitioned window (streaming
    after the sort — no holistic buffer holding every row), then for
    each requested quantile q interpolate between the value(s) whose
    cumulative range straddles rank positions floor(h)+1 / ceil(h)+1
    with h = (n−1)·q — bit-identical to Spark's holistic
    ``Percentile`` result, because both compute the identical double
    expression.

    ``quantiles`` is ``{out_column: q}``; the result carries one row
    per key group with every requested quantile plus ``__n`` (group
    row count).  Per-group state is O(distinct values) at the count
    grain and O(1) in the window — unlike ``F.percentile``, whose
    aggregation buffer materializes every row of the group on one
    task (the round-6 sf40 weak slot: 49.7 s and a memory cliff at
    100×).  ``keys`` may be a single literal group for GLOBAL
    quantiles: the one window task streams over distinct values with
    an external (spillable) sort, still never a per-row buffer."""
    counts = df.groupBy(*keys, val).agg(F.count(F.lit(1)).alias("__cnt"))
    w = Window.partitionBy(*keys).orderBy(val)
    w_all = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    # group total as a window max over the SAME sort — one WindowExec,
    # no second aggregate branch / broadcast join over `counts`
    cum = counts.withColumn("__cum", F.sum("__cnt").over(w)).withColumn(
        "__n", F.max("__cum").over(w_all)
    )
    x = F.col(val).cast("double")

    def _contains(j):
        return (F.col("__cum") - F.col("__cnt") < j) & (j <= F.col("__cum"))

    keep = F.lit(False)
    aggs = []
    for out, q in quantiles.items():
        # Spark's Percentile: pos = (n−1)·q (0-indexed), lower/higher
        # = floor/ceil, result = lower·(1−frac) + higher·frac.  The
        # double products below mirror that expression exactly.
        h = (F.col("__n") - 1) * F.lit(float(q))
        lo = F.floor(h) + 1  # 1-indexed rank of the lower straddle
        hi = F.ceil(h) + 1
        frac = h - F.floor(h)
        keep = keep | _contains(lo) | _contains(hi)
        aggs.append(
            F.sum(
                F.when(_contains(lo), x * (F.lit(1.0) - frac)).otherwise(
                    0.0
                )
                + F.when(_contains(hi), x * frac).otherwise(0.0)
            ).alias(out)
        )
    return (
        cum.where(keep)
        .groupBy(*keys)
        .agg(*aggs, F.max("__n").alias("__n"))
    )


def grouped_median_exact(df, keys, val, out="med"):
    """EXACT per-group median — ``grouped_quantiles_exact`` at q=0.5
    (see there for the bounded-memory counts-grain design)."""
    return grouped_quantiles_exact(df, keys, val, {out: 0.5})


def grouped_quantiles_disc(df, keys, val, quantiles, keep_n=False):
    """EXACT per-group DISCRETE quantiles (``percentile_disc``: the
    smallest actual data value whose cume_dist >= q — no
    interpolation) in the same bounded-memory counts-grain shape as
    :func:`grouped_quantiles_exact`: per-group state is O(distinct
    values); the window prefix sum streams after the sort, never a
    per-row holistic buffer.

    ``quantiles`` is ``{out_column: q}``; output values keep the
    input column's type (they ARE data values).  The output schema is
    exactly ``keys + quantile columns`` — pass ``keep_n=True`` to also
    get the ``__n`` group row count (the ``grouped_quantiles_exact``
    convention)."""
    counts = df.groupBy(*keys, val).agg(F.count(F.lit(1)).alias("__cnt"))
    w = Window.partitionBy(*keys).orderBy(val)
    w_all = w.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = counts.withColumn("__cum", F.sum("__cnt").over(w)).withColumn(
        "__n", F.max("__cum").over(w_all)
    )
    keep = F.lit(False)
    aggs = []
    for out, q in quantiles.items():
        # smallest v with cume_dist(v) >= q  <=>  the single distinct
        # value whose cumulative range straddles ceil(n*q)… precisely:
        # __cum/__n >= q AND (__cum-__cnt)/__n < q
        hit = (F.col("__cum") >= F.col("__n") * F.lit(float(q))) & (
            (F.col("__cum") - F.col("__cnt"))
            < F.col("__n") * F.lit(float(q))
        )
        keep = keep | hit
        aggs.append(F.max(F.when(hit, F.col(val))).alias(out))
    if keep_n:
        aggs.append(F.max("__n").alias("__n"))
    return cum.where(keep).groupBy(*keys).agg(*aggs)
