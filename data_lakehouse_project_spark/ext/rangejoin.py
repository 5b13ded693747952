"""Binned interval (range) join — the scale path for non-equi joins.

``points JOIN intervals ON lo <= p < hi`` plans BroadcastNestedLoopJoin,
which is correct ONLY while one side broadcasts (the tiny band-dim case
``registry.q_join_range_bands`` keeps). When BOTH sides are large
(IP-range lookup against millions of CIDR blocks, event-time × validity
windows), BNLJ is O(|points|·|intervals|) and there is no shuffle
strategy for a raw inequality.

The standard fix (every warehouse's "range join optimization", e.g. the
binning rewrite Databricks documents publicly): overlay a grid of width
``bin_width``; each point falls in exactly one bin, each interval is
EXPLODED to the bins it touches; an ordinary shuffle EQUI-join on the
bin id meets every (point, interval) candidate exactly once — a point's
single bin is covered once by any interval containing it, so no dedup
pass is needed — and the exact predicate then filters grid neighbors
that don't truly overlap.

Cost: |points| + Σ_i ceil(span_i / bin_width) exploded rows, shuffled
on an integer key Catalyst can hash-partition. Pick ``bin_width`` near
the median interval span: too small explodes long intervals, too large
piles points into few bins (skew). Unbounded intervals (sentinel his
like 1e12) must be clamped with ``clamp_hi`` — the exact predicate
still uses the ORIGINAL bounds, so clamping never changes results for
points below the clamp; it only bounds the explode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def interval_bin_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bin_width: float,
    clamp_lo: float | None = None,
    clamp_hi: float | None = None,
) -> DataFrame:
    """Rows of ``points`` × ``intervals`` with
    ``lo <= point < hi`` — via the bin-grid equi-join above.

    ``clamp_lo``/``clamp_hi`` bound the EXPLODE for open-ended
    intervals; they must enclose every point value that can match
    (points outside the clamp range match nothing — assert that
    invariant at the call site, not here, since only the caller knows
    the domain).
    """
    if bin_width <= 0:
        raise ValueError("bin_width must be positive")
    p_bin = F.floor(F.col(point_col) / F.lit(bin_width)).cast("long")
    lo_b = F.col(lo_col)
    hi_b = F.col(hi_col)
    if clamp_lo is not None:
        lo_b = F.greatest(lo_b, F.lit(float(clamp_lo)))
    if clamp_hi is not None:
        hi_b = F.least(hi_b, F.lit(float(clamp_hi)))
    lo_bin = F.floor(lo_b / F.lit(bin_width)).cast("long")
    # hi is exclusive: an interval ending exactly on a bin edge does not
    # touch that next bin
    hi_bin = F.floor(
        (hi_b - F.lit(1e-9)) / F.lit(bin_width)
    ).cast("long")
    exploded = intervals.select(
        "*",
        F.explode(F.sequence(lo_bin, F.greatest(hi_bin, lo_bin))).alias(
            "_bin"
        ),
    )
    return (
        points.withColumn("_bin", p_bin)
        .join(exploded, "_bin")
        .where(
            (F.col(point_col) >= F.col(lo_col))
            & (F.col(point_col) < F.col(hi_col))
        )
        .drop("_bin")
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_lo: str,
    left_hi: str,
    right_lo: str,
    right_hi: str,
    bin_width: float,
    clamp_lo: float | None = None,
    clamp_hi: float | None = None,
) -> DataFrame:
    """Interval × interval OVERLAP join (``max(lo) < min(hi)``,
    half-open [lo, hi)) — both sides large, no broadcast required.

    Both sides explode to the grid bins they touch and equi-join on the
    bin id. A pair overlapping k shared bins would meet k times; the
    classic exactly-once rule keeps the match only in the bin holding
    the OVERLAP'S START, ``floor(max(lo_a, lo_b) / w)`` — every truly
    overlapping pair has exactly one such bin, so no distinct pass and
    no over-count (the same trick warehouses document for their range-
    join optimization, generalized from the point case above).

    Cost: Σ ceil(span / bin_width) exploded rows per side, one shuffle
    each on the integer bin key. Pick ``bin_width`` near the median
    span; ``clamp_*`` bound the explode for open-ended intervals
    (results unchanged for overlaps inside the clamp window — the exact
    predicate uses the ORIGINAL bounds).
    """
    if bin_width <= 0:
        raise ValueError("bin_width must be positive")

    def _exploded(df: DataFrame, lo: str, hi: str) -> DataFrame:
        lo_b, hi_b = F.col(lo), F.col(hi)
        if clamp_lo is not None:
            lo_b = F.greatest(lo_b, F.lit(float(clamp_lo)))
        if clamp_hi is not None:
            hi_b = F.least(hi_b, F.lit(float(clamp_hi)))
        lo_bin = F.floor(lo_b / F.lit(bin_width)).cast("long")
        hi_bin = F.floor((hi_b - F.lit(1e-9)) / F.lit(bin_width)).cast(
            "long"
        )
        return df.select(
            "*",
            F.explode(
                F.sequence(lo_bin, F.greatest(hi_bin, lo_bin))
            ).alias("_bin"),
        )

    joined = _exploded(left, left_lo, left_hi).join(
        _exploded(right, right_lo, right_hi), "_bin"
    )
    start = F.greatest(F.col(left_lo), F.col(right_lo))
    # the exactly-once bin must respect the SAME clamp the explode
    # used: an overlap starting below clamp_lo has its start bin
    # outside every exploded ring, and the pair would silently vanish
    # even though it overlaps inside the window — so the emitting bin
    # is the clamped overlap start (the predicate itself stays on the
    # ORIGINAL bounds)
    start_eff = (
        F.greatest(start, F.lit(float(clamp_lo)))
        if clamp_lo is not None
        else start
    )
    return (
        joined.where(
            (start < F.least(F.col(left_hi), F.col(right_hi)))
            # exactly-once: only the overlap-start bin emits the pair
            & (
                F.floor(start_eff / F.lit(bin_width)).cast("long")
                == F.col("_bin")
            )
        )
        .drop("_bin")
    )
