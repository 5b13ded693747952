"""Heavy hitters / frequent items (SURVEY §2.8 — corpus analytics).

Two tiers, mirroring the dedup family's exact-anchor + scale-path
pattern:

- ``frequent_items_exact``: the oracle-checkable anchor — one groupBy
  over the item stream, threshold filter on support. One shuffle on the
  item key; at 100 TB the map-side partial aggregation means the
  exchange carries one row per distinct item per task, not per
  occurrence.
- ``misra_gries_topk``: the mergeable-summary scale path for when even
  the distinct-item exchange is too wide (e.g. heavy-hitter URLs over
  a trillion-row log with billions of distinct keys). Per-partition
  Misra–Gries summaries of capacity ``k`` are built in one Arrow pass
  (``mapInPandas`` — the counters dict is bounded at k entries however
  large the partition), merged by an itemwise sum (rows exchanged:
  ≤ partitions·k, independent of data size), then trimmed by the
  standard mergeable-summaries rule: subtract the (k+1)-th largest
  merged weight and drop non-positive remainders (Agarwal et al.,
  "Mergeable Summaries", PODS'12). Guarantee: every item with true
  count > n/(k+1) survives, and each surviving estimate is within
  n/(k+1) below its true count. Property-tested in
  tests/test_frequent.py; kept out of the oracle registry because the
  surviving *sub-threshold* items depend on partitioning.

No counterpart in the reference (its aggregations are plain groupBys —
``mysql_gold_aggregation.py:117-125``); this is north-star surface for
trillion-row log analytics.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def frequent_items_exact(
    df: DataFrame, item_col: str, min_support: float
) -> DataFrame:
    """Items occurring in at least ``min_support`` fraction of rows,
    with exact count and share. One shuffle (map-side combined); the
    total-count scalar rides a 1-row broadcast so no second pass."""
    total = df.agg(F.count(F.lit(1)).cast("double").alias("n_total"))
    return (
        df.groupBy(F.col(item_col).alias("item"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .crossJoin(F.broadcast(total))
        .where(F.col("cnt") >= F.col("n_total") * min_support)
        .select(
            "item",
            "cnt",
            (F.col("cnt") / F.col("n_total")).alias("share"),
        )
    )


def _mg_partial(item_iter: Iterator[pd.DataFrame], k: int):
    """One bounded Misra–Gries pass over a partition's Arrow batches.

    Classic MG: an incoming item either increments its counter, claims
    a free slot, or triggers a decrement round — ALL counters drop by 1
    and the arriving occurrence is DISCARDED. Each decrement round thus
    removes k+1 units of mass (k counters + the arrival), which is what
    makes the n/(k+1) undercount bound hold; inserting the arrival
    instead would weaken it to n/k. Rounds are ≤ n/(k+1) and cost O(k)
    each, so the pass stays O(n) overall with O(k) state.
    """
    counters: dict = {}
    for pdf in item_iter:
        for item in pdf["item"]:
            if item in counters:
                counters[item] += 1
            elif len(counters) < k:
                counters[item] = 1
            else:
                counters = {
                    i: c - 1 for i, c in counters.items() if c > 1
                }
    if counters:
        yield pd.DataFrame(
            {"item": list(counters), "wt": list(counters.values())}
        )


def misra_gries_topk(df: DataFrame, item_col: str, k: int) -> DataFrame:
    """Mergeable Misra–Gries heavy-hitter summary of capacity ``k``.

    Returns ≤ k rows (item, est) where est underestimates the true
    count by at most n/(k+1); any item with true count > n/(k+1) is
    guaranteed present. Scale shape: one Arrow pass per partition with
    O(k) state, one exchange of ≤ partitions·k summary rows, and the
    final trim runs on that tiny merged table (window over ≤ P·k rows).
    """
    items = df.select(F.col(item_col).cast("string").alias("item"))
    partials = items.mapInPandas(
        lambda it: _mg_partial(it, k), "item string, wt long"
    )
    merged = partials.groupBy("item").agg(F.sum("wt").alias("wt"))
    # mergeable-summaries trim: subtract the (k+1)-th largest weight
    ranked = merged.withColumn(
        "_rk", F.row_number().over(Window.orderBy(F.desc("wt"), "item"))
    )
    kth = ranked.where(F.col("_rk") == k + 1).select(
        F.col("wt").alias("_kth")
    )
    return (
        ranked.where(F.col("_rk") <= k)
        .crossJoin(
            F.broadcast(
                kth.unionByName(
                    kth.sparkSession.range(1).select(
                        F.lit(0).cast("long").alias("_kth")
                    )
                ).agg(F.max("_kth").alias("_kth"))
            )
        )
        .select("item", (F.col("wt") - F.col("_kth")).alias("est"))
        .where(F.col("est") > 0)
    )


# ---------------------------------------------------------------------
# Count-Min sketch (Cormode & Muthukrishnan 2005): the third mergeable
# frequency summary — unlike Misra–Gries it never UNDER-estimates, and
# its memory (depth × width counters) is independent of both data size
# and distinct-key count, so shards built on different partitions /
# days / streams merge by plain counter addition.
# ---------------------------------------------------------------------

def cms_build(
    df: DataFrame, item_col: str, width: int = 1024, depth: int = 4
) -> DataFrame:
    """Build a Count-Min sketch as a tiny (d, idx, cnt) table.

    Row i of the sketch hashes each item with ``xxhash64(item, i)`` (the
    depth index as an extra hashed column gives ``depth`` independent
    hash functions from the one built-in). The build is ONE map-side-
    combined groupBy whose exchange carries at most depth·width rows per
    task — at 100 TB the shuffle is KB-sized however many distinct keys
    the stream has. Missing (d, idx) cells mean counter 0.

    Merge shards with :func:`cms_merge`; query with :func:`cms_estimate`.
    """
    items = df.select(F.col(item_col).cast("string").alias("_item"))
    cells = items.select(
        F.posexplode(
            F.array(
                *[
                    F.pmod(F.xxhash64("_item", F.lit(i)), F.lit(width))
                    for i in range(depth)
                ]
            )
        ).alias("d", "idx")
    )
    return cells.groupBy("d", "idx").agg(F.count(F.lit(1)).alias("cnt"))


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge CMS shards built with the same (width, depth): counters add
    cell-wise. Exact — a merged sketch is byte-identical to the sketch
    of the concatenated streams (property-tested)."""
    it = iter(sketches)
    out = next(it)
    for s in it:
        out = out.unionByName(s)
    return out.groupBy("d", "idx").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    queries: DataFrame,
    sketch: DataFrame,
    item_col: str,
    width: int = 1024,
    depth: int = 4,
) -> DataFrame:
    """Point-query the sketch for each row of ``queries``.

    Output: (item, est) where est = min over sketch rows of the hashed
    counter — always ≥ the true count, and ≤ true + ε·N with prob.
    1 − (1/2)^depth for ε = e/width (the classic CMS bound). The sketch
    side is ≤ depth·width rows so the join is a broadcast hash join;
    the query side never shuffles.
    """
    q = queries.select(F.col(item_col).cast("string").alias("item"))
    probes = q.select(
        "item",
        F.posexplode(
            F.array(
                *[
                    F.pmod(F.xxhash64("item", F.lit(i)), F.lit(width))
                    for i in range(depth)
                ]
            )
        ).alias("d", "idx"),
    )
    return (
        probes.join(F.broadcast(sketch), ["d", "idx"], "left")
        .select("item", "d", F.coalesce("cnt", F.lit(0)).alias("cnt"))
        .groupBy("item")
        .agg(F.min("cnt").alias("est"))
    )
