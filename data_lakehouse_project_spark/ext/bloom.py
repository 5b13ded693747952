"""Distributed Bloom-filter membership index, pure JVM expressions.

Why this exists at 100 TB: the streaming-admission and incremental-dedup
paths (``ext/dedup.py::incremental_dedup_report_indexed``) answer "have
we seen this fingerprint before?" with a join against the full corpus
fingerprint table — correct, but the probe side pays for an ever-growing
index. A Bloom filter compresses N fingerprints into a fixed ``m``-bit
array with NO false negatives and a tunable false-positive rate, so the
common case ("definitely new") is answered map-side against a broadcast
few-MB bitset; only the "maybe seen" sliver pays the exact join. This is
the classic big-data admission pattern (e.g. Spark's own runtime
bloom-filter join pruning, `InjectRuntimeFilter`), exposed here as a
first-class, MERGEABLE corpus index.

Representation — PACKED: one row per 4096-bit block,
``(blk: long, lanes: map<int, long>)``; lane ``l`` of block ``b`` holds
filter bits ``[4096·b + 64·l, 4096·b + 64·(l+1))``; absent lanes/blocks
are all zero. Packing matters: the probe broadcasts the filter, and the
broadcast hash-relation build cost is per ROW — the earlier one-long-
per-row layout made a 2^27-bit filter a 2M-row broadcast whose build
time swamped the probe (measured in tools/scaling_probe.py); at 4096
bits/row the same filter is 32k rows. Capacity rule of thumb:
``num_bits ≈ 16–25× keys`` for ~1e-4..1e-3 FPR at 5 hashes —
UNDERSIZING saturates the filter and silently degrades every probe to
the exact path's cost.

All hashing is ``xxhash64(value, seed)`` (JVM-side, the same primitive
the dedup family uses), so build/probe/merge never leave whole-stage
codegen; there is no Python in any path.

Shapes:
- build: explode k seeds (k rows/key) → (blk, lane) bit_or → per-blk
  map assembly — two bounded-grain shuffles (≤ num_bits/64 then
  ≤ num_bits/4096 rows) regardless of input size.
- merge: explode lanes → same bit_or/repack — Bloom filters OR
  together losslessly (the union's filter equals the filter of the
  union), which is what makes per-shard build → tree-merge work on a
  1000-executor corpus.
- probe: k rows/key joined against the (broadcast) filter blocks → one
  bool_and per key: ``maybe_member`` true iff every probed bit is set.

Reference anchor: extends SURVEY §2.8's incremental-dedup admission
(no analog in /root/reference — the reference has no dedup at all).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

# bits per block-row = 64 lanes × 64 bits
_LANE_SHIFT = 6  # pos >> 6  = which 64-bit lane overall
_BLK_SHIFT = 12  # pos >> 12 = which 4096-bit block row
BITS_PER_BLOCK = 1 << _BLK_SHIFT


def _positions(df: DataFrame, col: str, num_bits: int, num_hashes: int):
    """k bit positions per row: pmod(xxhash64(col, seed), m)."""
    seeds = F.array(*[F.lit(i) for i in range(num_hashes)])
    return df.select(
        "*", F.explode(seeds).alias("_seed")
    ).select(
        "*",
        F.pmod(
            F.xxhash64(F.col(col), F.col("_seed")), F.lit(num_bits)
        ).alias("_pos"),
    )


def _pack(lane_rows: DataFrame) -> DataFrame:
    """(blk, lane, bits) → (blk, lanes map)."""
    return lane_rows.groupBy("blk").agg(
        F.map_from_entries(
            F.collect_list(F.struct("lane", "bits"))
        ).alias("lanes")
    )


def bloom_build(
    df: DataFrame, col: str, num_bits: int = 1 << 23, num_hashes: int = 5
) -> DataFrame:
    """Build the packed ``(blk, lanes)`` filter over ``df[col]``.

    Two shuffles with grains ≤ ``num_bits/64`` and ≤ ``num_bits/4096``
    rows regardless of input size; map-side partial bit_or keeps the
    first exchange at (partitions × live lanes) rows worst case.
    """
    pos = _positions(df, col, num_bits, num_hashes)
    lanes = (
        pos.select(
            F.shiftright("_pos", _BLK_SHIFT).alias("blk"),
            F.expr(
                f"cast(pmod(shiftright(_pos, {_LANE_SHIFT}), 64) as int)"
            ).alias("lane"),
            F.expr("shiftleft(1L, cast(pmod(_pos, 64) as int))").alias(
                "mask"
            ),
        )
        .groupBy("blk", "lane")
        .agg(F.bit_or("mask").alias("bits"))
    )
    return _pack(lanes)


def bloom_merge(*filters: DataFrame) -> DataFrame:
    """OR together filters built with the SAME (num_bits, num_hashes)."""
    from functools import reduce

    unioned = reduce(lambda a, b: a.unionByName(b), filters)
    lanes = (
        unioned.select(
            "blk", F.explode("lanes").alias("lane", "bits")
        )
        .groupBy("blk", "lane")
        .agg(F.bit_or("bits").alias("bits"))
    )
    return _pack(lanes)


def bloom_probe(
    df: DataFrame,
    col: str,
    bloom: DataFrame,
    num_bits: int = 1 << 23,
    num_hashes: int = 5,
    out_col: str = "maybe_member",
) -> DataFrame:
    """``df`` + boolean ``out_col``: False ⇒ DEFINITELY not indexed (the
    no-false-negatives guarantee admission logic relies on); True ⇒
    maybe indexed, route to the exact check.

    The filter side is broadcast (≤ num_bits/4096 rows by
    construction), so the probe is map-side: no shuffle of ``df``
    beyond the k-row explode and a groupBy on the probe key itself.
    """
    key_cols = df.columns
    pos = _positions(df, col, num_bits, num_hashes).select(
        *key_cols,
        F.shiftright("_pos", _BLK_SHIFT).alias("blk"),
        F.expr(
            f"cast(pmod(shiftright(_pos, {_LANE_SHIFT}), 64) as int)"
        ).alias("lane"),
        F.expr("cast(pmod(_pos, 64) as int)").alias("bit"),
    )
    joined = pos.join(F.broadcast(bloom), "blk", "left")
    word = F.coalesce(
        F.element_at(F.col("lanes"), F.col("lane")), F.lit(0).cast("long")
    )
    hit = word.bitwiseAND(F.expr("shiftleft(1L, bit)")) != 0
    return (
        joined.select(*key_cols, hit.alias("_hit"))
        .groupBy(*key_cols)
        .agg(F.bool_and("_hit").alias(out_col))
    )


def bloom_fpr(num_bits: int, num_hashes: int, n_keys: int) -> float:
    """Theoretical false-positive rate (1 - e^{-kn/m})^k."""
    return (1.0 - math.exp(-num_hashes * n_keys / num_bits)) ** num_hashes
