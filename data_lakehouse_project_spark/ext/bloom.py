"""Distributed Bloom-filter membership index, pure JVM expressions.

Why this exists at 100 TB: the streaming-admission and incremental-dedup
paths (``ext/dedup.py::incremental_dedup_report``) answer "have we seen
this fingerprint before?" with a join against the full corpus fingerprint
table — correct, but the probe side shuffles against an ever-growing
index. A Bloom filter compresses N fingerprints into a fixed ``m``-bit
array with NO false negatives and a tunable false-positive rate, so the
common case ("definitely new") is answered map-side against a broadcast
few-MB bitset; only the "maybe seen" sliver pays the exact join.
This is the classic big-data admission pattern (e.g. Spark's own
runtime bloom-filter join pruning, `InjectRuntimeFilter`), exposed here
as a first-class, MERGEABLE corpus index.

Representation: the filter is a DataFrame ``(word: long, bits: long)``
— word ``w`` holds filter bits ``[64w, 64w+64)``; absent words are all
zero. At ``num_bits = 2**23`` that is at most 128 Ki rows / 1 MiB —
broadcastable — while indexing tens of millions of keys at ~1% FPR.

All hashing is ``xxhash64(value, seed)`` (JVM-side, the same primitive
the dedup family uses), so build/probe/merge never leave whole-stage
codegen; there is no Python in any path.

Shapes:
- build: explode k seeds (k rows/key) → one groupBy(word) bit_or — a
  single shuffle whose grain is at most ``num_bits/64`` rows.
- merge: union + same groupBy — Bloom filters OR together losslessly.
- probe: k rows/key joined against the (broadcast) filter words → one
  bool_and per key: ``maybe_member`` true iff every probed bit is set.

Reference anchor: extends SURVEY §2.8's incremental-dedup admission
(no analog in /root/reference — the reference has no dedup at all).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F


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


def bloom_build(
    df: DataFrame, col: str, num_bits: int = 1 << 23, num_hashes: int = 5
) -> DataFrame:
    """Build the ``(word, bits)`` filter over ``df[col]``.

    One shuffle, grain ≤ ``num_bits/64`` rows regardless of input size;
    map-side partial bit_or makes the exchange carry at most
    (partitions × live words) rows.
    """
    pos = _positions(df, col, num_bits, num_hashes)
    return (
        pos.select(
            F.shiftright("_pos", 6).alias("word"),
            F.expr("shiftleft(1L, cast(pmod(_pos, 64) as int))").alias(
                "mask"
            ),
        )
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
    )


def bloom_merge(*filters: DataFrame) -> DataFrame:
    """OR together filters built with the SAME (num_bits, num_hashes).
    Bloom filters are losslessly mergeable — the union's filter equals
    the filter of the union — which is what makes per-shard build →
    tree-merge work on a 1000-executor corpus."""
    from functools import reduce

    unioned = reduce(lambda a, b: a.unionByName(b), filters)
    return unioned.groupBy("word").agg(F.bit_or("bits").alias("bits"))


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

    The filter side is broadcast (≤ num_bits/64 rows by construction),
    so the probe is map-side: no shuffle of ``df`` beyond the k-row
    explode and a groupBy on the probe key itself.
    """
    key_cols = df.columns
    pos = _positions(df, col, num_bits, num_hashes).select(
        *key_cols,
        F.shiftright("_pos", 6).alias("word"),
        F.expr("cast(pmod(_pos, 64) as int)").alias("bit"),
    )
    joined = pos.join(F.broadcast(bloom), "word", "left")
    hit = (
        F.col("bits").isNotNull()
        & (F.expr("(bits >> bit) & 1L") == F.lit(1))
    )
    return (
        joined.select(*key_cols, hit.alias("_hit"))
        .groupBy(*key_cols)
        .agg(F.bool_and("_hit").alias(out_col))
    )


def bloom_fpr(num_bits: int, num_hashes: int, n_keys: int) -> float:
    """Theoretical false-positive rate (1 - e^{-kn/m})^k."""
    return (1.0 - math.exp(-num_hashes * n_keys / num_bits)) ** num_hashes
