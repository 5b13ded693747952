"""Byte-pair-encoding tokenizer training, Spark-distributed.

Upgrades ``ext/text.py``'s BPE-ish regex token COUNTER to a real BPE
TRAINER (the Sennrich et al. algorithm every modern LLM tokenizer
descends from): start from characters, repeatedly merge the globally
most frequent adjacent pair.

The scalable formulation trains on the WORD-FREQUENCY table, not the
corpus: one corpus scan builds ``(word, count)`` (grain = distinct
words, millions at worst — the 100 TB corpus is never touched again),
and every merge iteration is one pair-count aggregation over that small
table plus a driver-side top-1 collect (the learned rule — k rules
total is the ONLY driver state). The merge itself is a pure JVM
``aggregate`` fold over each word's token array (left-to-right,
non-overlapping — the standard BPE application order), so no Python
touches any row.

Determinism: ties on pair frequency break lexicographically, so the
same corpus always learns the same merge table on any cluster layout.

Plan hygiene: the word table is ``localCheckpoint``ed each iteration —
k iterations otherwise stack k fold expressions into one plan and
re-derive every prior merge per pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from data_lakehouse_project_spark.cacheutil import free_local_checkpoint
from data_lakehouse_project_spark.ext.text import ws_tokens


def _chars(word: Column) -> Column:
    """Word → array of single characters (the initial BPE alphabet),
    with an end-of-word sentinel so merges can't bridge words when
    segments are later compared across words."""
    return F.concat(F.split(word, ""), F.array(F.lit("</w>")))


def _merge_fold(tokens: Column, a: str, b: str) -> Column:
    """Left-to-right non-overlapping replacement of adjacent (a, b) by
    their concatenation — a single JVM ``aggregate`` fold; after a
    merge the new token is NOT re-considered as a left partner for the
    same rule (standard BPE semantics)."""
    merged = a + b
    return F.aggregate(
        tokens,
        F.expr("CAST(array() AS array<string>)"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (x == F.lit(b)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def word_frequencies(df: DataFrame, text_col: str) -> DataFrame:
    """One corpus scan → (word, count, toks=char array). This is the
    only operator that reads the corpus."""
    return (
        df.select(
            F.explode(
                ws_tokens(F.col(text_col))
            ).alias("word")
        )
        .where(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("count"))
        .withColumn("toks", _chars(F.col("word")))
    )


def train_bpe(
    df: DataFrame, text_col: str, num_merges: int
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` merge rules; returns them in order."""
    words = word_frequencies(df, text_col).localCheckpoint(eager=True)
    merges: list[tuple[str, str]] = []
    pair = F.transform(
        F.slice(F.col("toks"), 1, F.size("toks") - 1),
        lambda t, i: F.struct(
            t.alias("a"), F.element_at(F.col("toks"), i + 2).alias("b")
        ),
    )
    for _ in range(num_merges):
        top = (
            words.select("count", F.explode(pair).alias("p"))
            .groupBy("p.a", "p.b")
            .agg(F.sum("count").alias("n"))
            .orderBy(F.desc("n"), "a", "b")
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b = top[0].a, top[0].b
        merges.append((a, b))
        folded = words.withColumn(
            "toks", _merge_fold(F.col("toks"), a, b)
        ).localCheckpoint(eager=True)
        # the new checkpoint has materialized — the previous round's
        # blocks have no readers left; free them now (they otherwise
        # accumulate one pinned table per merge for the session's life)
        free_local_checkpoint(words)
        words = folded
    free_local_checkpoint(words)  # only the merge list leaves this fn
    return merges


def apply_bpe(
    df: DataFrame, text_col: str, merges: list[tuple[str, str]]
) -> DataFrame:
    """``df`` + ``bpe_tokens`` (array) + ``n_bpe_tokens`` — the learned
    segmentation applied to whole texts, merges in training order.
    Merge rules are literals folded into the expression tree (k nested
    folds over each word's char array; keep k modest or pre-segment to
    distinct words and join back for very large k)."""
    words = ws_tokens(F.col(text_col))
    seg = F.transform(words, lambda w: _apply_to_word(w, merges))
    toks = F.flatten(seg)
    return df.withColumn("bpe_tokens", toks).withColumn(
        "n_bpe_tokens", F.size("bpe_tokens")
    )


def _apply_to_word(word: Column, merges: list[tuple[str, str]]) -> Column:
    out = _chars(word)
    for a, b in merges:
        out = _merge_fold(out, a, b)
    return out
