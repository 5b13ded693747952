"""Sequence packing for LLM training batches.

Two packing disciplines, both deterministic:

- **Concat-and-chunk** (``pack_sequential_chunks``): documents are
  concatenated in a stable order inside each group and cut at fixed
  token-budget boundaries (GPT-style packing — documents may straddle a
  boundary and the straddle is flagged). Pure window arithmetic
  (exclusive running sum → floor-divide by budget): one shuffle per
  group partition, SQL-expressible, oracle-checkable.
- **Greedy no-straddle bins** (``pack_greedy``): first-fit-decreasing
  within deterministic hash groups via ``applyInPandas`` — real bin
  packing (no document crosses a pack boundary; oversize documents get
  singleton packs). Greedy packing is inherently sequential, so the
  scale shape is salt-into-groups → pack within group: each group's
  work is independent, pack ids are globally unique by construction,
  and packing quality degrades only marginally vs a global pass.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from data_lakehouse_project_spark.ext.sampling import hash_bucket


def pack_sequential_chunks(
    df: DataFrame,
    id_col: str,
    length_col: str,
    budget: int,
    group_col: str | None = None,
) -> DataFrame:
    """Concat-and-chunk packing: stable order by id within each group,
    exclusive running length sum = the document's start offset, chunk =
    floor(start / budget). ``straddles`` marks documents crossing a
    chunk boundary (their attention would be split in training).

    Groups (e.g. language) bound the window sort; without a group the
    global order is a single-task sort — fine for oracles, wrong at
    scale.
    """
    part = [group_col] if group_col else [F.lit(1)]
    w = (
        Window.partitionBy(*part)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ln = F.greatest(F.col(length_col), F.lit(1))
    start = F.coalesce(F.sum(ln).over(w), F.lit(0)).cast("long")
    cols = [id_col] + ([group_col] if group_col else [])
    return df.select(
        *cols,
        F.col(length_col).alias("length"),
        F.floor(start / budget).cast("long").alias("chunk_id"),
        (F.floor(start / budget) != F.floor((start + ln - 1) / budget)).alias(
            "straddles"
        ),
    )


def pack_greedy(
    df: DataFrame,
    id_col: str,
    length_col: str,
    budget: int,
    num_groups: int = 64,
) -> DataFrame:
    """First-fit-decreasing bin packing within deterministic hash groups.

    Returns (id, group_id, pack_id, length) with pack_id globally
    unique; sum(length) per pack ≤ budget except singleton packs of
    oversize documents. Deterministic: group = md5-bucket of the id,
    in-group order = (length desc, id) — independent of partitioning.
    """

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["length", "gid"], ascending=[False, True])
        gid = int(pdf["grp"].iloc[0])
        packs: list[int] = []  # remaining capacity per local pack
        assigned = []
        for ln in pdf["length"]:
            ln = int(ln)
            placed = None
            if ln <= budget:
                for i, rem in enumerate(packs):
                    if rem >= ln:
                        placed, packs[i] = i, rem - ln
                        break
            if placed is None:
                placed = len(packs)
                packs.append(max(budget - ln, 0))
            assigned.append(placed)
        pdf = pdf.assign(
            pack_id=[gid * 1_000_000 + a for a in assigned], group_id=gid
        )
        return pdf[["gid", "group_id", "pack_id", "length"]]

    prepared = df.select(
        F.col(id_col).alias("gid"),
        F.greatest(F.col(length_col), F.lit(1)).cast("long").alias("length"),
        (hash_bucket(F.col(id_col)) % num_groups).alias("grp"),
    )
    out = prepared.groupBy("grp").applyInPandas(
        _pack, "gid long, group_id long, pack_id long, length long"
    )
    return out.withColumnRenamed("gid", id_col)


def chunk_with_overlap(
    df: DataFrame,
    text_col: str,
    id_col: str,
    chunk_tokens: int,
    overlap_tokens: int = 0,
) -> DataFrame:
    """Split each document into token-window chunks with overlap — the
    RAG-ingestion primitive (sliding windows keep context across chunk
    boundaries). Returns (id, chunk_idx, n_tokens, chunk_text).

    Stride = chunk − overlap; chunk i covers tokens
    [i·stride, i·stride + chunk) and the last chunk is the remainder
    (never empty, never duplicated: a doc with ≤ chunk tokens yields
    exactly one chunk).

    Scale shape: pure JVM expression tree — tokenize once, build the
    chunk index with ``sequence``, slice per index with ``transform`` +
    ``slice``, then ONE posexplode. Map-only: no shuffle, no Python,
    no UDF; ~(n/stride) output rows per doc, each carrying only its
    slice (not the whole doc).
    """
    from data_lakehouse_project_spark.ext.text import ws_tokens

    if overlap_tokens >= chunk_tokens:
        raise ValueError("overlap must be smaller than the chunk size")
    stride = chunk_tokens - overlap_tokens
    toks = ws_tokens(F.col(text_col))
    n = F.size(toks)
    # number of windows: 1 + ceil(max(n - chunk, 0) / stride)
    n_chunks = (
        F.lit(1)
        + F.ceil(
            F.greatest(n - F.lit(chunk_tokens), F.lit(0)) / F.lit(stride)
        ).cast("int")
    )
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.slice(toks, i * stride + 1, chunk_tokens),
    )
    out = df.select(
        F.col(id_col),
        F.posexplode(chunks).alias("chunk_idx", "_toks"),
    )
    return out.select(
        id_col,
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.size("_toks").cast("long").alias("n_tokens"),
        F.array_join("_toks", " ").alias("chunk_text"),
    )
