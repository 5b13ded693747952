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
