"""Change tracking: snapshot diff (CDC) and SCD Type-2 history merge.

Two staples of lakehouse dimension management the reference never reaches
(its silver layer is stateless overwrite):

- ``snapshot_diff``: classify rows between two table snapshots as
  insert / delete / update. Change detection hashes all non-key columns
  into one 64-bit fingerprint, so the join compares 8 bytes instead of
  every attribute — the shuffle carries keys + hash only.
- ``scd2_merge``: apply a batch of updates to a Type-2 history table
  (valid_from / valid_to / is_current), closing out changed versions and
  appending new ones. Pure joins + unions: one shuffle on the business
  key, no iterative driver logic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _row_hash(df: DataFrame, cols: list[str]):
    return F.xxhash64(*[F.col(c) for c in cols])


def snapshot_diff(
    old: DataFrame, new: DataFrame, keys: list[str]
) -> DataFrame:
    """Rows of `new`/`old` labeled with change_type ∈ insert|delete|update.

    Output columns: the table's columns + change_type — updated/inserted
    rows carry the NEW values, deleted rows the OLD values.
    """
    attrs = [c for c in new.columns if c not in keys]
    old_h = old.withColumn("_h", _row_hash(old, attrs))
    new_h = new.withColumn("_h", _row_hash(new, attrs))

    inserts = new_h.join(old_h.select(*keys), keys, "left_anti").withColumn(
        "change_type", F.lit("insert")
    )
    deletes = old_h.join(new_h.select(*keys), keys, "left_anti").withColumn(
        "change_type", F.lit("delete")
    )
    updates = (
        new_h.alias("n")
        .join(old_h.select(*keys, "_h").alias("o"), keys)
        .where(F.col("n._h") != F.col("o._h"))
        .select(*[f"n.{c}" for c in new_h.columns])
        .withColumn("change_type", F.lit("update"))
    )
    return (
        inserts.unionByName(deletes).unionByName(updates).drop("_h")
    )


def scd2_init(source: DataFrame, ts_col: str) -> DataFrame:
    """Bootstrap a Type-2 dimension from an initial snapshot."""
    return (
        source.withColumn("valid_from", F.col(ts_col).cast("timestamp"))
        .withColumn("valid_to", F.lit(None).cast("timestamp"))
        .withColumn("is_current", F.lit(True))
        .drop(ts_col)
    )


def scd2_merge(
    dim: DataFrame,
    updates: DataFrame,
    keys: list[str],
    ts_col: str = "effective_ts",
) -> DataFrame:
    """Apply ``updates`` (business key + attrs + effective_ts) to a Type-2
    dimension (attrs + valid_from / valid_to / is_current).

    - unchanged current rows and all history rows pass through untouched
    - changed current rows get valid_to = effective_ts, is_current = false
    - changed/new keys append a fresh current version
    """
    attrs = [c for c in updates.columns if c not in keys and c != ts_col]
    upd = updates.withColumn("_uh", _row_hash(updates, attrs))
    cur = dim.where(F.col("is_current")).withColumn("_ch", _row_hash(dim, attrs))
    history = dim.where(~F.col("is_current"))

    joined = cur.alias("c").join(
        upd.select(*keys, ts_col, "_uh").alias("u"), keys, "left"
    )
    unchanged_cur = joined.where(
        F.col("u._uh").isNull() | (F.col("u._uh") == F.col("c._ch"))
    ).select(*[f"c.{c}" for c in dim.columns])
    closed = (
        joined.where(F.col("u._uh").isNotNull() & (F.col("u._uh") != F.col("c._ch")))
        .select(
            *[f"c.{c}" for c in dim.columns if c not in ("valid_to", "is_current")],
            F.col(f"u.{ts_col}").cast("timestamp").alias("valid_to"),
        )
        .withColumn("is_current", F.lit(False))
        .select(*dim.columns)
    )

    # new versions: updates whose key is absent from current OR changed
    upd_new = (
        upd.alias("u")
        .join(cur.select(*keys, "_ch").alias("c"), keys, "left")
        .where(F.col("c._ch").isNull() | (F.col("u._uh") != F.col("c._ch")))
        .select(*[f"u.{c}" for c in updates.columns])
    )
    fresh = scd2_init(upd_new, ts_col).select(*dim.columns)

    return history.unionByName(unchanged_cur).unionByName(closed).unionByName(fresh)
