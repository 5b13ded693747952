"""Table maintenance: compaction and sort-clustering (Z-order).

The small-files problem is the silent killer of parquet lakehouses —
streaming/incremental writers leave thousands of KB-sized files and scan
planning drowns in footer reads. ``compact`` rewrites a table to a target
file size; ``cluster_by`` additionally range-partitions + sorts so
min/max column statistics become selective (parquet row-group skipping),
with an optional 2-column Z-order interleave for multi-dimensional
pruning — all with plain DataFrame ops, no table-format dependency.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from data_lakehouse_project_spark.cacheutil import free_local_checkpoint


def _dir_size_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f))
    return total


def data_file_count(path: str) -> int:
    n = 0
    for _root, _dirs, files in os.walk(path):
        n += sum(1 for f in files if f.endswith(".parquet"))
    return n


def compact(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    fmt: str = "parquet",
) -> int:
    """Rewrite the table at ``path`` into ~target_file_bytes files.

    File count is sized from the table's current on-disk bytes; the
    rewrite is one pass (read → repartition → overwrite staged through a
    local checkpoint so the source can be overwritten). Returns the new
    data file count.
    """
    size = _dir_size_bytes(path)
    n_files = max(1, round(size / target_file_bytes))
    df = spark.read.format(fmt).load(path).repartition(n_files)
    df = df.localCheckpoint(eager=True)
    df.write.mode("overwrite").format(fmt).save(path)
    free_local_checkpoint(df)  # the write was the last reader
    return data_file_count(path)


def zorder_key(c1: Column, c2: Column, bits: int = 16) -> Column:
    """Interleave the low ``bits`` of two non-negative ints → Z-curve key.

    Pure JVM bit expressions (unrolled shifts); rows close on the Z-curve
    are close in BOTH dimensions, so range-partitioning by this key gives
    min/max pruning on either column.
    """
    out = F.lit(0).cast("long")
    a = c1.cast("long").bitwiseAND(F.lit((1 << bits) - 1))
    b = c2.cast("long").bitwiseAND(F.lit((1 << bits) - 1))
    for i in range(bits):
        out = out.bitwiseOR(
            F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i)
        )
        out = out.bitwiseOR(
            F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return out


def cluster_by(
    spark: SparkSession,
    path: str,
    cols: list[str],
    n_files: int = 8,
    zorder: bool = False,
    fmt: str = "parquet",
) -> None:
    """Rewrite sorted/clustered by ``cols`` for stats-based data skipping.

    Plain mode: repartitionByRange + sortWithinPartitions on the columns —
    each output file covers a narrow value range, so filters on the lead
    column prune files via parquet min/max. ``zorder=True`` (exactly two
    int-ish columns) clusters on the interleaved key so EITHER column
    prunes.
    """
    df = spark.read.format(fmt).load(path)
    if zorder:
        if len(cols) != 2:
            raise ValueError("zorder clustering takes exactly two columns")
        key = zorder_key(F.col(cols[0]), F.col(cols[1]))
        df = (
            df.withColumn("_zk", key)
            .repartitionByRange(n_files, "_zk")
            .sortWithinPartitions("_zk")
            .drop("_zk")
        )
    else:
        df = df.repartitionByRange(n_files, *cols).sortWithinPartitions(*cols)
    df = df.localCheckpoint(eager=True)
    df.write.mode("overwrite").format(fmt).save(path)
    free_local_checkpoint(df)  # the write was the last reader


def delete_where(
    spark: SparkSession,
    path: str,
    predicate: Column,
    partition_by: list[str] | None = None,
) -> int:
    """Row-level delete on a parquet table (the GDPR/right-to-be-
    forgotten primitive a training-data lakehouse cannot ship without):
    rewrite the table keeping only rows NOT matching ``predicate``.

    Without a transactional table format this is copy-on-write over the
    whole table; with Delta available the same call routes to its native
    DELETE (deletion-vector / partition-pruned rewrite). On a partitioned
    table pass ``partition_by`` so the rewrite preserves the layout; at
    scale, make the predicate include the partition column where
    possible so pruning bounds the rewrite to affected partitions.

    Returns the number of rows deleted. Staged via a temp directory +
    atomic rename so a mid-rewrite failure never truncates the table.
    """
    import shutil
    import uuid

    df = spark.read.parquet(path)
    n_before = df.count()
    survivors = df.where(~predicate | predicate.isNull())
    tmp = f"{path.rstrip('/')}__rewrite_{uuid.uuid4().hex[:8]}"
    writer = survivors.write.mode("overwrite").format("parquet")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(tmp)
    n_after = spark.read.parquet(tmp).count()
    shutil.rmtree(path)
    os.rename(tmp, path)
    return n_before - n_after


def retention_sweep(
    spark: SparkSession,
    path: str,
    ts_col: str,
    keep_after: str,
    partition_by: list[str] | None = None,
) -> int:
    """Delete rows older than ``keep_after`` (ISO timestamp string) —
    the time-based retention policy. Same copy-on-write contract as
    ``delete_where``; on a time-partitioned table the predicate prunes
    to expired partitions only."""
    return delete_where(
        spark,
        path,
        F.col(ts_col) < F.lit(keep_after).cast("timestamp"),
        partition_by=partition_by,
    )
