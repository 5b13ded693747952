"""Table-format upsert/merge — the Delta/Iceberg-style mutation surface
(BASELINE.json north star) with a parquet fallback.

When delta-spark is on the classpath, ``merge_into_path`` uses the real
``DeltaTable.merge`` (transactional, file-level pruning). Offline, the
same call degrades to a read-merge-overwrite cycle with identical
semantics: source rows replace key-matched target rows, unmatched source
rows append.

Scale notes for the fallback path: the anti-join is key-only (project
keys before joining — never shuffle full rows twice), and rewrite cost is
one pass; for partitioned tables pass ``partition_by`` so the overwrite
can use dynamic partition overwrite (rewrites only touched partitions).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from data_lakehouse_project_spark.cacheutil import free_local_checkpoint
from data_lakehouse_project_spark.session import delta_available


def merge_upsert(target: DataFrame, source: DataFrame, keys: list[str]) -> DataFrame:
    """Pure-DataFrame MERGE: source wins on key match, else union.

    Equivalent to ``MERGE INTO t USING s ON <keys> WHEN MATCHED THEN
    UPDATE SET * WHEN NOT MATCHED THEN INSERT *``. One shuffle on the
    keys (the anti-join); the union is free.
    """
    keep = target.join(source.select(*keys), keys, "left_anti")
    return keep.unionByName(source)


def merge_into_path(
    spark: SparkSession,
    path: str,
    source: DataFrame,
    keys: list[str],
    fmt: str = "delta",
    partition_by: list[str] | None = None,
) -> None:
    """Upsert ``source`` into the table at ``path``.

    Delta path: transactional MERGE (file-pruned). ``fmt="delta-lite"``:
    transactional MERGE through the homegrown commit log (atomic
    publish + optimistic conflict detection, operators/txnlog.py) — no
    self-overwrite hazard because data files are immutable. Parquet
    fallback: read → merge_upsert → overwrite (dynamic partition
    overwrite when partitioned, so only touched partitions rewrite).
    """
    if fmt == "delta-lite":
        from data_lakehouse_project_spark.operators.txnlog import TxnTable

        t = TxnTable(path)
        if t.latest_version() < 0:
            t.write(source, mode="overwrite", partition_by=partition_by)
        else:
            t.merge(source, keys)
        return
    if fmt == "delta" and delta_available():
        from delta.tables import DeltaTable

        if DeltaTable.isDeltaTable(spark, path):
            tgt = DeltaTable.forPath(spark, path)
            cond = " AND ".join(f"t.{k} = s.{k}" for k in keys)
            (
                tgt.alias("t")
                .merge(source.alias("s"), cond)
                .whenMatchedUpdateAll()
                .whenNotMatchedInsertAll()
                .execute()
            )
            return
        source.write.format("delta").mode("overwrite").save(path)
        return

    # parquet fallback
    if os.path.exists(path):
        target = spark.read.parquet(path)
        merged = merge_upsert(target, source, keys)
    else:
        merged = source
    writer = merged.write.mode("overwrite")
    if partition_by:
        writer = writer.option("partitionOverwriteMode", "dynamic").partitionBy(
            *partition_by
        )
    # materialize before overwriting the path we read from (self-overwrite
    # guard): parquet reads are lazy, so stage through a local checkpoint
    staged = None
    if os.path.exists(path):
        staged = merged = merged.localCheckpoint(eager=True)
        writer = merged.write.mode("overwrite")
        if partition_by:
            writer = writer.option(
                "partitionOverwriteMode", "dynamic"
            ).partitionBy(*partition_by)
    writer.parquet(path)
    if staged is not None:
        free_local_checkpoint(staged)  # the write was the last reader
