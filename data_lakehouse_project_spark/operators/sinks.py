"""Sinks — SURVEY §2.2 (K1-K3, K6), scale-hardened.

Ref semantics: snappy-parquet overwrite (``mysql_bronze_ingestion.py:
103-113``), ``partitionBy`` (``silver_transformation.py:61-64``),
``coalesce(1)`` small-gold consolidation (``gold_aggregation.py:111``),
post-write verification count (``mysql_bronze_ingestion.py:117-120``).

Scale posture: ``single_file`` is an explicit opt-in (the reference
hard-codes coalesce(1) for gold — fatal at 100 TB); the default lets AQE
coalescing pick output partition counts. Delta/Iceberg formats pass
straight through ``fmt`` per BASELINE.json's north star; when the package
isn't on the classpath the engine falls back to parquet with identical
call semantics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession

from data_lakehouse_project_spark.session import delta_available


def resolve_format(fmt: str) -> str:
    """'delta' degrades to 'parquet' when delta-spark isn't installed."""
    if fmt == "delta" and not delta_available():
        return "parquet"
    return fmt


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    single_file: bool = False,
    compression: str = "snappy",
    verify: bool = False,
    bucket_by: tuple[int, list[str]] | None = None,
    table_name: str | None = None,
) -> int | None:
    """Write a layer table; returns the verification count when verify=True.

    - overwrite mode == idempotent rerun (the reference's contract, K1/K7)
    - ``bucket_by=(n, cols)`` enables shuffle-free co-located joins for
      repeatedly-joined fact tables (requires ``table_name`` / saveAsTable)
    - ``fmt="delta-lite"`` routes through the homegrown ACID commit log
      (operators/txnlog.py): atomic publish, time travel, stats pruning —
      the offline stand-in for the real Delta/Iceberg packages.
    """
    if fmt == "delta-lite":
        from data_lakehouse_project_spark.operators.txnlog import TxnTable

        TxnTable(path).write(df, mode=mode, partition_by=partition_by)
        if verify:
            return TxnTable(path).read(df.sparkSession).count()
        return None
    out = df.coalesce(1) if single_file else df
    writer = (
        out.write.mode(mode)
        .format(resolve_format(fmt))
        .option("compression", compression)
    )
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if bucket_by:
        if not table_name:
            raise ValueError("bucket_by requires table_name (saveAsTable)")
        n, cols = bucket_by
        writer.bucketBy(n, *cols).sortBy(*cols).option("path", path).saveAsTable(
            table_name
        )
    else:
        writer.save(path)
    if verify:
        spark: SparkSession = df.sparkSession
        return spark.read.format(resolve_format(fmt)).load(path).count()
    return None


def observed_write(
    df: DataFrame,
    path: str,
    metrics: dict[str, Column],
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> dict:
    """Write a table and collect inline metrics in the SAME pass via the
    Observation API — replaces the reference's post-write verification
    re-read (K6, mysql_bronze_ingestion.py:117-120) with zero extra
    scans: the metrics accumulate on the executors while rows stream to
    the sink. Returns the observed metric dict.
    """
    from pyspark.sql import Observation

    obs = Observation("write_metrics")
    observed = df.observe(obs, *[c.alias(n) for n, c in metrics.items()])
    writer = observed.write.mode(mode).format(fmt)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)
    return obs.get
