"""Catalog registration — SURVEY §2.2 K4/K5.

The reference registers gold tables twice: via boto3 Glue calls
(``mysql_gold_aggregation.py:15-77``) and via Spark SQL DDL
(``mysql_gold_aggregation.py:160-176``). The boto3 path is AWS plumbing,
not query semantics — Spark's session catalog DDL subsumes it (SURVEY §2.2
K4 note), and on a Glue-backed deployment the same DDL lands in Glue via
``hive-site.xml`` config alone.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def ensure_database(spark: SparkSession, database: str) -> None:
    """CREATE DATABASE IF NOT EXISTS (ref mysql_gold_aggregation.py:160)."""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {database}")


def register_external_table(
    spark: SparkSession,
    database: str,
    table: str,
    location: str,
    fmt: str = "PARQUET",
    columns_ddl: str | None = None,
) -> None:
    """CREATE TABLE IF NOT EXISTS ... USING <fmt> LOCATION ...

    Ref: mysql_gold_aggregation.py:168-176 (explicit column DDL + location).
    When ``columns_ddl`` is None the schema comes from the files (parquet /
    delta are self-describing).
    """
    ensure_database(spark, database)
    cols = f" ({columns_ddl})" if columns_ddl else ""
    spark.sql(
        f"CREATE TABLE IF NOT EXISTS {database}.{table}{cols} "
        f"USING {fmt} LOCATION '{location}'"
    )


def refresh_table(spark: SparkSession, database: str, table: str) -> None:
    """REFRESH TABLE (ref mysql_gold_aggregation.py:164)."""
    spark.sql(f"REFRESH TABLE {database}.{table}")


def table_rowcount(spark: SparkSession, database: str, table: str) -> int:
    """Catalog-scan verification count (ref mysql_gold_aggregation.py:179-181)."""
    return spark.table(f"{database}.{table}").count()
