"""Hive-metastore catalog parity (X3): the reference points Spark at an
external (Glue) metastore purely via ``spark/conf/hive-site.xml:4-15``;
our DDL path must therefore also work against a real Hive metastore,
not just Spark's in-memory catalog.

Runs in a subprocess: ``enableHiveSupport()`` + a Derby-backed
metastore can't coexist with the session-scoped in-memory-catalog
fixture in one JVM, and Derby allows a single process per metastore db.
"""

from __future__ import annotations

import os
import subprocess
import sys
import textwrap

SCRIPT = textwrap.dedent(
    """
    import sys
    sys.path.insert(0, {repo!r})
    from pyspark.sql import SparkSession
    from data_lakehouse_project_spark.operators.catalog import (
        register_external_table, refresh_table, table_rowcount,
    )

    wh = {wh!r}
    spark = (
        SparkSession.builder.master("local[2]")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.sql.warehouse.dir", wh + "/warehouse")
        .config("spark.ui.enabled", "false")
        .config(
            "spark.hadoop.javax.jdo.option.ConnectionURL",
            "jdbc:derby:" + wh + "/metastore_db;create=true",
        )
        .enableHiveSupport()
        .appName("hive-catalog-test")
        .getOrCreate()
    )
    assert spark.conf.get("spark.sql.catalogImplementation") == "hive"

    data = wh + "/gold_daily"
    spark.range(10).selectExpr(
        "id", "cast(id * 2 as double) as total"
    ).write.mode("overwrite").parquet(data)

    register_external_table(spark, "lakehouse_hive", "gold_daily", data)
    refresh_table(spark, "lakehouse_hive", "gold_daily")
    assert table_rowcount(spark, "lakehouse_hive", "gold_daily") == 10

    # round-trip: a FRESH view of the catalog (new session over the same
    # metastore) still resolves the table — metadata truly persisted
    s2 = spark.newSession()
    assert s2.table("lakehouse_hive.gold_daily").count() == 10
    tables = [t.name for t in s2.catalog.listTables("lakehouse_hive")]
    assert "gold_daily" in tables
    spark.sql("DROP TABLE lakehouse_hive.gold_daily")
    spark.sql("DROP DATABASE lakehouse_hive")
    spark.stop()
    print("HIVE_CATALOG_OK")
    """
)


def test_hive_metastore_register_roundtrip(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, "-c", SCRIPT.format(repo=repo, wh=str(tmp_path))],
        capture_output=True,
        text=True,
        timeout=300,
        cwd=str(tmp_path),  # keep derby.log etc. out of the repo
    )
    assert "HIVE_CATALOG_OK" in proc.stdout, proc.stderr[-3000:]
