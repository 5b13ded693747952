"""SparkSession factory.

The reference builds a session per job with AQE + partition coalescing and
S3A/Glue wiring (``spark/jobs/mysql_bronze_ingestion.py:17-27``,
``spark/conf/hive-site.xml:4-15``). We keep the semantics (AQE on, explicit
shuffle sizing, optional external-catalog/table-format extensions) and drop
the infra-specific S3/Glue endpoint plumbing, which is deployment config,
not engine semantics.

Scale posture (100 TB design, tested on local[32]):

- AQE on with partition coalescing and skew-join handling: runtime re-plan
  is the single highest-leverage knob at 1000-executor scale.
- ``spark.sql.shuffle.partitions`` defaults from ``SPARK_GRAFT_CPUS``
  locally; on a real cluster AQE's coalescing makes the initial number a
  ceiling, not a tuning hazard.
- Arrow enabled so any unavoidable Python stage (Pandas UDFs in ``ext/``)
  pays batch-transfer cost, not per-row pickling.
- Session timezone pinned to UTC so date/timestamp functions are
  deterministic across driver environments (and match the DuckDB oracle).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Optional table-format extensions (Delta / Iceberg). Config-only per
# SURVEY §4: no custom Catalyst code. Applied when the packages are
# importable; silently skipped offline.
_DELTA_CONF = {
    "spark.sql.extensions": "io.delta.sql.DeltaSparkSessionExtension",
    "spark.sql.catalog.spark_catalog": "org.apache.spark.sql.delta.catalog.DeltaCatalog",
}


def delta_available() -> bool:
    """True when the delta-spark python bindings are importable."""
    try:
        import delta  # noqa: F401

        return True
    except ImportError:
        return False


def default_parallelism() -> int:
    """Local core budget: $SPARK_GRAFT_CPUS, else all cores."""
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))


def get_spark(
    app_name: str = "data-lakehouse-project-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    enable_delta: bool = False,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for this engine.

    Matches the reference's session shape (AQE + coalescing, snappy parquet)
    while adding scale-safe defaults the reference lacks (skew-join
    handling, Arrow, UTC session timezone).
    """
    cpus = default_parallelism()
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        # AQE: reference sets these explicitly (mysql_bronze_ingestion.py:20-21)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.parquet.compression.codec", "snappy")
        # keep scans right-sized so a 100 TB table splits into sane tasks
        .config("spark.sql.files.maxPartitionBytes", "128m")
        # TIMESTAMP(NANOS) parquet (e.g. pandas-written event streams) is
        # unreadable by Spark natively; surface as long and convert in the
        # reader (sources.readers.load_testdata)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
    )
    if enable_delta and delta_available():
        for k, v in _DELTA_CONF.items():
            builder = builder.config(k, v)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
