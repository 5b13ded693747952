"""In-process pipeline runner — SURVEY §3 "new-engine lifecycle".

Collapses the reference's Airflow + staging-volume + `aws s3 sync`
orchestration (``airflow/dags/*.py``, SURVEY §2.2 K7) into a single
declarative pipeline: each stage is a pure ``DataFrame -> DataFrame``
function, so Catalyst sees one fused plan per materialization layer —
the same write boundaries as the reference (one per medallion layer),
with everything between them optimized as a unit.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

from data_lakehouse_project_spark.operators.catalog import register_external_table
from data_lakehouse_project_spark.operators.sinks import write_table


@dataclass
class Stage:
    """One medallion stage: transform, then optionally materialize.

    transform: pure DataFrame -> DataFrame (no actions inside)
    path: when set, the stage's output is written (parquet/delta) and
          re-read, creating a layer boundary exactly like the reference's
          bronze/silver/gold writes.
    """

    name: str
    transform: Callable[[DataFrame], DataFrame]
    path: str | None = None
    fmt: str = "parquet"
    partition_by: list[str] = field(default_factory=list)
    single_file: bool = False
    register_as: tuple[str, str] | None = None  # (database, table)


def _has_success_marker(spark: SparkSession, path: str) -> bool:
    """True when ``path`` holds a committed write (the ``_SUCCESS`` file
    Spark's output committer creates atomically at job commit). Resolved
    through the Hadoop FileSystem API so the check works on any
    supported store (local, HDFS, s3a), not just the local disk."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path.rstrip("/") + "/_SUCCESS")
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(p))


@dataclass
class StageResult:
    name: str
    action: str  # "computed" | "skipped" (resume hit) | "transformed"
    attempts: int


@dataclass
class Pipeline:
    """source -> [stage...]; run() returns the final DataFrame.

    Retry/resume semantics (the reference encodes these in its Airflow
    DAGs — ``airflow/dags/product_bronze_dag.py:18-47``: per-task
    ``retries``, pre-task cleanup, overwrite-idempotent writes):

    - **retry**: each materializing stage is retried up to ``retries``
      extra times. Writes are overwrite-mode, so a failed attempt's
      partial output is replaced wholesale — no cleanup task needed
      (the reference's pre-task ``rm``/``aws s3 sync`` collapses into
      the committer's overwrite).
    - **resume**: with ``resume=True``, a stage whose target already
      holds a *committed* write (``_SUCCESS`` marker — written
      atomically at job commit, so a crash mid-write never leaves one)
      is not recomputed; its output is read back and the pipeline
      continues downstream. Rerunning a killed pipeline therefore
      redoes only the failed stage onward and converges to the same
      gold output as an uninterrupted run.
    """

    source: Callable[[SparkSession], DataFrame]
    stages: list[Stage]

    def run(
        self,
        spark: SparkSession,
        verify: bool = False,
        retries: int = 0,
        resume: bool = False,
        report: list[StageResult] | None = None,
    ) -> DataFrame:
        df = self.source(spark)
        for stage in self.stages:
            if stage.path is None:
                df = stage.transform(df)
                if report is not None:
                    report.append(StageResult(stage.name, "transformed", 1))
                continue
            if resume and _has_success_marker(spark, stage.path):
                # committed output from a prior run — skip recompute
                df = spark.read.format(stage.fmt).load(stage.path)
                if report is not None:
                    report.append(StageResult(stage.name, "skipped", 0))
                continue
            attempts = 0
            while True:
                attempts += 1
                try:
                    out = stage.transform(df)
                    write_table(
                        out,
                        stage.path,
                        fmt=stage.fmt,
                        partition_by=stage.partition_by or None,
                        single_file=stage.single_file,
                        verify=verify,
                    )
                    break
                except Exception:
                    if attempts > retries:
                        raise
            df = spark.read.format(stage.fmt).load(stage.path)
            if stage.register_as:
                db, tbl = stage.register_as
                register_external_table(spark, db, tbl, stage.path, stage.fmt)
            if report is not None:
                report.append(StageResult(stage.name, "computed", attempts))
        return df
