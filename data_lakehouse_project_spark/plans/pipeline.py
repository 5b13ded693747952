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


@dataclass
class Pipeline:
    """source -> [stage...]; run() returns the final DataFrame."""

    source: Callable[[SparkSession], DataFrame]
    stages: list[Stage]

    def run(self, spark: SparkSession, verify: bool = False) -> DataFrame:
        df = self.source(spark)
        for stage in self.stages:
            df = stage.transform(df)
            if stage.path:
                write_table(
                    df,
                    stage.path,
                    fmt=stage.fmt,
                    partition_by=stage.partition_by or None,
                    single_file=stage.single_file,
                    verify=verify,
                )
                df = spark.read.format(stage.fmt).load(stage.path)
                if stage.register_as:
                    db, tbl = stage.register_as
                    register_external_table(spark, db, tbl, stage.path, stage.fmt)
        return df
