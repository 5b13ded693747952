"""Pipeline retry/resume semantics (reference DAG behavior:
``airflow/dags/product_bronze_dag.py:18-47`` — per-task retries +
overwrite-idempotent reruns).

Covers: transient-failure retry, mid-pipeline kill → resume skips the
committed stage and converges to the same gold as an uninterrupted run,
and _SUCCESS-gated resume (an uncommitted partial write is recomputed).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_lakehouse_project_spark.plans import Pipeline, Stage
from data_lakehouse_project_spark.plans.pipeline import (
    StageResult,
    _has_success_marker,
)


def _source(spark):
    return spark.range(100).select(
        F.col("id"),
        (F.col("id") % 7).alias("bucket"),
        (F.col("id") * 2).alias("value"),
    )


def _gold(df):
    return df.groupBy("bucket").agg(F.sum("value").alias("total"))


def test_retry_recovers_from_transient_failure(spark, tmp_path):
    calls = {"n": 0}

    def flaky_silver(df):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("transient executor loss")
        return df.where(F.col("id") < 50)

    report: list[StageResult] = []
    pipe = Pipeline(
        source=_source,
        stages=[
            Stage("silver", flaky_silver, path=str(tmp_path / "silver")),
            Stage("gold", _gold, path=str(tmp_path / "gold")),
        ],
    )
    out = pipe.run(spark, retries=1, report=report)
    assert calls["n"] == 2
    assert report[0].attempts == 2 and report[0].action == "computed"
    assert out.agg(F.sum("total")).first()[0] == sum(2 * i for i in range(50))


def test_kill_midway_then_resume_matches_clean_run(spark, tmp_path):
    boom = {"armed": True}

    def gold_maybe_boom(df):
        if boom["armed"]:
            raise RuntimeError("killed mid-pipeline")
        return _gold(df)

    stages = lambda root: [  # noqa: E731
        Stage("silver", lambda df: df.where(F.col("id") < 50),
              path=str(root / "silver")),
        Stage("gold", gold_maybe_boom, path=str(root / "gold")),
    ]

    pipe = Pipeline(source=_source, stages=stages(tmp_path))
    with pytest.raises(RuntimeError):
        pipe.run(spark)
    # silver committed before the crash; gold never got a _SUCCESS
    assert _has_success_marker(spark, str(tmp_path / "silver"))
    assert not _has_success_marker(spark, str(tmp_path / "gold"))

    boom["armed"] = False
    report: list[StageResult] = []
    out = pipe.run(spark, resume=True, report=report)
    assert [r.action for r in report] == ["skipped", "computed"]

    # uninterrupted control run in a fresh root → identical gold
    clean_root = tmp_path / "clean"
    control = Pipeline(source=_source, stages=stages(clean_root)).run(spark)
    assert sorted(map(tuple, out.collect())) == sorted(
        map(tuple, control.collect())
    )


def test_resume_false_recomputes_everything(spark, tmp_path):
    runs = {"silver": 0}

    def counting_silver(df):
        runs["silver"] += 1
        return df

    pipe = Pipeline(
        source=_source,
        stages=[Stage("silver", counting_silver, path=str(tmp_path / "s"))],
    )
    pipe.run(spark)
    pipe.run(spark)  # overwrite-idempotent full rerun
    assert runs["silver"] == 2
    pipe.run(spark, resume=True)  # committed → skipped
    assert runs["silver"] == 2
