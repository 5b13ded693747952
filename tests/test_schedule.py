"""Scheduler layer (plans/schedule.py): cron semantics, the durable
last-fire ledger, catchup policies, and integration with the pipeline
runner's idempotent resume — the trigger surface of the reference's 10
Airflow DAG headers (airflow/dags/*.py)."""

from __future__ import annotations

from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F

from data_lakehouse_project_spark.plans.pipeline import Pipeline, Stage
from data_lakehouse_project_spark.plans.schedule import (
    CronSpec,
    ScheduledPipeline,
    Scheduler,
)


def _utc(*args):
    return datetime(*args, tzinfo=timezone.utc)


# ---------------------------------------------------------------- cron
def test_cron_parse_and_match_basics():
    c = CronSpec.parse("*/15 2-4 * * *")
    assert c.matches(_utc(2026, 8, 14, 2, 0))
    assert c.matches(_utc(2026, 8, 14, 4, 45))
    assert not c.matches(_utc(2026, 8, 14, 5, 0))
    assert not c.matches(_utc(2026, 8, 14, 3, 7))


def test_cron_next_fire_steps_and_rollover():
    c = CronSpec.parse("30 1 * * *")
    assert c.next_fire(_utc(2026, 8, 14, 1, 30)) == _utc(2026, 8, 15, 1, 30)
    assert c.next_fire(_utc(2026, 8, 14, 0, 0)) == _utc(2026, 8, 14, 1, 30)
    # month rollover + specific dom
    m = CronSpec.parse("0 0 1 * *")
    assert m.next_fire(_utc(2026, 8, 14)) == _utc(2026, 9, 1, 0, 0)
    # year rollover
    y = CronSpec.parse("0 0 1 1 *")
    assert y.next_fire(_utc(2026, 8, 14)) == _utc(2027, 1, 1, 0, 0)


def test_cron_dom_dow_or_rule():
    # POSIX: both restricted -> EITHER matches (the 13th OR a Friday)
    c = CronSpec.parse("0 0 13 * 5")
    assert c.matches(_utc(2026, 8, 13, 0, 0))  # a Thursday, dom hits
    assert c.matches(_utc(2026, 8, 14, 0, 0))  # a Friday, dow hits
    assert not c.matches(_utc(2026, 8, 15, 0, 0))  # Saturday the 15th
    # only dow restricted -> dow alone decides; 7 is a Sunday alias
    sun = CronSpec.parse("0 12 * * 7")
    assert sun.matches(_utc(2026, 8, 16, 12, 0))  # Sunday
    assert not sun.matches(_utc(2026, 8, 17, 12, 0))


def test_cron_aliases_and_errors():
    assert CronSpec.parse("@daily").expr == "@daily"
    assert CronSpec.parse("@daily").matches(_utc(2026, 1, 1, 0, 0))
    with pytest.raises(ValueError):
        CronSpec.parse("0 0 * *")  # 4 fields
    with pytest.raises(ValueError):
        CronSpec.parse("61 * * * *")
    with pytest.raises(ValueError):
        CronSpec.parse("0 0 30 2 *").next_fire(_utc(2026, 1, 1))


# ------------------------------------------------------------ scheduler
def _counting_sched(name, cron, fired, **kw):
    return ScheduledPipeline(
        name=name,
        cron=cron,
        run=lambda spark, ft: fired.append(ft),
        **kw,
    )


def test_tick_fires_once_and_ledger_survives_restart(tmp_path):
    state = str(tmp_path / "sched.json")
    fired = []
    s = Scheduler(state).add(
        _counting_sched("hourly", "0 * * * *", fired)
    )
    out = s.tick(None, _utc(2026, 8, 14, 10, 30))
    # no start_date + first sighting: nothing owed from the past
    assert out == {} and fired == []
    out = s.tick(None, _utc(2026, 8, 14, 11, 5))
    assert out == {"hourly": [_utc(2026, 8, 14, 11, 0)]}
    # same wall-clock again: already claimed
    assert s.tick(None, _utc(2026, 8, 14, 11, 5)) == {}
    # a NEW scheduler process over the same ledger does not re-fire
    s2 = Scheduler(state).add(
        _counting_sched("hourly", "0 * * * *", fired)
    )
    assert s2.tick(None, _utc(2026, 8, 14, 11, 59)) == {}
    assert s2.tick(None, _utc(2026, 8, 14, 12, 0)) == {
        "hourly": [_utc(2026, 8, 14, 12, 0)]
    }


def test_catchup_policies(tmp_path):
    fired_no, fired_yes = [], []
    s = (
        Scheduler(str(tmp_path / "s.json"))
        .add(
            _counting_sched(
                "latest_only",
                "0 * * * *",
                fired_no,
                start_date=_utc(2026, 8, 14, 0, 0),
            )
        )
        .add(
            _counting_sched(
                "replay_all",
                "0 * * * *",
                fired_yes,
                start_date=_utc(2026, 8, 14, 0, 0),
                catchup=True,
            )
        )
    )
    s.tick(None, _utc(2026, 8, 14, 3, 30))
    # catchup=False: 00,01,02,03 owed -> only the latest fires
    assert fired_no == [_utc(2026, 8, 14, 3, 0)]
    # catchup=True: every missed fire replays in order
    assert fired_yes == [
        _utc(2026, 8, 14, h, 0) for h in (0, 1, 2, 3)
    ]


def test_crash_before_claim_refires(tmp_path):
    state = str(tmp_path / "s.json")
    calls = []

    def boom(spark, ft):
        calls.append(ft)
        raise RuntimeError("executor lost")

    s = Scheduler(state).add(
        ScheduledPipeline(
            name="fragile",
            cron="0 * * * *",
            run=boom,
            start_date=_utc(2026, 8, 14, 9, 0),
        )
    )
    with pytest.raises(RuntimeError):
        s.tick(None, _utc(2026, 8, 14, 9, 0))
    # the fire was NOT claimed -> restart re-runs the same fire time
    ok = []
    s2 = Scheduler(state).add(
        _counting_sched(
            "fragile", "0 * * * *", ok, start_date=_utc(2026, 8, 14, 9, 0)
        )
    )
    s2.tick(None, _utc(2026, 8, 14, 9, 0))
    assert ok == calls == [_utc(2026, 8, 14, 9, 0)]


def test_backfill_does_not_advance_ledger(tmp_path):
    fired = []
    s = Scheduler(str(tmp_path / "s.json")).add(
        _counting_sched("daily", "0 0 * * *", fired)
    )
    fires = s.backfill(
        None, "daily", _utc(2026, 8, 1), _utc(2026, 8, 3, 12, 0)
    )
    assert fires == [_utc(2026, 8, d, 0, 0) for d in (1, 2, 3)]
    # ledger untouched: the live schedule still starts from "now"
    assert s.tick(None, _utc(2026, 8, 14, 10, 0)) == {}


# ------------------------------------------------- pipeline integration
def test_scheduled_pipeline_runs_with_resume(spark, tmp_path):
    gold = str(tmp_path / "gold")
    pipe = Pipeline(
        source=lambda sp: sp.range(100).withColumn(
            "bucket", F.pmod("id", F.lit(5))
        ),
        stages=[
            Stage(
                name="gold",
                transform=lambda df: df.groupBy("bucket").count(),
                path=gold,
            )
        ],
    )
    s = Scheduler(str(tmp_path / "s.json")).add(
        ScheduledPipeline(
            name="gold_daily",
            cron="0 0 * * *",
            run=pipe,
            start_date=_utc(2026, 8, 14, 0, 0),
        )
    )
    out = s.tick(spark, _utc(2026, 8, 14, 0, 0))
    assert out == {"gold_daily": [_utc(2026, 8, 14, 0, 0)]}
    assert spark.read.parquet(gold).count() == 5
