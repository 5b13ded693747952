"""Schedule/trigger surface over the pipeline runner — SURVEY §3.

The reference orchestrates with 10 Airflow DAGs
(``airflow/dags/*.py``), each declaring ``schedule``/``start_date``/
``catchup`` plus per-task retries (e.g. ``product_bronze_dag.py:18-47``,
``mysql_bronze_dag.py:8-10``); ``plans/pipeline.py`` already reproduces
the retry/resume/idempotence semantics per run. This module adds the
missing trigger layer: WHEN runs happen — standard 5-field cron specs,
a durable last-fire ledger so restarts neither re-run nor skip, and
deterministic catchup/backfill over missed fire times.

Deliberately driver-side and dependency-free (stdlib ``datetime`` +
``json``): scheduling is control-plane work — one tiny JSON state file
per schedule, exactly like the commit-log model of
``operators/txnlog.py``. The data plane stays in Spark. All times UTC,
minute granularity (Airflow's own floor).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from datetime import datetime, timedelta, timezone
from typing import Callable

_FIELDS = (
    ("minute", 0, 59),
    ("hour", 0, 23),
    ("dom", 1, 31),
    ("month", 1, 12),
    ("dow", 0, 6),  # 0 = Sunday (cron convention; 7 accepted as alias)
)

_ALIASES = {
    "@hourly": "0 * * * *",
    "@daily": "0 0 * * *",
    "@midnight": "0 0 * * *",
    "@weekly": "0 0 * * 0",
    "@monthly": "0 0 1 * *",
    "@yearly": "0 0 1 1 *",
    "@annually": "0 0 1 1 *",
}


def _parse_field(spec: str, lo: int, hi: int, name: str) -> frozenset[int]:
    """One cron field: ``*``, lists, ranges, steps (``*/5``, ``2-10/2``)."""
    out: set[int] = set()
    for part in spec.split(","):
        step = 1
        if "/" in part:
            part, step_s = part.split("/", 1)
            step = int(step_s)
            if step < 1:
                raise ValueError(f"{name}: step must be >= 1")
        top = 7 if name == "dow" else hi  # dow: 7 accepted (= Sunday)
        if part == "*":
            a, b = lo, hi
        elif "-" in part:
            a_s, b_s = part.split("-", 1)
            a, b = int(a_s), int(b_s)
        else:
            a = b = int(part)
        if not (lo <= a <= top and lo <= b <= top and a <= b):
            raise ValueError(f"{name}: '{part}' out of range [{lo},{top}]")
        vals = range(a, b + 1, step)
        if name == "dow":
            vals = [v % 7 for v in vals]  # 7 -> 0 (Sunday)
        out.update(vals)
    return frozenset(out)


@dataclass(frozen=True)
class CronSpec:
    """Parsed 5-field cron expression (minute hour dom month dow), UTC.

    Matching follows POSIX cron: when BOTH day-of-month and day-of-week
    are restricted (neither is ``*``), a time matches if EITHER does —
    the classic OR rule.
    """

    minute: frozenset[int]
    hour: frozenset[int]
    dom: frozenset[int]
    month: frozenset[int]
    dow: frozenset[int]
    dom_star: bool
    dow_star: bool
    expr: str

    @staticmethod
    def parse(expr: str) -> "CronSpec":
        raw = _ALIASES.get(expr.strip(), expr.strip())
        parts = raw.split()
        if len(parts) != 5:
            raise ValueError(
                f"cron '{expr}' must have 5 fields, got {len(parts)}"
            )
        vals = {}
        for (name, lo, hi), p in zip(_FIELDS, parts):
            vals[name] = _parse_field(p, lo, hi, name)
        return CronSpec(
            expr=expr,
            dom_star=parts[2] == "*",
            dow_star=parts[4] == "*",
            **vals,
        )

    def matches(self, t: datetime) -> bool:
        t = _floor_minute(t)
        if t.minute not in self.minute or t.hour not in self.hour:
            return False
        if t.month not in self.month:
            return False
        dom_ok = t.day in self.dom
        dow_ok = (t.isoweekday() % 7) in self.dow  # Sunday -> 0
        if self.dom_star and self.dow_star:
            return True
        if self.dom_star:
            return dow_ok
        if self.dow_star:
            return dom_ok
        return dom_ok or dow_ok

    def next_fire(self, after: datetime) -> datetime:
        """First matching minute strictly after ``after``.

        Minute-stepping with month/day skips — worst case (Feb 29
        schedules) still terminates within the 8-year leap cycle; a
        spec that can never match raises after that horizon.
        """
        t = _floor_minute(after) + timedelta(minutes=1)
        horizon = t + timedelta(days=366 * 8 + 2)
        while t < horizon:
            if t.month not in self.month:
                # jump to the 1st of the next month
                t = (t.replace(day=1, hour=0, minute=0) + timedelta(days=32)).replace(day=1)
                continue
            if not self._day_ok(t):
                t = (t + timedelta(days=1)).replace(hour=0, minute=0)
                continue
            if t.hour not in self.hour:
                t = (t + timedelta(hours=1)).replace(minute=0)
                continue
            if t.minute not in self.minute:
                t += timedelta(minutes=1)
                continue
            return t
        raise ValueError(f"cron '{self.expr}' never matches")

    def _day_ok(self, t: datetime) -> bool:
        dom_ok = t.day in self.dom
        dow_ok = (t.isoweekday() % 7) in self.dow
        if self.dom_star and self.dow_star:
            return True
        if self.dom_star:
            return dow_ok
        if self.dow_star:
            return dom_ok
        return dom_ok or dow_ok


def _floor_minute(t: datetime) -> datetime:
    if t.tzinfo is None:
        t = t.replace(tzinfo=timezone.utc)
    return t.astimezone(timezone.utc).replace(second=0, microsecond=0)


@dataclass
class ScheduledPipeline:
    """A pipeline bound to a cron trigger (the DAG-declaration shape:
    ``schedule``/``start_date``/``catchup``/``retries`` as in the
    reference's DAG headers, run body as ``plans.pipeline.Pipeline``).

    ``run`` may be a ``Pipeline`` or any ``(spark, fire_time) -> None``
    callable; ``catchup=False`` (the reference's setting on all 10
    DAGs) collapses a missed backlog to the single latest fire,
    ``catchup=True`` replays every missed fire in order (Airflow
    semantics).
    """

    name: str
    cron: CronSpec
    run: Callable | object
    start_date: datetime | None = None
    catchup: bool = False
    retries: int = 0
    run_kwargs: dict = field(default_factory=dict)

    def __post_init__(self):
        if isinstance(self.cron, str):
            self.cron = CronSpec.parse(self.cron)
        if self.start_date is not None:
            self.start_date = _floor_minute(self.start_date)

    def _invoke(self, spark, fire_time: datetime) -> None:
        from data_lakehouse_project_spark.plans.pipeline import Pipeline

        if isinstance(self.run, Pipeline):
            # resume=True: a fire interrupted mid-write redoes only the
            # uncommitted stages on the catch-up run (pipeline contract)
            self.run.run(
                spark,
                retries=self.retries,
                resume=True,
                **self.run_kwargs,
            )
        else:
            self.run(spark, fire_time)


class Scheduler:
    """Durable multi-schedule trigger loop.

    State = one JSON object per schedule (``{name: last_fire_iso}``) in
    ``state_path``, written atomically (tmp + rename) AFTER each
    successful run — a crash mid-run leaves last_fire at the previous
    value, so the fire re-runs on restart and lands on the pipeline's
    idempotent resume path. This is the same claimed-at-completion
    model as ``streaming_append``'s txn ledger.

    ``tick(spark, now)`` fires everything due in ``(last_fire, now]``
    and returns the fire times executed; callers own the clock (tests
    pass synthetic times; a daemon loops ``tick`` + sleep).
    """

    def __init__(self, state_path: str):
        self.state_path = state_path
        self.schedules: dict[str, ScheduledPipeline] = {}

    def add(self, sched: ScheduledPipeline) -> "Scheduler":
        if sched.name in self.schedules:
            raise ValueError(f"duplicate schedule name '{sched.name}'")
        self.schedules[sched.name] = sched
        return self

    # -- state ledger -------------------------------------------------
    def _load(self) -> dict[str, str]:
        if not os.path.exists(self.state_path):
            return {}
        with open(self.state_path) as f:
            return json.load(f)

    def _save(self, state: dict[str, str]) -> None:
        tmp = self.state_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(state, f, indent=1, sort_keys=True)
        os.replace(tmp, self.state_path)

    # -- firing -------------------------------------------------------
    def due_fires(
        self, sched: ScheduledPipeline, now: datetime
    ) -> list[datetime]:
        """Fire times owed in ``(last_fire, now]`` per catchup policy."""
        now = _floor_minute(now)
        state = self._load()
        last_s = state.get(sched.name)
        if last_s is not None:
            cursor = datetime.fromisoformat(last_s)
        elif sched.start_date is not None:
            cursor = sched.start_date - timedelta(minutes=1)
        else:
            # first sighting, no start_date: schedule starts NOW —
            # nothing owed from the past (Airflow's None-start shape).
            # tick() anchors this moment in the ledger so the NEXT
            # fire is measured from first sighting, not re-deferred.
            cursor = now
        fires = []
        t = sched.cron.next_fire(cursor)
        while t <= now:
            fires.append(t)
            t = sched.cron.next_fire(t)
        if fires and not sched.catchup:
            fires = fires[-1:]
        return fires

    def tick(self, spark, now: datetime) -> dict[str, list[datetime]]:
        executed: dict[str, list[datetime]] = {}
        for name, sched in self.schedules.items():
            state = self._load()
            if name not in state and sched.start_date is None:
                # anchor first sighting (see due_fires): future fires
                # count from here even if nothing is due this tick
                state[name] = _floor_minute(now).isoformat()
                self._save(state)
            fires = self.due_fires(sched, now)
            for ft in fires:
                sched._invoke(spark, ft)
                # claim AFTER success — crash => re-fire on restart
                state = self._load()
                state[name] = ft.isoformat()
                self._save(state)
            if fires:
                executed[name] = fires
        return executed

    def backfill(
        self, spark, sched_name: str, start: datetime, end: datetime
    ) -> list[datetime]:
        """Replay every fire in ``[start, end]`` regardless of ledger
        state (does not advance it): the reprocessing surface for
        code-change reruns, on top of idempotent overwrite writes."""
        sched = self.schedules[sched_name]
        fires = []
        t = sched.cron.next_fire(_floor_minute(start) - timedelta(minutes=1))
        while t <= _floor_minute(end):
            sched._invoke(spark, t)
            fires.append(t)
            t = sched.cron.next_fire(t)
        return fires
