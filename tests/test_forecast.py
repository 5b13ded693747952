"""SES / Holt forecasting (ext/forecast.py) vs independent driver-side
references."""

from __future__ import annotations

import datetime as dt

import pytest


def _series(spark, values, group="a"):
    rows = [
        (group, dt.date(2024, 1, 1) + dt.timedelta(days=i), float(v))
        for i, v in enumerate(values)
    ]
    return spark.createDataFrame(rows, "g string, day date, x double")


def test_ses_matches_reference(spark):
    from data_lakehouse_project_spark.ext.forecast import ses_smooth

    xs = [10.0, 12.0, 11.0, 15.0, 14.0]
    alpha = 0.3
    df = _series(spark, xs)
    got = [
        r.smoothed
        for r in ses_smooth(df, ["g"], "day", "x", alpha=alpha)
        .orderBy("day")
        .collect()
    ]
    s = xs[0]
    want = [s]
    for x in xs[1:]:
        s = alpha * x + (1 - alpha) * s
        want.append(s)
    assert got == pytest.approx(want, abs=0.0)  # identical arithmetic


def test_ses_groups_independent(spark):
    from data_lakehouse_project_spark.ext.forecast import ses_smooth

    df = _series(spark, [1.0, 100.0], "a").union(
        _series(spark, [50.0, 50.0], "b")
    )
    rows = ses_smooth(df, ["g"], "day", "x", alpha=0.5).collect()
    by = {(r.g, str(r.day)): r.smoothed for r in rows}
    assert by[("a", "2024-01-01")] == 1.0
    assert by[("a", "2024-01-02")] == 50.5
    assert by[("b", "2024-01-02")] == 50.0  # untouched by group a


def test_holt_fit_and_forecast(spark):
    from data_lakehouse_project_spark.ext.forecast import holt_forecast

    # pure linear series: Holt locks on and forecasts the exact line
    xs = [float(2 * i + 5) for i in range(8)]
    df = _series(spark, xs)
    rows = (
        holt_forecast(df, ["g"], "day", "x", alpha=0.5, beta=0.3, horizon=3)
        .orderBy("step", "day")
        .collect()
    )
    obs = [r for r in rows if r.step == 0]
    fc = [r for r in rows if r.step > 0]
    assert len(obs) == 8 and len(fc) == 3
    # fitted tracks the line exactly (level/trend seeded on it)
    for r, x in zip(obs, xs):
        assert r.fitted == pytest.approx(x, abs=1e-9)
    # forecasts continue the line: 21, 23, 25
    assert [r.fitted for r in fc] == pytest.approx([21.0, 23.0, 25.0], abs=1e-9)
    assert all(r.day is None for r in fc)


def test_cusum_detects_level_shift(spark):
    from data_lakehouse_project_spark.ext.forecast import cusum_changepoints

    # flat at 10 for 20 points, then a +5 level shift: the alarm must
    # fire after the shift and never before it
    xs = [10.0 + 0.01 * (i % 3) for i in range(20)] + [15.0] * 10
    df = _series(spark, xs)
    rows = (
        cusum_changepoints(df, ["g"], "day", "x", k_sigma=0.5,
                           h_sigma=4.0, baseline_points=20)
        .orderBy("day")
        .collect()
    )
    alarms = [r.alarm for r in rows]
    assert not any(alarms[:20]), "no alarm in the stable regime"
    assert any(alarms[20:]), "level shift must trigger"
    # cusum statistic is non-negative by construction
    assert all(r.s_pos >= 0 and r.s_neg >= 0 for r in rows)


def test_cusum_no_alarm_on_stationary(spark):
    from data_lakehouse_project_spark.ext.forecast import cusum_changepoints

    xs = [5.0, 5.1, 4.9, 5.05, 4.95, 5.0, 5.1, 4.9] * 3
    df = _series(spark, xs)
    rows = cusum_changepoints(df, ["g"], "day", "x").collect()
    assert not any(r.alarm for r in rows)
