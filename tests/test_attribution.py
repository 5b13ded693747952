"""Conversion attribution (ext/attribution.py): crafted micro-funnel
with hand-computed credits for every model."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from data_lakehouse_project_spark.ext import attribution as attr


def _ts(h):
    return dt.datetime(2024, 3, 1, h, 0, 0)


@pytest.fixture(scope="module")
def funnel(spark):
    # user 1: view@1h, click@5h, purchase@6h   → both touches in window
    # user 2: view@0h, purchase@90h later      → outside 72h lookback
    # user 3: purchase@2h with no touches      → unattributed
    # user 4: click AFTER the purchase          → not credited
    rows = [
        (101, _ts(1), 1, "view", 1.0, "{}"),
        (102, _ts(5), 1, "click", 1.0, "{}"),
        (103, _ts(6), 1, "purchase", 9.0, "{}"),
        (201, dt.datetime(2024, 3, 1, 0), 2, "view", 1.0, "{}"),
        (202, dt.datetime(2024, 3, 4, 18), 2, "purchase", 9.0, "{}"),
        (301, _ts(2), 3, "purchase", 9.0, "{}"),
        (401, _ts(9), 4, "purchase", 9.0, "{}"),
        (402, _ts(10), 4, "click", 1.0, "{}"),
    ]
    return spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )


def test_last_touch(funnel):
    out = attr.attribute_conversions(funnel, model="last").collect()
    assert len(out) == 1
    r = out[0]
    assert (r.conv_id, r.touch_id, r.weight) == (103, 102, 1.0)


def test_first_touch(funnel):
    out = attr.attribute_conversions(funnel, model="first").collect()
    assert len(out) == 1
    assert (out[0].conv_id, out[0].touch_id, out[0].weight) == (103, 101, 1.0)


def test_linear_splits_evenly(funnel):
    out = {
        r.touch_id: r.weight
        for r in attr.attribute_conversions(funnel, model="linear").collect()
    }
    assert out == {101: 0.5, 102: 0.5}


def test_time_decay_prefers_recent_and_normalizes(funnel):
    rows = attr.attribute_conversions(
        funnel, model="time_decay", half_life_hours=1.0
    ).collect()
    w = {r.touch_id: r.weight for r in rows}
    assert sum(w.values()) == pytest.approx(1.0)
    # click is 1h old (decay 2^-1), view 5h old (2^-5): ratio 16:1
    assert w[102] / w[101] == pytest.approx(16.0, rel=1e-9)


def test_lookback_excludes_and_unattributed_dropped(funnel):
    out = attr.attribute_conversions(funnel, model="last")
    users = {r.user_id for r in out.collect()}
    assert users == {1}  # 2 outside lookback, 3 no touch, 4 touch after


def test_report_rolls_up_by_channel(funnel):
    rep = attr.attribution_report(funnel, model="linear")
    got = {r.touch_type: (r.conversions, r.credit) for r in rep.collect()}
    assert got == {"view": (1, 0.5), "click": (1, 0.5)}


def test_unknown_model_raises(funnel):
    with pytest.raises(ValueError):
        attr.attribute_conversions(funnel, model="u_shaped")
