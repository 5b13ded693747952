"""As-of join semantics (ext/asof.py) — backward inclusive match."""

from __future__ import annotations

import datetime


def _ts(minute):
    return datetime.datetime(2024, 1, 1, 0, minute)


def test_asof_backward_inclusive(spark):
    from data_lakehouse_project_spark.ext.asof import asof_join

    left = spark.createDataFrame(
        [(1, 100, _ts(10)), (2, 100, _ts(30)), (3, 200, _ts(5))],
        "id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(100, _ts(8), 1.0), (100, _ts(25), 2.0), (100, _ts(30), 3.0)],
        "user_id long, ts timestamp, v double",
    )
    out = asof_join(left, right, "ts", "user_id", ["v"])
    got = {r.id: r.v_asof for r in out.collect()}
    assert got[1] == 1.0  # ts 10 → most recent right at 8
    assert got[2] == 3.0  # equal timestamps match (inclusive)
    assert got[3] is None  # user 200 has no right rows


def test_asof_self_cogroup_lineage(spark, testdata):
    """Regression: left and right carved from the SAME DataFrame used to
    lose the right side's payload columns (shared exprIds collapse in the
    cogroup attribute dedup) — fixed by re-aliasing in asof_join."""
    from data_lakehouse_project_spark.ext.asof import asof_join

    events = testdata["events"]
    purchases = events.where("event_type = 'purchase'").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = events.where("event_type = 'click'")
    out = asof_join(purchases, clicks, "ts", "user_id", ["value"])
    rows = out.collect()
    assert len(rows) == purchases.count()  # left-join cardinality
    assert any(r.value_asof is not None for r in rows)
    # every matched click is at-or-before its purchase
    assert all(r.ts_asof is None or r.ts_asof <= r.ts for r in rows)
