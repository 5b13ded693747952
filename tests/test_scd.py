"""Snapshot diff (CDC) and SCD Type-2 merge golden scenarios."""

from __future__ import annotations

import datetime

from data_lakehouse_project_spark.operators.scd import (
    scd2_init,
    scd2_merge,
    snapshot_diff,
)


def test_snapshot_diff(spark):
    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "id long, name string, v double",
    )
    new = spark.createDataFrame(
        [(1, "a", 10.0), (2, "B", 20.0), (4, "d", 40.0)],
        "id long, name string, v double",
    )
    got = {
        (r.id, r.change_type): (r.name, r.v)
        for r in snapshot_diff(old, new, ["id"]).collect()
    }
    assert got == {
        (2, "update"): ("B", 20.0),   # new values
        (3, "delete"): ("c", 30.0),   # old values
        (4, "insert"): ("d", 40.0),
    }


def _t(day):
    return datetime.datetime(2024, 1, day)


def test_scd2_lifecycle(spark):
    base = spark.createDataFrame(
        [(1, "NYC", _t(1)), (2, "LA", _t(1))],
        "cust long, city string, effective_ts timestamp",
    )
    dim = scd2_init(base, "effective_ts")
    assert {r.cust for r in dim.where("is_current").collect()} == {1, 2}

    # batch: cust 1 moves to SF; cust 3 appears; cust 2 unchanged
    batch = spark.createDataFrame(
        [(1, "SF", _t(5)), (2, "LA", _t(5)), (3, "CHI", _t(5))],
        "cust long, city string, effective_ts timestamp",
    )
    dim2 = scd2_merge(dim, batch, ["cust"])
    rows = dim2.collect()
    cur = {r.cust: r.city for r in rows if r.is_current}
    assert cur == {1: "SF", 2: "LA", 3: "CHI"}
    closed = [r for r in rows if not r.is_current]
    assert len(closed) == 1
    assert closed[0].cust == 1 and closed[0].city == "NYC"
    assert closed[0].valid_to == _t(5)

    # second batch: cust 1 moves again → two history rows, one current
    batch2 = spark.createDataFrame(
        [(1, "SEA", _t(9))], "cust long, city string, effective_ts timestamp"
    )
    dim3 = scd2_merge(dim2, batch2, ["cust"])
    h1 = sorted(
        [(r.city, r.valid_to) for r in dim3.where("cust = 1 AND NOT is_current").collect()]
    )
    assert h1 == [("NYC", _t(5)), ("SF", _t(9))]
    assert dim3.where("cust = 1 AND is_current").collect()[0].city == "SEA"


def test_scd2_idempotent_for_unchanged_batch(spark):
    base = spark.createDataFrame(
        [(1, "NYC", _t(1))], "cust long, city string, effective_ts timestamp"
    )
    dim = scd2_init(base, "effective_ts")
    same = spark.createDataFrame(
        [(1, "NYC", _t(5))], "cust long, city string, effective_ts timestamp"
    )
    dim2 = scd2_merge(dim, same, ["cust"])
    assert dim2.count() == 1  # no spurious version
    assert dim2.collect()[0].is_current
