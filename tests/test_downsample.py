"""M4 / LTOB downsampling (ext/downsample.py): hand-computed buckets,
tie determinism, and the output-cardinality cap."""

from __future__ import annotations

import datetime as dt

import pytest

from data_lakehouse_project_spark.ext import downsample as ds


def _t(m, s=0):
    return dt.datetime(2024, 5, 1, 10, m, s)


@pytest.fixture(scope="module")
def series(spark):
    # one 1-hour bucket: first@10:00=5, max@10:10=9, min@10:20=1,
    # last@10:30=4; second bucket with a single point
    rows = [
        (_t(0), 5.0),
        (_t(10), 9.0),
        (_t(20), 1.0),
        (_t(30), 4.0),
        (dt.datetime(2024, 5, 1, 11, 5), 7.0),
    ]
    return spark.createDataFrame(rows, "ts timestamp, value double")


def test_m4_picks_four_representatives(series):
    out = ds.m4_downsample(series, bucket="1 hour").orderBy("bucket_start")
    rows = out.collect()
    assert len(rows) == 2
    b0 = rows[0]
    assert (b0.first_ts, b0.first_v) == (_t(0), 5.0)
    assert (b0.last_ts, b0.last_v) == (_t(30), 4.0)
    assert (b0.min_ts, b0.min_v) == (_t(20), 1.0)
    assert (b0.max_ts, b0.max_v) == (_t(10), 9.0)
    b1 = rows[1]
    # a singleton bucket is its own first/last/min/max
    assert b1.first_v == b1.last_v == b1.min_v == b1.max_v == 7.0


def test_m4_tie_determinism(spark):
    # two rows with the same value: min point tie-breaks to earlier ts,
    # max point to later ts (lexicographic struct order)
    rows = [(_t(1), 3.0), (_t(2), 3.0)]
    df = spark.createDataFrame(rows, "ts timestamp, value double")
    r = ds.m4_downsample(df, bucket="1 hour").head()
    assert r.min_ts == _t(1)
    assert r.max_ts == _t(2)


def test_ltob_picks_max_deviation(series):
    out = ds.ltob_downsample(series, bucket="1 hour").orderBy("bucket_start")
    rows = out.collect()
    # bucket mean = 4.75; deviations: 0.25, 4.25, 3.75, 0.75 → keeps 9.0
    assert rows[0].value == 9.0
    assert rows[0].bucket_avg == pytest.approx(4.75)
    assert rows[1].value == 7.0
    assert len(rows) == 2  # exactly one row per bucket


def test_ltob_grouped(spark):
    # group a: mean 47 → deviations 46/53/7, the 100 wins outright;
    # group b: both points tie at deviation 0 → earliest ts wins
    rows = [
        ("a", _t(0), 1.0),
        ("a", _t(5), 100.0),
        ("a", _t(10), 40.0),
        ("b", _t(0), 2.0),
        ("b", _t(5), 2.0),
    ]
    df = spark.createDataFrame(rows, "g string, ts timestamp, value double")
    out = ds.ltob_downsample(df, bucket="1 hour", group_cols=("g",))
    got = {(r.g, r.value) for r in out.collect()}
    # group b ties on deviation → earliest ts wins
    assert got == {("a", 100.0), ("b", 2.0)}


def test_epoch_bucket_is_origin_free(spark):
    df = spark.createDataFrame(
        [(dt.datetime(2024, 5, 1, 10, 59),)], "ts timestamp"
    )
    b = df.select(ds.epoch_bucket(df, "ts", 21600).alias("b")).head()["b"]
    assert b == dt.datetime(2024, 5, 1, 6, 0)
