"""Iceberg-style hidden partitioning (operators/txnlog.py partition
transforms): day/month/bucket/truncate derive the LAYOUT, never appear
in the read schema, and predicates on the SOURCE column prune files
through the transform — the users-query-ts-not-ts_day contract."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from data_lakehouse_project_spark.operators.txnlog import (
    TxnTable,
    _expand_prune,
    _parse_partition_spec,
    _transform_literal,
)


def _events(spark, days=8, per_day=50):
    base = datetime.datetime(2024, 3, 1)
    rows = [
        (d * per_day + i, base + datetime.timedelta(days=d, minutes=i))
        for d in range(days)
        for i in range(per_day)
    ]
    return spark.createDataFrame(rows, "id long, ts timestamp")


def test_day_transform_hidden_and_pruning(spark, tmp_path):
    t = TxnTable(str(tmp_path / "tbl"))
    t.write(_events(spark), mode="overwrite", partition_by=["day(ts)"])

    out = t.read(spark)
    assert set(out.columns) == {"id", "ts"}  # hidden stays hidden
    assert out.count() == 400

    # equality on the SOURCE column prunes to one day-dir
    probe = datetime.datetime(2024, 3, 4, 0, 10)
    scanned, total = t.scan_file_count(prune=[("ts", "=", probe)])
    assert total >= 8 and scanned <= total // 8 + 1

    # range predicates prune through the (non-strict) transform
    scanned, _ = t.scan_file_count(prune=[("ts", ">=", "2024-03-07")])
    assert scanned <= 2
    got = t.read(spark, prune=[("ts", ">=", "2024-03-07")])
    # days 2024-03-07 and 2024-03-08 match (d=6,7): the real filter
    # still applies on top of the pruned file set
    assert got.count() == 100
    assert sorted(r.id for r in got.collect()) == list(range(300, 400))


def test_bucket_transform_point_lookup(spark, tmp_path):
    t = TxnTable(str(tmp_path / "tbl"))
    df = spark.range(0, 1000).select(
        F.col("id"), (F.col("id") * 3).alias("v")
    )
    t.write(df, mode="overwrite", partition_by=["bucket(8, id)"])
    assert set(t.read(spark).columns) == {"id", "v"}

    scanned, total = t.scan_file_count(prune=[("id", "=", 417)])
    assert total >= 8
    assert scanned <= total // 8 + 1  # one bucket dir
    got = t.read(spark, prune=[("id", "=", 417)]).collect()
    assert [(r.id, r.v) for r in got] == [(417, 1251)]
    # range ops never prune through a bucket (correctly conservative)
    scanned, _ = t.scan_file_count(prune=[("id", ">=", 0)])
    assert scanned == total


def test_truncate_transform_string_and_mutation_keeps_layout(
    spark, tmp_path
):
    t = TxnTable(str(tmp_path / "tbl"))
    df = spark.createDataFrame(
        [(i, f"{pfx}_{i}") for i, pfx in enumerate(["alpha", "beta"] * 50)],
        "id long, name string",
    )
    t.write(df, mode="overwrite", partition_by=["truncate(4, name)"])
    scanned, total = t.scan_file_count(prune=[("name", "=", "beta_7")])
    assert scanned < total
    assert (
        t.read(spark, prune=[("name", "=", "beta_7")])
        .where("name = 'beta_7'")
        .count()
        == 1
    )

    # a CoW delete restages through the SAME transform spec: layout and
    # pruning survive the rewrite
    t.delete_where(spark, "id = 0")
    assert t.read(spark).count() == 99
    scanned, total = t.scan_file_count(prune=[("name", "=", "alpha_2")])
    assert scanned < total
    hidden_dirs = {
        f["path"].split("/")[0] for f in t.snapshot().files
    }
    assert all(d.startswith("_pt_truncate4_name=") for d in hidden_dirs)


def test_transform_spec_parsing_and_literals():
    physical, transforms = _parse_partition_spec(
        ["region", "day(ts)", "bucket(16, uid)", "truncate(3, s)"]
    )
    assert physical == ["region"]
    assert [t["hidden"] for t in transforms] == [
        "_pt_day_ts",
        "_pt_bucket16_uid",
        "_pt_truncate3_s",
    ]
    day = transforms[0]
    assert _transform_literal(day, "2024-03-04 10:11:12") == "2024-03-04"
    assert (
        _transform_literal(day, datetime.datetime(2024, 3, 4, 1))
        == "2024-03-04"
    )
    tr = transforms[2]
    assert _transform_literal(tr, "abcdef") == "abc"
    assert _transform_literal({"transform": "truncate", "n": 10}, 37) == 30

    # strict ops weaken through the non-strict transform
    out = _expand_prune([("ts", "<", "2024-03-04 05:00:00")], [day])
    assert ("_pt_day_ts", "<=", "2024-03-04") in out
    assert out[0] == ("ts", "<", "2024-03-04 05:00:00")  # original kept

    with pytest.raises(ValueError, match="width"):
        _parse_partition_spec(["bucket(ts)"])


def test_year_and_hour_transforms(spark, tmp_path):
    t = TxnTable(str(tmp_path / "tbl"))
    rows = [
        (i, datetime.datetime(2023 + (i % 2), 3, 1, i % 4)) for i in range(80)
    ]
    df = spark.createDataFrame(rows, "id long, ts timestamp")
    t.write(df, mode="overwrite", partition_by=["year(ts)", "hour(ts)"])
    assert set(t.read(spark).columns) == {"id", "ts"}

    probe = datetime.datetime(2024, 3, 1, 2, 30)
    scanned, total = t.scan_file_count(prune=[("ts", "=", probe)])
    assert total >= 8 and scanned <= total // 8 + 1  # 1 of 2y×4h dirs
    got = t.read(
        spark, prune=[("ts", "=", datetime.datetime(2024, 3, 1, 3))]
    ).where("ts = timestamp'2024-03-01 03:00:00'")
    assert got.count() == 20  # i ≡ 3 (mod 4) → 20 of 80, all year 2024


def test_coarse_literal_never_over_prunes_hour_transform(spark, tmp_path):
    """Regression (r5): a date-only literal against an hour(ts) transform
    yields day grain, which must widen to a prefix range — equality
    against the full hour grain would prune EVERY file, including the
    midnight partition whose rows satisfy ``ts = DATE'...'``."""
    t = TxnTable(str(tmp_path / "tbl"))
    rows = [
        (i, datetime.datetime(2024, 3, 4 + (i % 2), i % 4)) for i in range(80)
    ]
    df = spark.createDataFrame(rows, "id long, ts timestamp")
    t.write(df, mode="overwrite", partition_by=["hour(ts)"])

    # ts = DATE'2024-03-04' matches only midnight rows of that day; the
    # midnight file MUST survive pruning (the real filter does the rest)
    probe = datetime.date(2024, 3, 4)
    scanned, total = t.scan_file_count(prune=[("ts", "=", probe)])
    assert scanned >= 1  # was 0 before the fix
    assert scanned < total  # still prunes the other day's dirs
    got = t.read(spark, prune=[("ts", "=", probe)]).where(
        "ts = date'2024-03-04'"
    )
    assert got.count() == 20  # i%4==0 → 20 midnight rows of 03-04

    # coarse upper bound keeps the whole matching day (<= includes the
    # midnight boundary of 03-04 and everything finer under it)
    got = t.read(spark, prune=[("ts", "<=", probe)]).where(
        "ts <= date'2024-03-04'"
    )
    assert got.count() == 20
    # coarse lower bound keeps all of day 03-05
    got = t.read(spark, prune=[("ts", ">=", "2024-03-05")]).where(
        "ts >= date'2024-03-05'"
    )
    assert got.count() == 40

    # unit-level: coarse "=" widens to a range, never an exact compare
    _, transforms = _parse_partition_spec(["hour(ts)"])
    out = _expand_prune([("ts", "=", "2024-03-04")], transforms)
    assert ("_pt_hour_ts", ">=", "2024-03-04") in out
    assert ("_pt_hour_ts", "<=", "2024-03-04~") in out
    assert not any(p[1] == "=" and p[0] == "_pt_hour_ts" for p in out)
