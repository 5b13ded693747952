"""Iceberg HIDDEN partition transforms — spec-exact bucket/truncate/
year/month/day/hour across the whole surface: the murmur3 reference
vectors (spec Appendix B), the internal txnlog layout + export, the
FOREIGN writer's staging + manifests, DML on transform-partitioned
tables, and the foreign reader's transform-aware file pruning.

Reference scope note: the reference pipeline (spark/jobs/*.py) has no
table format at all; this is SURVEY §2.9 north-star surface."""

from __future__ import annotations

import datetime
import struct

import pytest
from pyspark.sql import functions as F

from data_lakehouse_project_spark.functions.ice_transforms import (
    bucket_value,
    murmur3_32,
    temporal_value,
    transform_literal,
    truncate_value,
)
from data_lakehouse_project_spark.operators.iceberg_export import (
    export_iceberg_metadata,
)
from data_lakehouse_project_spark.operators.iceberg_reader import (
    _iceberg_file_may_match,
    _transform_sources_by_spec,
    iceberg_live_files,
    load_iceberg_metadata,
    read_iceberg_table,
)
from data_lakehouse_project_spark.operators.iceberg_writer import (
    append_to_iceberg,
    delete_from_iceberg,
    merge_into_iceberg,
    rewrite_data_files,
    update_from_iceberg,
)
from data_lakehouse_project_spark.operators.txnlog import TxnTable


def test_murmur3_spec_reference_vectors():
    """Iceberg spec Appendix B: hash results every engine must agree
    on, pinned bit-for-bit."""
    assert murmur3_32(struct.pack("<q", 34)) == 2017239379  # int/long
    d = (datetime.date(2017, 11, 16) - datetime.date(1970, 1, 1)).days
    assert murmur3_32(struct.pack("<q", d)) == -653330422  # date
    us = int(
        (
            datetime.datetime(2017, 11, 16, 22, 31, 8)
            - datetime.datetime(1970, 1, 1)
        ).total_seconds()
        * 1_000_000
    )
    assert murmur3_32(struct.pack("<q", us)) == -2047944441  # timestamp
    assert murmur3_32(b"iceberg") == 1210000089  # string


def test_transform_literals():
    assert bucket_value(34, "int", 16) == bucket_value(34, "long", 16)
    assert truncate_value(-3, "long", 10) == -10
    assert truncate_value("abcdef", "string", 3) == "abc"
    assert temporal_value("day", "2017-11-16", "date") == 17486
    assert temporal_value("month", datetime.date(2017, 11, 16), "date") == 574
    assert temporal_value("year", datetime.date(2017, 11, 16), "date") == 47
    assert (
        temporal_value(
            "hour", datetime.datetime(2017, 11, 16, 22, 0), "timestamptz"
        )
        == 17486 * 24 + 22
    )
    assert transform_literal("void", 5, "long") is None


def _tx(spark, tmp_path, name="tt"):
    base = datetime.datetime(2024, 3, 1)
    rows = [
        (i, base + datetime.timedelta(days=i % 5, minutes=i), float(i))
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "id long, ts timestamp, v double")
    t = TxnTable(str(tmp_path / name))
    t.write(
        df, mode="overwrite", partition_by=["day(ts)", "bucket(4, id)"]
    )
    export_iceberg_metadata(t, spark)
    return t, df


def test_transform_export_foreign_read_hash_equal(spark, tmp_path):
    t, df = _tx(spark, tmp_path)
    back = read_iceberg_table(spark, t.path)
    assert back.exceptAll(df).count() == 0
    assert df.exceptAll(back).count() == 0
    # the exported spec declares the native transforms + spec values
    md = load_iceberg_metadata(t.path)
    trs = {
        f["transform"]
        for s in md["partition-specs"]
        for f in s["fields"]
    }
    assert trs == {"day", "bucket[4]"}
    _, live, _, _ = iceberg_live_files(spark, t.path)
    for f in live:
        part = f.get("partition") or {}
        assert set(part) == {"pt_day_ts", "pt_bucket4_id"}
        assert isinstance(part["pt_day_ts"], int)
        assert 0 <= part["pt_bucket4_id"] < 4


def test_transform_pruning_foreign_reader(spark, tmp_path):
    t, df = _tx(spark, tmp_path)
    md = load_iceberg_metadata(t.path)
    _, live, _, _ = iceberg_live_files(spark, t.path)
    trs = _transform_sources_by_spec(md)[md["default-spec-id"]]
    name2id = {
        f["name"]: f["id"]
        for f in md["schemas"][0]["fields"]
    }

    # bucket equality keeps only the key's bucket
    probe = 17
    want_b = bucket_value(probe, "long", 4)
    typed = [(name2id["id"], "=", probe, "long")]
    kept = [
        f for f in live if _iceberg_file_may_match(f, typed, {}, trs)
    ]
    assert kept and all(
        f["partition"]["pt_bucket4_id"] == want_b for f in kept
    )
    assert len(kept) < len(live)

    # day range prunes through the temporal transform
    cut = datetime.datetime(2024, 3, 3, 0, 0)
    want_day = temporal_value("day", cut, "timestamptz")
    typed = [(name2id["ts"], ">=", cut, "timestamptz")]
    kept = [
        f for f in live if _iceberg_file_may_match(f, typed, {}, trs)
    ]
    assert kept and all(
        f["partition"]["pt_day_ts"] >= want_day for f in kept
    )
    assert len(kept) < len(live)

    # end-to-end: pruned read returns exactly the filtered rows
    got = read_iceberg_table(
        spark, t.path, prune=[("id", "=", probe)]
    ).where("id = 17")
    assert [(r.id, r.v) for r in got.collect()] == [(17, 17.0)]


def test_transform_append_and_dml_roundtrip(spark, tmp_path):
    t, df = _tx(spark, tmp_path)
    path = t.path
    extra = spark.createDataFrame(
        [(100, datetime.datetime(2024, 4, 1, 12, 0), 100.0)],
        "id long, ts timestamp, v double",
    )
    append_to_iceberg(spark, extra, path)            # transform append
    delete_from_iceberg(spark, path, "id % 7 = 3")   # pos-delete
    update_from_iceberg(                             # partition-moving
        spark, path, "id = 100",
        {"ts": "timestamp'2024-05-02 01:00:00'", "v": "v + 1"},
    )
    src = spark.createDataFrame(
        [(0, datetime.datetime(2024, 3, 1), 999.0),
         (200, datetime.datetime(2024, 6, 1), 200.0)],
        "id long, ts timestamp, v double",
    )
    merge_into_iceberg(
        spark, path, src, "t.id = s.id",
        when_matched_update={"v": "s.v"},
    )
    back = read_iceberg_table(spark, path)

    import pandas as pd  # noqa: F401  (toPandas compare)
    expect = (
        df.unionByName(extra)
        .where("NOT (id % 7 = 3)")
        .withColumn(
            "ts",
            F.when(
                F.col("id") == 100,
                F.expr("timestamp'2024-05-02 01:00:00'"),
            ).otherwise(F.col("ts")),
        )
        .withColumn(
            "v",
            F.when(F.col("id") == 100, F.col("v") + 1)
            .when(F.col("id") == 0, F.lit(999.0))
            .otherwise(F.col("v")),
        )
    )
    ins = spark.createDataFrame(
        [(200, datetime.datetime(2024, 6, 1), 200.0)],
        "id long, ts timestamp, v double",
    )
    expect = expect.unionByName(ins)
    assert back.exceptAll(expect).count() == 0
    assert expect.exceptAll(back).count() == 0

    # every data file's manifest partition tuple is the SPEC transform
    # of its rows (checked per file, not just per table)
    _, live, _, _ = iceberg_live_files(spark, path)
    for f in live:
        p = f["file_path"]
        rows = spark.read.parquet(p).select("id", "ts").collect()
        part = f["partition"]
        for r in rows:
            assert bucket_value(r.id, "long", 4) == part["pt_bucket4_id"]
            assert (
                temporal_value("day", r.ts, "timestamptz")
                == part["pt_day_ts"]
            )


def test_transform_rewrite_data_files(spark, tmp_path):
    t, df = _tx(spark, tmp_path)
    path = t.path
    append_to_iceberg(
        spark,
        spark.createDataFrame(
            [(1000 + i, datetime.datetime(2024, 3, 1, 0, i), float(i))
             for i in range(5)],
            "id long, ts timestamp, v double",
        ),
        path,
    )
    before = read_iceberg_table(spark, path)
    snap_before = before.collect()
    info = rewrite_data_files(spark, path)
    assert info["snapshot_id"] is not None
    after = read_iceberg_table(spark, path)
    assert sorted(map(tuple, after.collect())) == sorted(
        map(tuple, snap_before)
    )


def _strip_bucket_hash_marker(path):
    import json as _json
    import os

    log = os.path.join(path, "_delta_log")
    for fn in os.listdir(log):
        if not fn.endswith(".json"):
            continue
        fp = os.path.join(log, fn)
        lines = []
        for line in open(fp):
            try:
                act = _json.loads(line)
            except ValueError:
                lines.append(line)
                continue
            conf = (act.get("metaData") or {}).get("configuration")
            if conf:
                conf.pop("lakehouse.bucketHash", None)
            lines.append(_json.dumps(act) + "\n")
        open(fp, "w").writelines(lines)


def test_export_refuses_legacy_md5_bucket_layout(spark, tmp_path):
    """A table whose newest meta lacks the murmur3 marker (legacy md5
    bucket layout) must not export a bucket[N] spec — foreign engines
    would mis-prune."""
    import os

    t = TxnTable(str(tmp_path / "legacy"))
    t.write(
        spark.range(0, 40).selectExpr("id", "id * 1.0 AS v"),
        mode="overwrite",
        partition_by=["bucket(4, id)"],
    )
    # simulate the legacy layout: strip the marker from the commit
    _strip_bucket_hash_marker(t.path)
    assert t._current_meta().get("bucket_hash") != "murmur3"
    with pytest.raises(ValueError, match="murmur3"):
        export_iceberg_metadata(t, spark)
    # and prune expansion drops the bucket mapping (conservative) —
    # only column stats may still skip files
    from data_lakehouse_project_spark.operators.txnlog import (
        _expand_prune,
        _parse_partition_spec,
    )

    _, transforms = _parse_partition_spec(["bucket(4, id)"])
    out = _expand_prune([("id", "=", 7)], transforms, bucket_ok=False)
    assert out == [("id", "=", 7)]  # no hidden-bucket predicate
    out = _expand_prune([("id", "=", 7)], transforms, bucket_ok=True)
    assert any(c == "_pt_bucket4_id" for c, _, _ in out)


def test_append_to_legacy_bucket_table_marks_mixed(spark, tmp_path):
    """An incremental commit over an unmarked legacy bucket layout
    stamps bucket_hash=mixed — murmur3 pruning stays off forever on
    that lineage; a full overwrite re-marks murmur3."""
    import os

    t = TxnTable(str(tmp_path / "mix"))
    df = spark.range(0, 40).selectExpr("id", "id * 1.0 AS v")
    t.write(df, mode="overwrite", partition_by=["bucket(4, id)"])
    _strip_bucket_hash_marker(t.path)
    t.write(df, mode="append")
    assert t._current_meta().get("bucket_hash") == "mixed"
    t.write(df, mode="overwrite", partition_by=["bucket(4, id)"])
    assert t._current_meta().get("bucket_hash") == "murmur3"
