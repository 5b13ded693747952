"""Foreign Delta DML on CDF-enabled tables: DELETE/UPDATE/MERGE now
emit spec ``_change_data`` cdc files (+ ``cdc`` actions) instead of
refusing — delta-spark's own DV-DML-on-CDF commit shape.  Validates
the cdc file layout, our CDF reader's replay, the streaming relay,
and (randomized) every per-version CDF slice against the snapshot
reader's exceptAll diff."""

from __future__ import annotations

import json
import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from data_lakehouse_project_spark.operators.delta_cdf import (
    read_delta_changes,
)
from data_lakehouse_project_spark.operators.delta_export import (
    export_delta_snapshot,
)
from data_lakehouse_project_spark.operators.delta_reader import (
    read_delta_table,
)
from data_lakehouse_project_spark.operators.delta_writer import (
    append_to_delta,
    delete_from_delta,
    merge_into_delta,
    update_from_delta,
)
from data_lakehouse_project_spark.operators.txnlog import TxnTable


def _batch(spark, lo, hi, part="p0"):
    return spark.range(lo, hi).selectExpr(
        "id", f"'{part}' AS part", "id * 2.0 AS v"
    )


def _enable_cdf(table: str) -> None:
    """Flip delta.enableChangeDataFeed=true (+ spec's minWriter 4) in
    every metaData/protocol action of the exported fixture's log."""
    log = os.path.join(table, "_delta_log")
    for name in sorted(os.listdir(log)):
        if not name.endswith(".json"):
            continue
        p = os.path.join(log, name)
        lines = [json.loads(x) for x in open(p)]
        touched = False
        for act in lines:
            if "metaData" in act:
                act["metaData"].setdefault("configuration", {})[
                    "delta.enableChangeDataFeed"
                ] = "true"
                touched = True
            if "protocol" in act:
                pr = act["protocol"]
                if int(pr.get("minWriterVersion", 1)) < 4:
                    pr["minWriterVersion"] = 4
                if "writerFeatures" in pr:
                    pr["writerFeatures"] = sorted(
                        set(pr["writerFeatures"]) | {"changeDataFeed"}
                    )
                touched = True
        if touched:
            with open(p, "w") as fh:
                for act in lines:
                    fh.write(json.dumps(act) + "\n")


def _cdf_table(spark, tmp_path, name="f", lo=0, hi=6, **kw):
    t = TxnTable(str(tmp_path / f"src_{name}"))
    t.write(_batch(spark, lo, hi), mode="overwrite", **kw)
    out = str(tmp_path / f"ext_{name}")
    export_delta_snapshot(spark, t.path, out)
    _enable_cdf(out)
    return out


def _commit_actions(table: str, version: int) -> list[dict]:
    p = os.path.join(table, "_delta_log", f"{version:020d}.json")
    return [json.loads(x) for x in open(p)]


def _changes(spark, table, v):
    return read_delta_changes(
        spark, table, starting_version=v, ending_version=v
    )


def test_delete_on_cdf_table_writes_cdc(spark, tmp_path):
    table = _cdf_table(spark, tmp_path)
    info = delete_from_delta(
        spark, table, "id < 2", allow_protocol_upgrade=True
    )
    assert info["rows_deleted"] == 2
    v = info["version"]
    cdc = [a["cdc"] for a in _commit_actions(table, v) if "cdc" in a]
    assert cdc and all(
        c["path"].startswith("_change_data/")
        and c["dataChange"] is False
        for c in cdc
    )
    # spec file shape: table columns + _change_type, nothing else
    for c in cdc:
        sch = pq.read_schema(os.path.join(table, c["path"]))
        assert sorted(sch.names) == ["_change_type", "id", "part", "v"]
    got = sorted(
        (r.id, r._change_type) for r in _changes(spark, table, v)
        .select("id", "_change_type").collect()
    )
    assert got == [(0, "delete"), (1, "delete")]
    assert sorted(
        r.id for r in read_delta_table(spark, table).collect()
    ) == [2, 3, 4, 5]


def test_update_on_cdf_table_pre_post_images(spark, tmp_path):
    table = _cdf_table(spark, tmp_path)
    info = update_from_delta(
        spark, table, "id = 3", {"v": "v + 0.5"},
        allow_protocol_upgrade=True,
    )
    v = info["version"]
    got = sorted(
        (r._change_type, r.id, r.v)
        for r in _changes(spark, table, v)
        .select("_change_type", "id", "v").collect()
    )
    assert got == [
        ("update_postimage", 3, 6.5),
        ("update_preimage", 3, 6.0),
    ]
    live = {r.id: r.v for r in read_delta_table(spark, table).collect()}
    assert live[3] == 6.5 and len(live) == 6


def test_merge_on_cdf_table_complete_change_set(spark, tmp_path):
    table = _cdf_table(spark, tmp_path)  # ids 0..5
    src = spark.createDataFrame(
        [(5, "p0", 99.0), (50, "p0", 100.0)],
        "id long, part string, v double",
    )
    info = merge_into_delta(
        spark, table, src, "t.id = s.id",
        when_matched_update={"v": "s.v"},
        allow_protocol_upgrade=True,
    )
    v = info["version"]
    assert (info["rows_updated"], info["rows_inserted"]) == (1, 1)
    got = sorted(
        (r._change_type, r.id, r.v)
        for r in _changes(spark, table, v)
        .select("_change_type", "id", "v").collect()
    )
    assert got == [
        ("insert", 50, 100.0),
        ("update_postimage", 5, 99.0),
        ("update_preimage", 5, 10.0),
    ]

    # insert-only merge: NO cdc action; the add fallback labels inserts
    src2 = spark.createDataFrame(
        [(60, "p0", 1.0)], "id long, part string, v double"
    )
    info2 = merge_into_delta(
        spark, table, src2, "t.id = s.id",
        when_matched_update={"v": "s.v"},
        allow_protocol_upgrade=True,
    )
    v2 = info2["version"]
    assert not [a for a in _commit_actions(table, v2) if "cdc" in a]
    got2 = sorted(
        (r._change_type, r.id)
        for r in _changes(spark, table, v2)
        .select("_change_type", "id").collect()
    )
    assert got2 == [("insert", 60)]


def test_merge_delete_clause_cdc(spark, tmp_path):
    table = _cdf_table(spark, tmp_path)
    src = spark.createDataFrame(
        [(1, "p0", 0.0), (70, "p0", 7.0)],
        "id long, part string, v double",
    )
    info = merge_into_delta(
        spark, table, src, "t.id = s.id",
        when_matched_delete=True,
        allow_protocol_upgrade=True,
    )
    got = sorted(
        (r._change_type, r.id)
        for r in _changes(spark, table, info["version"])
        .select("_change_type", "id").collect()
    )
    assert got == [("delete", 1), ("insert", 70)]


def test_partitioned_cdf_dml(spark, tmp_path):
    t = TxnTable(str(tmp_path / "srcp"))
    t.write(
        _batch(spark, 0, 3, "a").union(_batch(spark, 3, 6, "b")),
        mode="overwrite", partition_by=["part"],
    )
    table = str(tmp_path / "extp")
    export_delta_snapshot(spark, t.path, table)
    _enable_cdf(table)
    info = delete_from_delta(
        spark, table, "id IN (1, 4)", allow_protocol_upgrade=True
    )
    v = info["version"]
    cdc = [a["cdc"] for a in _commit_actions(table, v) if "cdc" in a]
    # one cdc file per touched partition; partitionValues carried;
    # the partition column is NOT in the parquet
    pvs = sorted(c["partitionValues"]["part"] for c in cdc)
    assert pvs == ["a", "b"]
    for c in cdc:
        sch = pq.read_schema(os.path.join(table, c["path"]))
        assert "part" not in sch.names and "_change_type" in sch.names
    got = sorted(
        (r.id, r.part, r._change_type)
        for r in _changes(spark, table, v)
        .select("id", "part", "_change_type").collect()
    )
    assert got == [(1, "a", "delete"), (4, "b", "delete")]


def test_streaming_cdc_relay_over_dml(spark, tmp_path):
    """The streaming CDC source replays writer-emitted cdc commits."""
    table = _cdf_table(spark, tmp_path, hi=4)  # ids 0..3
    delete_from_delta(spark, table, "id = 1",
                      allow_protocol_upgrade=True)
    update_from_delta(spark, table, "id = 2", {"v": "99.0"},
                      allow_protocol_upgrade=True)

    from data_lakehouse_project_spark.sources.delta_stream import (
        DeltaStreamDataSource,
    )

    spark.dataSource.register(DeltaStreamDataSource)
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    (
        spark.readStream.format("delta_stream")
        .option("path", table)
        .option("readChangeFeed", "true")
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
        .awaitTermination(120)
    )
    rows = sorted(
        (r._commit_version, r._change_type, r.id)
        for r in spark.read.parquet(out).collect()
    )
    assert rows == [
        (0, "insert", 0), (0, "insert", 1), (0, "insert", 2),
        (0, "insert", 3),
        (1, "delete", 1),
        (2, "update_postimage", 2), (2, "update_preimage", 2),
    ]


@pytest.mark.parametrize("seed", [11, 23, 37])
def test_cdf_dml_randomized_equals_snapshot_diff(spark, tmp_path, seed):
    """Property over a RANDOM writer-API sequence (append / delete /
    update / merge) on a CDF-enabled table: every per-version CDF
    slice equals the snapshot exceptAll diff — {insert,
    update_postimage} rows = after∖before, {delete, update_preimage}
    rows = before∖after, compared as full row tuples."""
    import random

    rng = random.Random(seed)
    table = _cdf_table(spark, tmp_path, name=f"r{seed}", hi=8)
    next_id = [8]
    versions = [0]

    def _fresh(n):
        lo = next_id[0]
        next_id[0] += n
        return _batch(spark, lo, lo + n)

    for _ in range(8):
        live = [
            r.id
            for r in read_delta_table(spark, table)
            .select("id").collect()
        ]
        op = rng.choice(
            ["append", "delete", "update", "merge"]
            if live else ["append"]
        )
        if op == "append":
            info = append_to_delta(spark, _fresh(rng.randint(1, 3)),
                                   table)
            versions.append(info["version"])
        elif op == "delete":
            pick = rng.sample(live, min(len(live),
                                        rng.randint(1, 3)))
            info = delete_from_delta(
                spark, table, f"id IN ({','.join(map(str, pick))})",
                allow_protocol_upgrade=True,
            )
            if info["rows_deleted"]:
                versions.append(info["version"])
        elif op == "update":
            pick = rng.sample(live, min(len(live),
                                        rng.randint(1, 3)))
            info = update_from_delta(
                spark, table, f"id IN ({','.join(map(str, pick))})",
                {"v": "v + 1000.0"},
                allow_protocol_upgrade=True,
            )
            if info["rows_updated"]:
                versions.append(info["version"])
        else:  # merge: update half the picks, insert fresh rows
            pick = rng.sample(live, min(len(live), 2))
            lo = next_id[0]
            next_id[0] += 1
            src = _batch(spark, lo, lo + 1).union(
                spark.createDataFrame(
                    [(int(i), "p0", -1.0) for i in pick],
                    "id long, part string, v double",
                )
            )
            info = merge_into_delta(
                spark, table, src, "t.id = s.id",
                when_matched_update={"v": "s.v"},
                allow_protocol_upgrade=True,
            )
            versions.append(info["version"])

    for v in versions[1:]:
        before = read_delta_table(spark, table, version=v - 1)
        after = read_delta_table(spark, table, version=v)
        want_add = sorted(
            (r.id, r.part, r.v)
            for r in after.exceptAll(before).collect()
        )
        want_del = sorted(
            (r.id, r.part, r.v)
            for r in before.exceptAll(after).collect()
        )
        ch = _changes(spark, table, v)
        from collections import Counter

        add_c = Counter(
            (r.id, r.part, r.v)
            for r in ch.where(
                F.col("_change_type").isin("insert", "update_postimage")
            ).collect()
        )
        del_c = Counter(
            (r.id, r.part, r.v)
            for r in ch.where(
                F.col("_change_type").isin("delete", "update_preimage")
            ).collect()
        )
        # a value-identical pre/post pair (no-op update) is real CDF
        # output but cancels in the snapshot diff — cancel it here too
        noop = add_c & del_c
        got_add = sorted((add_c - noop).elements())
        got_del = sorted((del_c - noop).elements())
        assert got_add == want_add, f"v{v} adds"
        assert got_del == want_del, f"v{v} deletes"


def test_checkpoint_and_vacuum_after_cdf_dml(spark, tmp_path):
    """A checkpoint written after CDF DML excludes cdc actions (spec:
    checkpoints carry no cdc) and the snapshot survives; vacuum
    retires aged _change_data files like data files."""
    import os
    import time as _time

    from data_lakehouse_project_spark.operators.delta_export import (
        write_foreign_checkpoint,
    )
    from data_lakehouse_project_spark.operators.foreign_maintenance import (
        vacuum_delta,
    )

    table = _cdf_table(spark, tmp_path)
    delete_from_delta(spark, table, "id < 2",
                      allow_protocol_upgrade=True)
    info = write_foreign_checkpoint(table)
    assert info["files"] >= 1
    got = sorted(r.id for r in read_delta_table(spark, table).collect())
    assert got == [2, 3, 4, 5]

    # age everything; vacuum must retire nothing REFERENCED — cdc
    # files of still-replayable commits are protected like data files
    plan = vacuum_delta(table, dry_run=True)
    assert not any("_change_data" in p for p in plan["deleted"])
    old = _time.time() - 30 * 24 * 3600
    for root, dirs, files in os.walk(table):
        for n in files:
            os.utime(os.path.join(root, n), (old, old))
    done = vacuum_delta(table, dry_run=False)
    # CDF files are only deletable per the tool's retention policy;
    # the table must stay readable either way
    got = sorted(r.id for r in read_delta_table(spark, table).collect())
    assert got == [2, 3, 4, 5]
    assert done is not None
