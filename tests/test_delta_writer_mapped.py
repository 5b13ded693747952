"""Foreign Delta DML on COLUMN-MAPPED tables (name + id modes): the
round-8 refusal is lifted — predicates arrive with logical names, the
scan translates through the physical parquet columns, and rewrites go
back out with physical names (+ parquet field ids in id mode).
Fixtures come from test_delta_reader (spec-shaped hand-built logs:
renamed/dropped columns, physical partitionValues keys)."""

from __future__ import annotations

import json
import os

import pyarrow.parquet as pq
import pytest

from data_lakehouse_project_spark.operators.delta_reader import (
    read_delta_snapshot,
    read_delta_table,
)
from data_lakehouse_project_spark.operators.delta_writer import (
    delete_from_delta,
    merge_into_delta,
    optimize_delta,
    update_from_delta,
)
from tests.test_delta_reader import _id_mode_table, _mapped_table


def test_delete_on_name_mapped_table(spark, tmp_path):
    table = _mapped_table(tmp_path)  # logical (id, vv, p); phys names
    info = delete_from_delta(
        spark, table, "id = 2 AND p = 'west'",
        allow_protocol_upgrade=True,
    )
    assert info["rows_deleted"] == 1
    got = sorted(
        (r.id, r.vv, r.p)
        for r in read_delta_table(spark, table).collect()
    )
    assert got == [(1, "a", "west"), (3, "c", "west")]
    # the upgrade enumerated the legacy-implied features (spec rule)
    snap = read_delta_snapshot(table)
    assert "columnMapping" in (snap.protocol.get("readerFeatures") or [])
    assert "columnMapping" in (snap.protocol.get("writerFeatures") or [])


def test_update_on_name_mapped_table_writes_physical(spark, tmp_path):
    table = _mapped_table(tmp_path)
    info = update_from_delta(
        spark, table, "id = 1", {"vv": "'ZZ'"},
        allow_protocol_upgrade=True,
    )
    assert info["rows_updated"] == 1
    got = {r.id: r.vv for r in read_delta_table(spark, table).collect()}
    assert got == {1: "ZZ", 2: "b", 3: "c"}
    # the rewritten file carries PHYSICAL column names, and its add's
    # partitionValues are keyed physically
    snap = read_delta_snapshot(table)
    new = [f for f in snap.files if f["path"].startswith("part-")]
    assert new
    for f in new:
        names = pq.read_schema(os.path.join(table, f["path"])).names
        assert "col-id0001" in names and "col-v0002" in names
        assert "id" not in names and "vv" not in names
        assert f["partition_values"] == {"col-p0004": "west"}


def test_merge_on_name_mapped_table(spark, tmp_path):
    table = _mapped_table(tmp_path)
    src = spark.createDataFrame(
        [(3, "CC", "west"), (9, "new", "east")],
        "id long, vv string, p string",
    )
    info = merge_into_delta(
        spark, table, src, "t.id = s.id",
        when_matched_update={"vv": "s.vv"},
        allow_protocol_upgrade=True,
    )
    assert (info["rows_updated"], info["rows_inserted"]) == (1, 1)
    got = sorted(
        (r.id, r.vv, r.p)
        for r in read_delta_table(spark, table).collect()
    )
    assert got == [
        (1, "a", "west"), (2, "b", "west"), (3, "CC", "west"),
        (9, "new", "east"),
    ]
    # logical partition pruning still works over the mixed files
    east = read_delta_table(spark, table, prune=[("p", "=", "east")])
    assert sorted(r.id for r in east.collect()) == [9]


def test_dml_on_id_mapped_table(spark, tmp_path):
    table = _id_mode_table(tmp_path)  # logical (id, renamed_v)
    info = delete_from_delta(
        spark, table, "renamed_v = 'b'", allow_protocol_upgrade=True
    )
    assert info["rows_deleted"] == 1
    update_from_delta(
        spark, table, "id = 3", {"renamed_v": "'Z'"},
        allow_protocol_upgrade=True,
    )
    got = sorted(
        (r.id, r.renamed_v)
        for r in read_delta_table(spark, table).collect()
    )
    assert got == [(1, "a"), (3, "Z")]
    # the rewritten file resolves by FIELD ID: physical names + ids
    snap = read_delta_snapshot(table)
    new = [f for f in snap.files if f["path"].startswith("part-")]
    assert new
    sch = pq.read_schema(os.path.join(table, new[0]["path"]))
    ids = {
        sch.field(i).name: (sch.field(i).metadata or {}).get(
            b"PARQUET:field_id"
        )
        for i in range(len(sch.names))
    }
    assert ids == {"col-id0001": b"1", "col-v0002": b"2"}


def test_cdf_dml_on_mapped_table(spark, tmp_path):
    """Column-mapped + CDF-enabled: DML emits physical-name cdc files
    and the CDF reader (which owns the mapping) replays them with
    logical names."""
    from data_lakehouse_project_spark.operators.delta_cdf import (
        read_delta_changes,
    )

    table = _mapped_table(tmp_path)
    v0 = os.path.join(table, "_delta_log", f"{0:020d}.json")
    lines = [json.loads(x) for x in open(v0)]
    for act in lines:
        if "metaData" in act:
            act["metaData"]["configuration"][
                "delta.enableChangeDataFeed"
            ] = "true"
    with open(v0, "w") as fh:
        for act in lines:
            fh.write(json.dumps(act) + "\n")

    info = update_from_delta(
        spark, table, "id = 2", {"vv": "'BB'"},
        allow_protocol_upgrade=True,
    )
    v = info["version"]
    commit = os.path.join(table, "_delta_log", f"{v:020d}.json")
    cdc = [
        json.loads(x)["cdc"] for x in open(commit) if '"cdc"' in x
    ]
    assert cdc
    for c in cdc:
        sch = pq.read_schema(os.path.join(table, c["path"]))
        assert "col-v0002" in sch.names and "vv" not in sch.names
        assert c["partitionValues"] == {"col-p0004": "west"}
    got = sorted(
        (r._change_type, r.id, r.vv)
        for r in read_delta_changes(
            spark, table, starting_version=v, ending_version=v
        ).select("_change_type", "id", "vv").collect()
    )
    assert got == [
        ("update_postimage", 2, "BB"),
        ("update_preimage", 2, "b"),
    ]


def test_optimize_on_mapped_table(spark, tmp_path):
    """OPTIMIZE on a column-mapped table compacts physically (the
    refusal is lifted): DVs applied, logical reads identical, stats
    keyed physically."""
    table = _mapped_table(tmp_path)
    # DV-delete a row so the single file qualifies for compaction
    delete_from_delta(spark, table, "id = 2",
                      allow_protocol_upgrade=True)
    before = sorted(
        (r.id, r.vv, r.p)
        for r in read_delta_table(spark, table).collect()
    )
    info = optimize_delta(spark, table)
    assert info["files_added"] >= 1
    after = sorted(
        (r.id, r.vv, r.p)
        for r in read_delta_table(spark, table).collect()
    )
    assert after == before
    snap = read_delta_snapshot(table)
    assert not any(f.get("foreign_dv") for f in snap.files)
    for f in snap.files:
        names = pq.read_schema(os.path.join(table, f["path"])).names
        assert "col-id0001" in names and "id" not in names


def test_streaming_cdc_relay_on_mapped_table(spark, tmp_path):
    """The streaming CDC source replays writer-emitted cdc commits on
    a COLUMN-MAPPED + CDF table with logical names (round-9 combo:
    mapped DML emits physical-name cdc files; the CDF reader owns the
    mapping; the stream rides the reader)."""
    from data_lakehouse_project_spark.sources.delta_stream import (
        DeltaStreamDataSource,
    )

    table = _mapped_table(tmp_path)
    v0 = os.path.join(table, "_delta_log", f"{0:020d}.json")
    lines = [json.loads(x) for x in open(v0)]
    for act in lines:
        if "metaData" in act:
            act["metaData"]["configuration"][
                "delta.enableChangeDataFeed"
            ] = "true"
    with open(v0, "w") as fh:
        for act in lines:
            fh.write(json.dumps(act) + "\n")

    delete_from_delta(spark, table, "id = 1",
                      allow_protocol_upgrade=True)
    update_from_delta(spark, table, "id = 3", {"vv": "'Z'"},
                      allow_protocol_upgrade=True)

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
        (r._commit_version, r._change_type, r.id, r.vv)
        for r in spark.read.parquet(out).collect()
    )
    assert rows == [
        (0, "insert", 1, "a"), (0, "insert", 2, "b"),
        (0, "insert", 3, "c"),
        (1, "delete", 1, "a"),
        (2, "update_postimage", 3, "Z"),
        (2, "update_preimage", 3, "c"),
    ]


def test_dml_on_mapped_row_tracking_table(spark, tmp_path):
    """Combined column mapping + rowTracking: UPDATE preserves row ids
    while reading/writing physical columns (the materialized row-id
    column is itself a physical name outside the mapping)."""
    import pyarrow as pa
    import pyarrow.parquet as _pq

    from tests.test_delta_reader import SCHEMA_MAPPED, _commit, _info

    table = str(tmp_path / "mrt")
    os.makedirs(table)
    fpath = os.path.join(table, "f0.parquet")
    _pq.write_table(
        pa.table(
            {
                "col-id0001": pa.array([1, 2, 3], pa.int64()),
                "col-v0002": pa.array(["a", "b", "c"], pa.string()),
            }
        ),
        fpath,
    )
    _commit(
        table,
        0,
        [
            {
                "protocol": {
                    "minReaderVersion": 3,
                    "minWriterVersion": 7,
                    "readerFeatures": ["columnMapping",
                                       "deletionVectors"],
                    "writerFeatures": ["columnMapping", "rowTracking",
                                       "domainMetadata",
                                       "deletionVectors"],
                }
            },
            {
                "metaData": {
                    "id": "mrt-0001",
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": SCHEMA_MAPPED,
                    "partitionColumns": [],
                    "configuration": {
                        "delta.columnMapping.mode": "name",
                        "delta.columnMapping.maxColumnId": "4",
                        "delta.enableRowTracking": "true",
                    },
                    "createdTime": 1700000000000,
                }
            },
            {
                "add": {
                    "path": "f0.parquet",
                    "partitionValues": {},
                    "size": os.path.getsize(fpath),
                    "modificationTime": 1700000001000,
                    "dataChange": True,
                    "stats": json.dumps({"numRecords": 3}),
                    "baseRowId": 0,
                    "defaultRowCommitVersion": 0,
                }
            },
            _info(1700000001000),
        ],
    )

    before = {
        r.id: r._row_id
        for r in read_delta_table(spark, table, row_ids=True).collect()
    }
    assert before == {1: 0, 2: 1, 3: 2}
    update_from_delta(spark, table, "id = 2", {"vv": "'BB'"})
    after = {
        r.id: (r._row_id, r.vv)
        for r in read_delta_table(spark, table, row_ids=True).collect()
    }
    assert after[2] == (1, "BB")  # id preserved through the rewrite
    assert {k: v[0] for k, v in after.items()} == before
    # the rewritten file: physical data names + the materialized id col
    snap = read_delta_snapshot(table)
    mat = snap.configuration[
        "delta.rowTracking.materializedRowIdColumnName"
    ]
    new = [f for f in snap.files if f["path"].startswith("part-")]
    assert new
    names = _pq.read_schema(os.path.join(table, new[0]["path"])).names
    assert "col-v0002" in names and mat in names and "vv" not in names


def test_columns_projection_on_mapped_tables(spark, tmp_path):
    """columns= projects through BOTH column-mapping modes (logical
    names in, physical resolution inside)."""
    from data_lakehouse_project_spark.operators.delta_reader import (
        read_delta_table as _read,
    )

    t_name = _mapped_table(tmp_path)     # logical (id, vv, p)
    got = _read(spark, t_name, columns=["vv"])
    assert got.columns == ["vv"]
    assert got.count() > 0

    t_id = _id_mode_table(tmp_path)
    got = _read(spark, t_id, columns=["renamed_v", "id"])
    assert got.columns == ["renamed_v", "id"]
    assert sorted((r.id, r.renamed_v) for r in got.collect()) == [
        (1, "a"), (2, "b"), (3, "c"),
    ]
    with pytest.raises(ValueError, match="nope"):
        _read(spark, t_id, columns=["nope"])
