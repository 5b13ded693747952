"""Foreign-fixture tests for the Iceberg v2 READER.

The fixture metadata tree is HAND-BUILT in this file straight from the
public table spec — two snapshots, a manifest shared across snapshots
with EXISTING/DELETED entry statuses, non-contiguous field ids, an
extra optional avro field, and a schema evolution — none of which the
export (operators/iceberg_export.py) ever produces in this shape, so a
pass proves the reader is not self-consistent-only.  Avro container
fixtures are written through the generic Java avro library (schemas
authored here, not the export's).
"""

from __future__ import annotations

import decimal
import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from data_lakehouse_project_spark.operators.iceberg_export import (
    _AvroWriter,
)
from data_lakehouse_project_spark.operators.iceberg_reader import (
    CorruptIcebergMetadata,
    UnsupportedIcebergFeature,
    iceberg_snapshot_ids,
    read_iceberg_table,
)

T1, T2 = 1700000100000, 1700000200000

SCHEMA_0 = {
    "type": "struct",
    "schema-id": 0,
    "fields": [
        {"id": 7, "name": "id", "required": False, "type": "long"},
        {"id": 12, "name": "name", "required": False, "type": "string"},
        {
            "id": 19,
            "name": "score",
            "required": False,
            "type": "decimal(10, 2)",
        },
    ],
}
SCHEMA_1 = {
    "type": "struct",
    "schema-id": 1,
    "fields": SCHEMA_0["fields"]
    + [{"id": 23, "name": "tag", "required": False, "type": "string"}],
}

# avro schemas authored HERE, with an extra optional field and a field
# order the export never emits
MANIFEST_ENTRY_AVRO = json.dumps(
    {
        "type": "record",
        "name": "manifest_entry",
        "fields": [
            {"name": "status", "type": "int", "field-id": 0},
            {
                "name": "snapshot_id",
                "type": ["null", "long"],
                "default": None,
                "field-id": 1,
            },
            {
                "name": "sequence_number",
                "type": ["null", "long"],
                "default": None,
                "field-id": 3,
            },
            {
                "name": "data_file",
                "field-id": 2,
                "type": {
                    "type": "record",
                    "name": "r2",
                    "fields": [
                        {
                            "name": "file_path",
                            "type": "string",
                            "field-id": 100,
                        },
                        {
                            "name": "file_format",
                            "type": "string",
                            "field-id": 101,
                        },
                        {"name": "content", "type": "int", "field-id": 134},
                        {
                            "name": "partition",
                            "field-id": 102,
                            "type": {
                                "type": "record",
                                "name": "r102",
                                "fields": [],
                            },
                        },
                        {
                            "name": "record_count",
                            "type": "long",
                            "field-id": 103,
                        },
                        {
                            "name": "file_size_in_bytes",
                            "type": "long",
                            "field-id": 104,
                        },
                        {
                            "name": "key_metadata",
                            "type": ["null", "bytes"],
                            "default": None,
                            "field-id": 131,
                        },
                        {
                            "name": "equality_ids",
                            "type": ["null", {"type": "array",
                                              "items": "int"}],
                            "default": None,
                            "field-id": 135,
                        },
                        {
                            "name": "lower_bounds",
                            "type": ["null", {"type": "array", "items": {
                                "type": "record", "name": "k126_v127",
                                "fields": [
                                    {"name": "key", "type": "int",
                                     "field-id": 126},
                                    {"name": "value", "type": "bytes",
                                     "field-id": 127},
                                ]}}],
                            "default": None,
                            "field-id": 125,
                        },
                        {
                            "name": "upper_bounds",
                            "type": ["null", {"type": "array", "items": {
                                "type": "record", "name": "k129_v130",
                                "fields": [
                                    {"name": "key", "type": "int",
                                     "field-id": 129},
                                    {"name": "value", "type": "bytes",
                                     "field-id": 130},
                                ]}}],
                            "default": None,
                            "field-id": 128,
                        },
                    ],
                },
            },
        ],
    }
)
MANIFEST_FILE_AVRO = json.dumps(
    {
        "type": "record",
        "name": "manifest_file",
        "fields": [
            {"name": "manifest_path", "type": "string", "field-id": 500},
            {"name": "manifest_length", "type": "long", "field-id": 501},
            {"name": "partition_spec_id", "type": "int", "field-id": 502},
            {"name": "content", "type": "int", "field-id": 517},
            {"name": "sequence_number", "type": "long", "field-id": 515},
            {
                "name": "min_sequence_number",
                "type": "long",
                "field-id": 516,
            },
            {"name": "added_snapshot_id", "type": "long", "field-id": 503},
        ],
    }
)


def _data_file(table, name, ids, names, scores, tags=None):
    cols = {
        "id": pa.array(ids, pa.int64()),
        "name": pa.array(names, pa.string()),
        "score": pa.array(
            [decimal.Decimal(s) for s in scores], pa.decimal128(10, 2)
        ),
    }
    if tags is not None:
        cols["tag"] = pa.array(tags, pa.string())
    os.makedirs(os.path.join(table, "data"), exist_ok=True)
    path = os.path.join(table, "data", name)
    pq.write_table(pa.table(cols), path)
    return path


def _manifest(spark, table, name, entries):
    path = os.path.join(table, "metadata", name)
    w = _AvroWriter(
        spark,
        MANIFEST_ENTRY_AVRO,
        path,
        {
            "schema": json.dumps(SCHEMA_1),
            "partition-spec": "[]",
            "partition-spec-id": "0",
            "format-version": "2",
            "content": "data",
        },
    )
    for e in entries:
        w.append_dict(e)
    w.close()
    return path


def _entry(status, fpath, n_rows, fmt="PARQUET", content=0, seq=None,
           equality_ids=None, bounds=None):
    return {
        "status": status,
        "snapshot_id": 101,
        "sequence_number": seq,
        "data_file": {
            "file_path": fpath,
            "file_format": fmt,
            "content": content,
            "partition": {},
            "record_count": n_rows,
            "file_size_in_bytes": os.path.getsize(fpath)
            if os.path.exists(fpath)
            else 0,
            "key_metadata": None,
            "equality_ids": equality_ids,
            "lower_bounds": bounds[0] if bounds else None,
            "upper_bounds": bounds[1] if bounds else None,
        },
    }


def _manifest_list(spark, table, name, manifest_paths, snap_id):
    path = os.path.join(table, "metadata", name)
    w = _AvroWriter(
        spark, MANIFEST_FILE_AVRO, path, {"format-version": "2"}
    )
    for mp, content, *rest in manifest_paths:
        seq = rest[0] if rest else 1
        w.append_dict(
            {
                "manifest_path": mp,
                "manifest_length": os.path.getsize(mp),
                "partition_spec_id": 0,
                "content": content,
                "sequence_number": seq,
                "min_sequence_number": seq,
                "added_snapshot_id": snap_id,
            }
        )
    w.close()
    return path


def _metadata(table, version, schemas, current_schema, snapshots, cur, log):
    md = {
        "format-version": 2,
        "table-uuid": "11111111-2222-3333-4444-555555555555",
        "location": table,
        "last-sequence-number": 2,
        "last-updated-ms": T2,
        "last-column-id": 23,
        "schemas": schemas,
        "current-schema-id": current_schema,
        "partition-specs": [{"spec-id": 0, "fields": []}],
        "default-spec-id": 0,
        "last-partition-id": 999,
        "sort-orders": [{"order-id": 0, "fields": []}],
        "default-sort-order-id": 0,
        "snapshots": snapshots,
        "current-snapshot-id": cur,
        "snapshot-log": log,
        "refs": {
            "main": {"snapshot-id": cur, "type": "branch"}
        },
    }
    path = os.path.join(table, "metadata", f"v{version}.metadata.json")
    with open(path, "w") as fh:
        json.dump(md, fh)
    return path


@pytest.fixture(scope="module")
def foreign_iceberg(spark, tmp_path_factory):
    """Snapshot 101: files A+B.  Snapshot 202: B deleted via a rewritten
    shared manifest (EXISTING A / DELETED B), file C added with the
    evolved schema (new ``tag`` column)."""
    table = str(tmp_path_factory.mktemp("ice") / "tbl")
    os.makedirs(os.path.join(table, "metadata"))
    fa = _data_file(
        table, "a.parquet", [1, 2], ["ann", "bob"], ["1.50", "2.25"]
    )
    fb = _data_file(table, "b.parquet", [3], ["cat"], ["3.75"])
    fc = _data_file(
        table, "c.parquet", [4, 5], ["dan", "eve"],
        ["4.00", "5.50"], tags=["x", "y"],
    )

    m1 = _manifest(
        spark, table, "m1.avro",
        [_entry(1, fa, 2), _entry(1, fb, 1)],
    )
    list1 = _manifest_list(spark, table, "snap-101.avro", [(m1, 0)], 101)

    # snapshot 202 rewrites m1 (A EXISTING, B DELETED) and adds m2
    m1b = _manifest(
        spark, table, "m1-rewrite.avro",
        [_entry(0, fa, 2), _entry(2, fb, 1)],
    )
    m2 = _manifest(spark, table, "m2.avro", [_entry(1, fc, 2)])
    list2 = _manifest_list(
        spark, table, "snap-202.avro", [(m1b, 0), (m2, 0)], 202
    )

    snap101 = {
        "snapshot-id": 101,
        "timestamp-ms": T1,
        "sequence-number": 1,
        "manifest-list": list1,
        "summary": {"operation": "append"},
        "schema-id": 0,
    }
    snap202 = {
        "snapshot-id": 202,
        "timestamp-ms": T2,
        "sequence-number": 2,
        "manifest-list": list2,
        "summary": {"operation": "overwrite"},
        "schema-id": 1,
    }
    _metadata(
        table, 1, [SCHEMA_0], 0, [snap101], 101,
        [{"snapshot-id": 101, "timestamp-ms": T1}],
    )
    _metadata(
        table, 2, [SCHEMA_0, SCHEMA_1], 1, [snap101, snap202], 202,
        [
            {"snapshot-id": 101, "timestamp-ms": T1},
            {"snapshot-id": 202, "timestamp-ms": T2},
        ],
    )
    with open(
        os.path.join(table, "metadata", "version-hint.text"), "w"
    ) as fh:
        fh.write("2")
    return table


def test_current_snapshot_rows(spark, foreign_iceberg):
    df = read_iceberg_table(spark, foreign_iceberg)
    assert df.columns == ["id", "name", "score", "tag"]
    rows = {(r.id, r.name, str(r.score), r.tag) for r in df.collect()}
    assert rows == {
        (1, "ann", "1.50", None),  # pre-evolution file: tag null
        (2, "bob", "2.25", None),
        (4, "dan", "4.00", "x"),  # B (id=3) deleted at snapshot 202
        (5, "eve", "5.50", "y"),
    }


def test_snapshot_id_and_time_travel(spark, foreign_iceberg):
    old = read_iceberg_table(spark, foreign_iceberg, snapshot_id=101)
    assert {r.id for r in old.collect()} == {1, 2, 3}
    asof = read_iceberg_table(spark, foreign_iceberg, as_of_ms=T1 + 5)
    assert {r.id for r in asof.collect()} == {1, 2, 3}
    assert iceberg_snapshot_ids(foreign_iceberg) == [(101, T1), (202, T2)]
    with pytest.raises(ValueError, match="no snapshot at or before"):
        read_iceberg_table(spark, foreign_iceberg, as_of_ms=7)


def test_explicit_metadata_file(spark, foreign_iceberg):
    v1 = os.path.join(foreign_iceberg, "metadata", "v1.metadata.json")
    df = read_iceberg_table(spark, foreign_iceberg, metadata_file=v1)
    assert df.columns == ["id", "name", "score"]  # schema 0
    assert {r.id for r in df.collect()} == {1, 2, 3}


def test_version_hint_fallback(spark, foreign_iceberg):
    os.remove(
        os.path.join(foreign_iceberg, "metadata", "version-hint.text")
    )
    try:
        df = read_iceberg_table(spark, foreign_iceberg)
        assert {r.id for r in df.collect()} == {1, 2, 4, 5}
    finally:
        with open(
            os.path.join(foreign_iceberg, "metadata", "version-hint.text"),
            "w",
        ) as fh:
            fh.write("2")


def test_reject_unknown_format_version(spark, tmp_path):
    # v3 reads are supported since round 10 — the refusal boundary
    # moved to format-version 4
    table = str(tmp_path / "t4")
    os.makedirs(os.path.join(table, "metadata"))
    with open(
        os.path.join(table, "metadata", "v1.metadata.json"), "w"
    ) as fh:
        json.dump({"format-version": 4}, fh)
    with pytest.raises(UnsupportedIcebergFeature, match="format-version"):
        read_iceberg_table(spark, table)


def _pos_delete_file(table, name, pairs):
    """Spec §Position Delete Files: parquet of (file_path, pos),
    sorted by (file_path, pos)."""
    os.makedirs(os.path.join(table, "data"), exist_ok=True)
    path = os.path.join(table, "data", name)
    pairs = sorted(pairs)
    pq.write_table(
        pa.table(
            {
                "file_path": pa.array([p for p, _ in pairs], pa.string()),
                "pos": pa.array([i for _, i in pairs], pa.int64()),
            }
        ),
        path,
    )
    return path


def _one_snapshot_md(table, lst, op="delete"):
    _metadata(
        table, 1, [SCHEMA_0], 0,
        [
            {
                "snapshot-id": 9,
                "timestamp-ms": T1,
                "sequence-number": 1,
                "manifest-list": lst,
                "summary": {"operation": op},
                "schema-id": 0,
            }
        ],
        9,
        [{"snapshot-id": 9, "timestamp-ms": T1}],
    )


def test_position_deletes_applied(spark, tmp_path):
    """v2 positional deletes: a delete manifest's parquet of
    (file_path, pos) rows removes exactly those row indexes from the
    matching data file — other files untouched."""
    table = str(tmp_path / "t4")
    os.makedirs(os.path.join(table, "metadata"))
    fa = _data_file(
        table, "a.parquet", [1, 2, 3, 4, 5],
        ["a", "b", "c", "d", "e"],
        ["1.00", "2.00", "3.00", "4.00", "5.00"],
    )
    fb = _data_file(table, "b.parquet", [6], ["f"], ["6.00"])
    fdel = _pos_delete_file(table, "del-1.parquet", [(fa, 0), (fa, 2)])
    m_data = _manifest(
        spark, table, "m.avro", [_entry(1, fa, 5), _entry(1, fb, 1)]
    )
    m_del = _manifest(
        spark, table, "mdel.avro", [_entry(1, fdel, 2, content=1)]
    )
    lst = _manifest_list(
        spark, table, "snap-9.avro", [(m_data, 0), (m_del, 1)], 9
    )
    _one_snapshot_md(table, lst)
    df = read_iceberg_table(spark, table)
    assert sorted(r.id for r in df.collect()) == [2, 4, 5, 6]


def _eq_delete_file(table, name, ids):
    """Equality delete parquet: just the equality column(s)' values."""
    os.makedirs(os.path.join(table, "data"), exist_ok=True)
    path = os.path.join(table, "data", name)
    pq.write_table(pa.table({"id": pa.array(ids, pa.int64())}), path)
    return path


def test_equality_deletes_applied_with_sequence_rule(spark, tmp_path):
    """CDC shape a Flink writer produces: data file A at seq 1; an
    equality delete (on field id 7 = ``id``) for ids {2, 3} at seq 2;
    data file B at seq 3 RE-INSERTING id 2.  The delete applies only
    to STRICTLY OLDER data, so A loses 2 and 3 but B's 2 survives."""
    table = str(tmp_path / "teq")
    os.makedirs(os.path.join(table, "metadata"))
    fa = _data_file(
        table, "a.parquet", [1, 2, 3, 4],
        ["a", "b", "c", "d"], ["1.00", "2.00", "3.00", "4.00"],
    )
    fb = _data_file(table, "b.parquet", [2], ["B2"], ["9.00"])
    fdel = _eq_delete_file(table, "eqdel.parquet", [2, 3])
    m_a = _manifest(spark, table, "ma.avro", [_entry(1, fa, 4, seq=1)])
    m_b = _manifest(spark, table, "mb.avro", [_entry(1, fb, 1, seq=3)])
    m_del = _manifest(
        spark, table, "mdel.avro",
        [_entry(1, fdel, 2, content=2, seq=2, equality_ids=[7])],
    )
    lst = _manifest_list(
        spark, table, "snap-9.avro",
        [(m_a, 0, 1), (m_b, 0, 3), (m_del, 1, 2)], 9,
    )
    _one_snapshot_md(table, lst)
    rows = sorted(
        (r.id, r.name) for r in read_iceberg_table(spark, table).collect()
    )
    assert rows == [(1, "a"), (2, "B2"), (4, "d")]


def test_equality_delete_seq_inherited_from_manifest(spark, tmp_path):
    """Entries ADDED with a null sequence_number inherit the
    manifest's (the spec's inheritance rule)."""
    table = str(tmp_path / "teqi")
    os.makedirs(os.path.join(table, "metadata"))
    fa = _data_file(table, "a.parquet", [1, 2], ["a", "b"],
                    ["1.00", "2.00"])
    fdel = _eq_delete_file(table, "eqdel.parquet", [1])
    m_a = _manifest(spark, table, "ma.avro", [_entry(1, fa, 2)])
    m_del = _manifest(
        spark, table, "mdel.avro",
        [_entry(1, fdel, 1, content=2, equality_ids=[7])],
    )
    lst = _manifest_list(
        spark, table, "snap-9.avro", [(m_a, 0, 1), (m_del, 1, 2)], 9
    )
    _one_snapshot_md(table, lst)
    got = read_iceberg_table(spark, table)
    assert sorted(r.id for r in got.collect()) == [2]


def test_equality_delete_unsequenced_refused(spark, tmp_path):
    """An EXISTING entry with no explicit sequence number cannot be
    sequenced against a delete — refuse, never guess."""
    table = str(tmp_path / "tequ")
    os.makedirs(os.path.join(table, "metadata"))
    fa = _data_file(table, "a.parquet", [1], ["a"], ["1.00"])
    fdel = _eq_delete_file(table, "eqdel.parquet", [1])
    m_a = _manifest(spark, table, "ma.avro", [_entry(0, fa, 1)])  # EXISTING
    m_del = _manifest(
        spark, table, "mdel.avro",
        [_entry(1, fdel, 1, content=2, seq=2, equality_ids=[7])],
    )
    lst = _manifest_list(
        spark, table, "snap-9.avro", [(m_a, 0, 1), (m_del, 1, 2)], 9
    )
    _one_snapshot_md(table, lst)
    with pytest.raises(UnsupportedIcebergFeature, match="sequence"):
        read_iceberg_table(spark, table)


def test_equality_delete_unknown_field_refused(spark, tmp_path):
    table = str(tmp_path / "tequf")
    os.makedirs(os.path.join(table, "metadata"))
    fa = _data_file(table, "a.parquet", [1], ["a"], ["1.00"])
    fdel = _eq_delete_file(table, "eqdel.parquet", [1])
    m_a = _manifest(spark, table, "ma.avro", [_entry(1, fa, 1, seq=1)])
    m_del = _manifest(
        spark, table, "mdel.avro",
        [_entry(1, fdel, 1, content=2, seq=2, equality_ids=[999])],
    )
    lst = _manifest_list(
        spark, table, "snap-9.avro", [(m_a, 0, 1), (m_del, 1, 2)], 9
    )
    _one_snapshot_md(table, lst)
    with pytest.raises(UnsupportedIcebergFeature, match="unknown field"):
        read_iceberg_table(spark, table)


def test_equality_delete_without_ids_refused(spark, tmp_path):
    table = str(tmp_path / "teqn")
    os.makedirs(os.path.join(table, "metadata"))
    fa = _data_file(table, "a.parquet", [1], ["a"], ["1.00"])
    fdel = _eq_delete_file(table, "eqdel.parquet", [1])
    m_a = _manifest(spark, table, "ma.avro", [_entry(1, fa, 1, seq=1)])
    m_del = _manifest(
        spark, table, "mdel.avro",
        [_entry(1, fdel, 1, content=2, seq=2)],
    )
    lst = _manifest_list(
        spark, table, "snap-9.avro", [(m_a, 0, 1), (m_del, 1, 2)], 9
    )
    _one_snapshot_md(table, lst)
    with pytest.raises(UnsupportedIcebergFeature, match="equality_ids"):
        read_iceberg_table(spark, table)


def test_reject_delete_file_and_foreign_format(spark, tmp_path):
    for kwargs, msg in (
        ({"content": 1}, "DATA manifest"),
        ({"fmt": "ORC"}, "file format"),
    ):
        table = str(tmp_path / f"t5-{msg.split()[0]}")
        os.makedirs(os.path.join(table, "metadata"))
        fa = _data_file(table, "a.parquet", [1], ["a"], ["1.00"])
        m = _manifest(
            spark, table, "m.avro", [_entry(1, fa, 1, **kwargs)]
        )
        lst = _manifest_list(spark, table, "snap-9.avro", [(m, 0)], 9)
        _metadata(
            table, 1, [SCHEMA_0], 0,
            [
                {
                    "snapshot-id": 9,
                    "timestamp-ms": T1,
                    "sequence-number": 1,
                    "manifest-list": lst,
                    "summary": {"operation": "append"},
                    "schema-id": 0,
                }
            ],
            9,
            [{"snapshot-id": 9, "timestamp-ms": T1}],
        )
        with pytest.raises(UnsupportedIcebergFeature, match=msg):
            read_iceberg_table(spark, table)


def test_reads_own_export(spark, tmp_path):
    """The reader also consumes what export_iceberg_metadata writes —
    both directions of the Iceberg surface round-trip."""
    from pyspark.sql import functions as F

    from data_lakehouse_project_spark.operators.iceberg_export import (
        export_iceberg_metadata,
    )
    from data_lakehouse_project_spark.operators.txnlog import TxnTable

    path = str(tmp_path / "own")
    t = TxnTable(path)
    t.write(
        spark.range(0, 50).select(
            "id", (F.col("id") % 3).alias("g"), (F.col("id") * 2.0).alias("v")
        ),
        mode="overwrite",
    )
    t.delete_where(spark, "g = 1")
    export_iceberg_metadata(t, spark)
    got = read_iceberg_table(spark, path)
    assert sorted(got.collect()) == sorted(t.read(spark).collect())


# ------------------------------------------------------ prune / skipping


def _long_bound(v):
    import struct

    return struct.pack("<q", v).decode("latin-1")


def test_prune_skips_files_by_bounds_and_partition(spark, tmp_path):
    """File skipping over manifest lower/upper bounds (spec binary
    single-value serialization) — the skipped file's rows must not
    appear even though its parquet would match nothing, and predicates
    are re-applied so results stay exact."""
    table = str(tmp_path / "tprune")
    os.makedirs(os.path.join(table, "metadata"))
    fa = _data_file(table, "a.parquet", [1, 2], ["a", "b"],
                    ["1.00", "2.00"])
    fb = _data_file(table, "b.parquet", [100, 200], ["x", "y"],
                    ["3.00", "4.00"])
    m = _manifest(
        spark, table, "m.avro",
        [
            _entry(1, fa, 2, seq=1,
                   bounds=([{"key": 7, "value": _long_bound(1)}],
                           [{"key": 7, "value": _long_bound(2)}])),
            _entry(1, fb, 2, seq=1,
                   bounds=([{"key": 7, "value": _long_bound(100)}],
                           [{"key": 7, "value": _long_bound(200)}])),
        ],
    )
    lst = _manifest_list(spark, table, "snap-9.avro", [(m, 0, 1)], 9)
    _one_snapshot_md(table, lst, op="append")

    from data_lakehouse_project_spark.operators.iceberg_reader import (
        iceberg_live_files,
        load_iceberg_metadata,
        _field_names_by_id,
        _field_types_by_id,
        _identity_partition_sources,
        _iceberg_file_may_match,
    )

    # driver-side: the bounds provably exclude file A for id >= 50
    md = load_iceberg_metadata(table)
    _, live, _, _ = iceberg_live_files(spark, table)
    name2id = {v: k for k, v in _field_names_by_id(md).items()}
    typed = [(name2id["id"], ">=", 50, _field_types_by_id(md)[name2id["id"]])]
    part_of = _identity_partition_sources(md)
    kept = [f for f in live
            if _iceberg_file_may_match(f, typed, part_of)]
    assert [os.path.basename(f["file_path"]) for f in kept] == ["b.parquet"]

    # end to end: one file scanned, exact rows out
    df = read_iceberg_table(spark, table, prune=[("id", ">=", 50)])
    assert sorted(r.id for r in df.collect()) == [100, 200]
    # boundary: no stats would prove id=2 absent from file B only
    df2 = read_iceberg_table(spark, table, prune=[("id", "=", 2)])
    assert sorted(r.id for r in df2.collect()) == [2]


def test_prune_without_stats_never_drops_rows(spark, tmp_path):
    """Files carrying NO bounds are always kept (prune is conservative)
    and the re-applied predicate still yields exact results."""
    table = str(tmp_path / "tprune2")
    os.makedirs(os.path.join(table, "metadata"))
    fa = _data_file(table, "a.parquet", [1, 2, 3], ["a", "b", "c"],
                    ["1.00", "2.00", "3.00"])
    m = _manifest(spark, table, "m.avro", [_entry(1, fa, 3, seq=1)])
    lst = _manifest_list(spark, table, "snap-9.avro", [(m, 0, 1)], 9)
    _one_snapshot_md(table, lst, op="append")
    df = read_iceberg_table(spark, table, prune=[("id", ">", 1)])
    assert sorted(r.id for r in df.collect()) == [2, 3]


def test_field_id_resolution_reads_renamed_columns(spark, tmp_path):
    """Iceberg resolves parquet columns by FIELD ID: a column renamed
    after files were written still reads its pre-rename files (name-
    based resolution would silently null it)."""
    table = str(tmp_path / "tren")
    os.makedirs(os.path.join(table, "metadata"))
    os.makedirs(os.path.join(table, "data"))
    fpath = os.path.join(table, "data", "old.parquet")
    sch = pa.schema(
        [
            pa.field("id", pa.int64(),
                     metadata={b"PARQUET:field_id": b"7"}),
            pa.field("old_name", pa.string(),
                     metadata={b"PARQUET:field_id": b"12"}),
        ]
    )
    pq.write_table(
        pa.table(
            {"id": pa.array([1, 2], pa.int64()),
             "old_name": pa.array(["x", "y"], pa.string())},
            schema=sch,
        ),
        fpath,
    )
    renamed_schema = {
        "type": "struct",
        "schema-id": 0,
        "fields": [
            {"id": 7, "name": "id", "required": False, "type": "long"},
            # renamed AFTER old.parquet was written; same field id
            {"id": 12, "name": "new_name", "required": False,
             "type": "string"},
        ],
    }
    m = _manifest(spark, table, "m.avro", [_entry(1, fpath, 2, seq=1)])
    lst = _manifest_list(spark, table, "snap-9.avro", [(m, 0, 1)], 9)
    _metadata(
        table, 1, [renamed_schema], 0,
        [
            {
                "snapshot-id": 9,
                "timestamp-ms": T1,
                "sequence-number": 1,
                "manifest-list": lst,
                "summary": {"operation": "append"},
                "schema-id": 0,
            }
        ],
        9,
        [{"snapshot-id": 9, "timestamp-ms": T1}],
    )
    df = read_iceberg_table(spark, table)
    assert df.columns == ["id", "new_name"]
    assert sorted((r.id, r.new_name) for r in df.collect()) == [
        (1, "x"), (2, "y"),
    ]


def test_prune_covers_evolved_partition_specs(spark, tmp_path):
    """Partition evolution: a file written under an OLDER spec prunes
    with THAT spec's identity fields (resolved via the manifest's
    partition_spec_id), not the default spec's — previously old-spec
    files silently lost partition-prune coverage."""
    import copy

    table = str(tmp_path / "tevo")
    os.makedirs(os.path.join(table, "metadata"))
    # file A (old spec 0: identity on name), file B (new spec 1:
    # unpartitioned); neither carries column bounds, so any pruning
    # must come from partition values alone
    fa = _data_file(table, "a.parquet", [1, 2], ["west", "west"],
                    ["1.00", "2.00"])
    fb = _data_file(table, "b.parquet", [3], ["east"], ["3.00"])

    entry_schema_p = json.loads(MANIFEST_ENTRY_AVRO)
    part_rec = copy.deepcopy(entry_schema_p)
    for f in part_rec["fields"]:
        if f["name"] == "data_file":
            for df_f in f["type"]["fields"]:
                if df_f["name"] == "partition":
                    df_f["type"]["fields"] = [
                        {"name": "name",
                         "type": ["null", "string"],
                         "default": None, "field-id": 1000}
                    ]
                    df_f["type"]["name"] = "r102p"

    def _mani(name, schema_json, spec_id, entries):
        path = os.path.join(table, "metadata", name)
        w = _AvroWriter(
            spark, json.dumps(schema_json), path,
            {"schema": json.dumps(SCHEMA_0),
             "partition-spec-id": str(spec_id),
             "format-version": "2", "content": "data"},
        )
        for e in entries:
            w.append_dict(e)
        w.close()
        return path

    ea = _entry(1, fa, 2, seq=1)
    ea["data_file"]["partition"] = {"name": "west"}
    m0 = _mani("m0.avro", part_rec, 0, [ea])
    m1 = _mani("m1.avro", entry_schema_p, 1, [_entry(1, fb, 1, seq=2)])

    lst = os.path.join(table, "metadata", "snap-9.avro")
    w = _AvroWriter(spark, MANIFEST_FILE_AVRO, lst,
                    {"format-version": "2"})
    for mp, spec_id, seq in ((m0, 0, 1), (m1, 1, 2)):
        w.append_dict({
            "manifest_path": mp,
            "manifest_length": os.path.getsize(mp),
            "partition_spec_id": spec_id,
            "content": 0,
            "sequence_number": seq,
            "min_sequence_number": seq,
            "added_snapshot_id": 9,
        })
    w.close()

    md_dict = {
        "format-version": 2,
        "table-uuid": "11111111-2222-3333-4444-666666666666",
        "location": table,
        "last-sequence-number": 2,
        "last-updated-ms": T1,
        "last-column-id": 23,
        "schemas": [SCHEMA_0],
        "current-schema-id": 0,
        "partition-specs": [
            {"spec-id": 0, "fields": [
                {"name": "name", "transform": "identity",
                 "source-id": 12, "field-id": 1000}]},
            {"spec-id": 1, "fields": []},
        ],
        "default-spec-id": 1,
        "last-partition-id": 1000,
        "sort-orders": [{"order-id": 0, "fields": []}],
        "default-sort-order-id": 0,
        "snapshots": [{
            "snapshot-id": 9, "timestamp-ms": T1,
            "sequence-number": 2, "manifest-list": lst,
            "summary": {"operation": "append"}, "schema-id": 0,
        }],
        "current-snapshot-id": 9,
        "snapshot-log": [{"snapshot-id": 9, "timestamp-ms": T1}],
        "refs": {"main": {"snapshot-id": 9, "type": "branch"}},
    }
    with open(os.path.join(table, "metadata", "v1.metadata.json"),
              "w") as fh:
        json.dump(md_dict, fh)

    from data_lakehouse_project_spark.operators.iceberg_reader import (
        _field_names_by_id,
        _field_types_by_id,
        _iceberg_file_may_match,
        _identity_sources_by_spec,
        iceberg_live_files,
        load_iceberg_metadata,
    )

    md = load_iceberg_metadata(table)
    _, live, _, _ = iceberg_live_files(spark, table)
    assert {f.get("__spec_id") for f in live} == {0, 1}
    name2id = {v: k for k, v in _field_names_by_id(md).items()}
    typed = [(name2id["name"], "=", "east",
              _field_types_by_id(md)[name2id["name"]])]
    by_spec = _identity_sources_by_spec(md)
    kept = [
        f for f in live
        if _iceberg_file_may_match(
            f, typed, by_spec.get(f.get("__spec_id"), {})
        )
    ]
    # file A (old spec, partition name=west) is PROVABLY excluded
    assert [os.path.basename(f["file_path"]) for f in kept] == [
        "b.parquet"
    ]
    # end to end: only B scanned, exact rows out
    df = read_iceberg_table(spark, table, prune=[("name", "=", "east")])
    assert sorted((r.id, r.name) for r in df.collect()) == [(3, "east")]
    # old-spec partition values still prune in the other direction too
    df2 = read_iceberg_table(spark, table,
                             prune=[("name", "=", "west")])
    assert sorted(r.id for r in df2.collect()) == [1, 2]


def test_incremental_append_scan(spark, tmp_path):
    """read_iceberg_changes: rows ADDED by each snapshot in
    (from, to], attributed via entry.snapshot_id (manifest-inherited
    when null); shared manifests with EXISTING entries contribute
    nothing; from=None replays the whole append history."""
    from data_lakehouse_project_spark.operators.iceberg_reader import (
        read_iceberg_changes,
    )

    table = str(tmp_path / "tinc")
    os.makedirs(os.path.join(table, "metadata"))
    fa = _data_file(table, "a.parquet", [1, 2], ["a", "b"],
                    ["1.00", "2.00"])
    fb = _data_file(table, "b.parquet", [3], ["c"], ["3.00"])

    ea = _entry(1, fa, 2, seq=1)
    ea["snapshot_id"] = 9
    mA = _manifest(spark, table, "mA.avro", [ea])
    ea_existing = _entry(0, fa, 2, seq=1)
    ea_existing["snapshot_id"] = 9
    eb = _entry(1, fb, 1, seq=2)
    eb["snapshot_id"] = None  # inherits the manifest's added snapshot
    mA2 = _manifest(spark, table, "mA2.avro", [ea_existing])
    mB = _manifest(spark, table, "mB.avro", [eb])

    def _list(name, manifests, snap_id):
        path = os.path.join(table, "metadata", name)
        w = _AvroWriter(spark, MANIFEST_FILE_AVRO, path,
                        {"format-version": "2"})
        for mp, seq in manifests:
            w.append_dict({
                "manifest_path": mp,
                "manifest_length": os.path.getsize(mp),
                "partition_spec_id": 0, "content": 0,
                "sequence_number": seq, "min_sequence_number": seq,
                "added_snapshot_id": snap_id if mp in (mA, mB) else 9,
            })
        w.close()
        return path

    l9 = _list("snap-9.avro", [(mA, 1)], 9)
    l10 = _list("snap-10.avro", [(mA2, 1), (mB, 2)], 10)
    snap9 = {"snapshot-id": 9, "timestamp-ms": T1,
             "sequence-number": 1, "manifest-list": l9,
             "summary": {"operation": "append"}, "schema-id": 0}
    snap10 = {"snapshot-id": 10, "timestamp-ms": T2,
              "sequence-number": 2, "manifest-list": l10,
              "summary": {"operation": "append"}, "schema-id": 0}
    _metadata(
        table, 1, [SCHEMA_0], 0, [snap9, snap10], 10,
        [{"snapshot-id": 9, "timestamp-ms": T1},
         {"snapshot-id": 10, "timestamp-ms": T2}],
    )

    full = read_iceberg_changes(spark, table)
    assert sorted((r.id, r._snapshot_id) for r in full.collect()) == [
        (1, 9), (2, 9), (3, 10),
    ]
    assert {r._committed_at for r in full.collect()} == {T1, T2}
    tail = read_iceberg_changes(spark, table, from_snapshot_id=9)
    assert sorted((r.id, r._snapshot_id) for r in tail.collect()) == [
        (3, 10),
    ]
    only9 = read_iceberg_changes(spark, table, to_snapshot_id=9)
    assert sorted(r.id for r in only9.collect()) == [1, 2]
    with pytest.raises(ValueError, match="ancestor"):
        read_iceberg_changes(spark, table, from_snapshot_id=10,
                             to_snapshot_id=9)


def test_incremental_scan_delegates_non_append(
    spark, foreign_iceberg
):
    """An overwrite snapshot in the range DELEGATES to the exact
    changelog (round 11; this used to refuse) — the scan equals the
    changelog's insert rows for the same range."""
    from data_lakehouse_project_spark.operators.iceberg_reader import (
        read_iceberg_changelog,
        read_iceberg_changes,
    )

    # the pure-append prefix replays fine (direct manifest path)
    head = read_iceberg_changes(
        spark, foreign_iceberg, to_snapshot_id=101
    )
    assert sorted((r.id, r._snapshot_id) for r in head.collect()) == [
        (1, 101), (2, 101), (3, 101),
    ]
    inc = read_iceberg_changes(
        spark, foreign_iceberg, from_snapshot_id=101
    )
    want = sorted(
        map(
            tuple,
            read_iceberg_changelog(
                spark, foreign_iceberg, from_snapshot_id=101
            )
            .where("_change_type = 'insert'")
            .drop("_change_type")
            .collect(),
        )
    )
    assert sorted(map(tuple, inc.collect())) == want


def test_metadata_tables(spark, foreign_iceberg):
    from data_lakehouse_project_spark.operators.iceberg_reader import (
        iceberg_metadata_df,
    )

    snaps = iceberg_metadata_df(spark, foreign_iceberg, "snapshots")
    assert sorted(r.snapshot_id for r in snaps.collect()) == [101, 202]
    assert {
        r.operation for r in snaps.collect()
    } == {"append", "overwrite"}
    hist = iceberg_metadata_df(spark, foreign_iceberg, "history")
    cur = [r.snapshot_id for r in hist.collect() if r.is_current_ancestor]
    assert cur == [202]
    man = iceberg_metadata_df(spark, foreign_iceberg, "manifests")
    assert man.count() == 2  # rewritten m1 + m2
    files = iceberg_metadata_df(spark, foreign_iceberg, "files")
    assert sorted(
        os.path.basename(r.file_path) for r in files.collect()
    ) == ["a.parquet", "c.parquet"]
    # round 11: partitions + refs metadata tables
    parts = iceberg_metadata_df(
        spark, foreign_iceberg, "partitions"
    ).collect()
    assert sum(r.file_count for r in parts) == 2
    assert sum(r.record_count for r in parts) == sum(
        r.record_count for r in files.collect() if r.content == 0
    )
    refs = iceberg_metadata_df(spark, foreign_iceberg, "refs")
    main = {r.name: r for r in refs.collect()}["main"]
    assert main.type == "branch" and main.snapshot_id == 202
    with pytest.raises(ValueError, match="unknown metadata table"):
        iceberg_metadata_df(spark, foreign_iceberg, "entries")
