"""Foreign-reader scale probe: snapshot-reconstruction + scan cost at
10k files (VERDICT r6 task #7).

At 100 TB a Delta/Iceberg table holds 10^4-10^5 active files; snapshot
reconstruction is O(active files) ON THE DRIVER for every client
(delta-rs, OSS Delta, pyiceberg all materialize the file list), so the
risk to budget is driver seconds per 10k files, not executor time.

Builds synthetic foreign metadata over HARDLINKED parquet (10k names,
one real file — scan realism without 10k writes):

* Delta A: 10 JSON commits x 1k adds (no checkpoint) -> full replay
* Delta B: classic parquet checkpoint at v8 + one JSON tail commit
* Iceberg: one manifest list -> 10 manifests x 1k entries

and times (a) snapshot reconstruction, (b) scan+count through the
resulting DataFrame.  Results land in BASELINE.md's probe table.

Usage: python tools/probe_foreign_readers.py [n_files]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa  # noqa: E402
import pyarrow.parquet as pq  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
ROWS_PER_FILE = 100
COMMITS = 10
T0 = 1700000000000

SCHEMA = json.dumps(
    {
        "type": "struct",
        "fields": [
            {"name": "id", "type": "long", "nullable": True, "metadata": {}},
            {"name": "v", "type": "double", "nullable": True, "metadata": {}},
        ],
    }
)


def _base_parquet(d: str) -> str:
    p = os.path.join(d, "base.parquet")
    pq.write_table(
        pa.table(
            {
                "id": pa.array(range(ROWS_PER_FILE), pa.int64()),
                "v": pa.array(
                    [float(i) for i in range(ROWS_PER_FILE)], pa.float64()
                ),
            }
        ),
        p,
    )
    return p


def _link_files(table: str, base: str, n: int) -> list[str]:
    names = []
    for i in range(n):
        name = f"part-{i:06d}.parquet"
        os.link(base, os.path.join(table, name))
        names.append(name)
    return names


def _meta_action():
    return {
        "metaData": {
            "id": "probe-0001",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": SCHEMA,
            "partitionColumns": [],
            "configuration": {},
            "createdTime": T0,
        }
    }


def _add_action(name: str, size: int):
    return {
        "add": {
            "path": name,
            "partitionValues": {},
            "size": size,
            "modificationTime": T0,
            "dataChange": True,
            "stats": json.dumps({"numRecords": ROWS_PER_FILE}),
        }
    }


def _commit(table: str, version: int, actions: list[dict]) -> None:
    log = os.path.join(table, "_delta_log")
    os.makedirs(log, exist_ok=True)
    with open(os.path.join(log, f"{version:020d}.json"), "w") as fh:
        for a in actions:
            fh.write(json.dumps(a) + "\n")


def build_delta(root: str, base: str, checkpointed: bool) -> str:
    table = os.path.join(root, "delta_cp" if checkpointed else "delta_json")
    os.makedirs(table)
    names = _link_files(table, base, N)
    size = os.path.getsize(base)
    per = N // COMMITS
    for v in range(COMMITS):
        actions = []
        if v == 0:
            actions.append(
                {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}}
            )
            actions.append(_meta_action())
        actions.extend(
            _add_action(nm, size) for nm in names[v * per : (v + 1) * per]
        )
        actions.append(
            {"commitInfo": {"timestamp": T0 + v * 1000, "operation": "WRITE"}}
        )
        _commit(table, v, actions)
    if checkpointed:
        cp_v = COMMITS - 2  # v8: checkpoint covers commits 0..8
        add_t = pa.struct(
            [
                ("path", pa.string()),
                ("partitionValues", pa.map_(pa.string(), pa.string())),
                ("size", pa.int64()),
                ("modificationTime", pa.int64()),
                ("dataChange", pa.bool_()),
                ("stats", pa.string()),
            ]
        )
        cp_schema = pa.schema(
            [
                (
                    "protocol",
                    pa.struct(
                        [
                            ("minReaderVersion", pa.int32()),
                            ("minWriterVersion", pa.int32()),
                        ]
                    ),
                ),
                (
                    "metaData",
                    pa.struct(
                        [
                            ("id", pa.string()),
                            (
                                "format",
                                pa.struct(
                                    [
                                        ("provider", pa.string()),
                                        (
                                            "options",
                                            pa.map_(pa.string(), pa.string()),
                                        ),
                                    ]
                                ),
                            ),
                            ("schemaString", pa.string()),
                            ("partitionColumns", pa.list_(pa.string())),
                            ("configuration", pa.map_(pa.string(), pa.string())),
                            ("createdTime", pa.int64()),
                        ]
                    ),
                ),
                ("add", add_t),
            ]
        )
        rows = [
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
            {
                "metaData": {
                    **_meta_action()["metaData"],
                    "format": {"provider": "parquet", "options": []},
                    "configuration": [],
                    "partitionColumns": [],
                }
            },
        ]
        for nm in names[: (cp_v + 1) * per]:
            a = _add_action(nm, size)["add"]
            a["partitionValues"] = []
            rows.append({"add": a})
        log = os.path.join(table, "_delta_log")
        pq.write_table(
            pa.Table.from_pylist(rows, schema=cp_schema),
            os.path.join(log, f"{cp_v:020d}.checkpoint.parquet"),
        )
        with open(os.path.join(log, "_last_checkpoint"), "w") as fh:
            json.dump({"version": cp_v, "size": len(rows)}, fh)
        for v in range(cp_v):  # log cleanup: pre-checkpoint JSON expires
            os.remove(os.path.join(log, f"{v:020d}.json"))
    return table


def build_delta_dv(root: str, base: str) -> str:
    """v0 adds every file; v1 DV-deletes 5 rows from every 10th file
    (paired remove+add with an inline roaring DV) — the modern
    delete shape the r8 CDF diff reconstructs."""
    from data_lakehouse_project_spark.operators.dv import (
        rbm_array_serialize,
        z85_encode,
    )

    table = os.path.join(root, "delta_dv")
    os.makedirs(table)
    names = _link_files(table, base, N)
    size = os.path.getsize(base)
    actions = [
        {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                      "readerFeatures": ["deletionVectors"],
                      "writerFeatures": ["deletionVectors"]}},
        _meta_action(),
    ]
    actions.extend(_add_action(nm, size) for nm in names)
    actions.append(
        {"commitInfo": {"timestamp": T0, "operation": "WRITE"}}
    )
    _commit(table, 0, actions)

    blob = rbm_array_serialize([1, 3, 5, 7, 9])
    blob_padded = blob + b"\x00" * ((-len(blob)) % 4)
    dv = {
        "storageType": "i",
        "pathOrInlineDv": z85_encode(blob_padded),
        "sizeInBytes": len(blob),
        "cardinality": 5,
    }
    actions = []
    for nm in names[::10]:
        actions.append(
            {"remove": {"path": nm, "deletionTimestamp": T0 + 1000,
                        "dataChange": True}}
        )
        a = _add_action(nm, size)
        a["add"]["deletionVector"] = dv
        actions.append(a)
    actions.append(
        {"commitInfo": {"timestamp": T0 + 1000, "operation": "DELETE"}}
    )
    _commit(table, 1, actions)
    return table


def build_iceberg(spark, root: str, base: str) -> str:
    from data_lakehouse_project_spark.operators.iceberg_export import (
        _AvroWriter,
    )

    table = os.path.join(root, "iceberg")
    os.makedirs(os.path.join(table, "metadata"))
    os.makedirs(os.path.join(table, "data"))
    names = []
    for i in range(N):
        nm = f"data/part-{i:06d}.parquet"
        os.link(base, os.path.join(table, nm))
        names.append(nm)
    size = os.path.getsize(base)

    entry_schema = json.dumps(
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
                    "name": "data_file",
                    "type": {
                        "type": "record",
                        "name": "r2",
                        "fields": [
                            {"name": "content", "type": "int", "field-id": 134},
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
                        ],
                    },
                    "field-id": 2,
                },
            ],
        }
    )
    mf_schema = json.dumps(
        {
            "type": "record",
            "name": "manifest_file",
            "fields": [
                {"name": "manifest_path", "type": "string", "field-id": 500},
                {"name": "manifest_length", "type": "long", "field-id": 501},
                {
                    "name": "partition_spec_id",
                    "type": "int",
                    "field-id": 502,
                },
                {"name": "content", "type": "int", "field-id": 517},
                {
                    "name": "added_snapshot_id",
                    "type": "long",
                    "field-id": 503,
                },
            ],
        }
    )
    per = N // COMMITS
    manifest_paths = []
    for m in range(COMMITS):
        mp = os.path.join(table, "metadata", f"m{m}.avro")
        w = _AvroWriter(
            spark, entry_schema, mp,
            {"schema": json.dumps({"type": "struct", "schema-id": 0}),
             "content": "data", "format-version": "2"},
        )
        for nm in names[m * per : (m + 1) * per]:
            w.append_dict(
                {
                    "status": 1,
                    "snapshot_id": 9,
                    "data_file": {
                        "content": 0,
                        "file_path": nm,
                        "file_format": "PARQUET",
                        "record_count": ROWS_PER_FILE,
                        "file_size_in_bytes": size,
                    },
                }
            )
        w.close()
        manifest_paths.append(mp)
    lst = os.path.join(table, "metadata", "snap-9.avro")
    w = _AvroWriter(spark, mf_schema, lst, {"format-version": "2"})
    for mp in manifest_paths:
        w.append_dict(
            {
                "manifest_path": mp,
                "manifest_length": os.path.getsize(mp),
                "partition_spec_id": 0,
                "content": 0,
                "added_snapshot_id": 9,
            }
        )
    w.close()
    md = {
        "format-version": 2,
        "table-uuid": "99999999-0000-0000-0000-000000000000",
        "location": table,
        "last-sequence-number": 1,
        "last-updated-ms": T0,
        "last-column-id": 2,
        "schemas": [
            {
                "type": "struct",
                "schema-id": 0,
                "fields": [
                    {"id": 1, "name": "id", "required": False, "type": "long"},
                    {"id": 2, "name": "v", "required": False, "type": "double"},
                ],
            }
        ],
        "current-schema-id": 0,
        "partition-specs": [{"spec-id": 0, "fields": []}],
        "default-spec-id": 0,
        "last-partition-id": 999,
        "sort-orders": [{"order-id": 0, "fields": []}],
        "default-sort-order-id": 0,
        "snapshots": [
            {
                "snapshot-id": 9,
                "timestamp-ms": T0,
                "sequence-number": 1,
                "manifest-list": lst,
                "summary": {"operation": "append"},
                "schema-id": 0,
            }
        ],
        "current-snapshot-id": 9,
        "snapshot-log": [{"snapshot-id": 9, "timestamp-ms": T0}],
    }
    with open(os.path.join(table, "metadata", "v1.metadata.json"), "w") as fh:
        json.dump(md, fh)
    with open(
        os.path.join(table, "metadata", "version-hint.text"), "w"
    ) as fh:
        fh.write("1")
    return table


def main() -> None:
    from data_lakehouse_project_spark.operators.delta_reader import (
        read_delta_snapshot,
        read_delta_table,
    )
    from data_lakehouse_project_spark.operators.iceberg_reader import (
        iceberg_live_files,
        read_iceberg_table,
    )
    from data_lakehouse_project_spark.session import get_spark

    spark = get_spark(app_name="probe-foreign-readers")
    root = tempfile.mkdtemp(prefix="probe_readers_")
    out: dict[str, float] = {}
    try:
        base = _base_parquet(root)

        t_json = build_delta(root, base, checkpointed=False)
        t_cp = build_delta(root, base, checkpointed=True)

        t0 = time.time()
        snap = read_delta_snapshot(t_json)
        out["delta_snapshot_json_only_s"] = round(time.time() - t0, 3)
        assert len(snap.files) == N

        t0 = time.time()
        snap = read_delta_snapshot(t_cp)
        out["delta_snapshot_checkpoint_s"] = round(time.time() - t0, 3)
        assert len(snap.files) == N

        t0 = time.time()
        n = read_delta_table(spark, t_cp).count()
        out["delta_scan_count_s"] = round(time.time() - t0, 3)
        assert n == N * ROWS_PER_FILE

        # CDF: full insert-history replay over the JSON-only table
        from data_lakehouse_project_spark.operators.delta_cdf import (
            read_delta_changes,
        )

        t0 = time.time()
        n = read_delta_changes(spark, t_json).count()
        out["delta_cdf_scan_count_s"] = round(time.time() - t0, 3)
        assert n == N * ROWS_PER_FILE

        # CDF over a DV-delete commit: per-file DV decode + positional
        # (file, row_index) join — N/10 files x 5 changed rows
        t_dv = build_delta_dv(root, base)
        t0 = time.time()
        n = read_delta_changes(spark, t_dv, starting_version=1).count()
        out["delta_cdf_dv_diff_s"] = round(time.time() - t0, 3)
        assert n == (N // 10) * 5

        # foreign VACUUM plan: one os.walk over 10k files + the
        # reference set from the snapshot — the full driver cost of a
        # dry run (nothing is old enough to delete)
        from data_lakehouse_project_spark.operators.foreign_maintenance import (  # noqa: E501
            vacuum_delta,
        )

        t0 = time.time()
        plan = vacuum_delta(t_cp, dry_run=True)
        out["delta_vacuum_plan_s"] = round(time.time() - t0, 3)
        assert plan["kept_referenced"] == N or plan["kept_recent"] >= 0

        # foreign checkpoint write: raw replay of 10 commits x 1k adds
        # + one columnar parquet write
        from data_lakehouse_project_spark.operators.delta_export import (
            write_foreign_checkpoint,
        )

        t0 = time.time()
        info = write_foreign_checkpoint(t_json)
        out["delta_checkpoint_write_s"] = round(time.time() - t0, 3)
        assert info["files"] == N

        t_ice = build_iceberg(spark, root, base)
        t0 = time.time()
        _, live, _, _ = iceberg_live_files(spark, t_ice)
        out["iceberg_snapshot_s"] = round(time.time() - t0, 3)
        assert len(live) == N

        t0 = time.time()
        n = read_iceberg_table(spark, t_ice).count()
        out["iceberg_scan_count_s"] = round(time.time() - t0, 3)
        assert n == N * ROWS_PER_FILE

        # iceberg_stream driver planning: offset resolution + the
        # 10k-file partition list for one catch-up micro-batch (the
        # executor scan cost is the same scan measured above)
        from data_lakehouse_project_spark.operators.iceberg_reader import (
            load_iceberg_metadata,
        )
        from data_lakehouse_project_spark.sources.iceberg_stream import (
            _IcebergStreamReader,
            _session_free_schema,
        )

        t0 = time.time()
        r = _IcebergStreamReader(
            t_ice,
            _session_free_schema(load_iceberg_metadata(t_ice)),
            -1,
            skip_delete=False,
            skip_overwrite=False,
        )
        start = r.initialOffset()
        end = r.latestOffset()
        parts = r.partitions(start, end)
        out["iceberg_stream_plan_s"] = round(time.time() - t0, 3)
        assert len(parts) == N

        # iceberg changelog PLANNING at N files (r9 slot): the driver
        # walk (manifest lists + entries + delete-file reads) that
        # builds the change specs — executor scan cost equals the
        # plain scan measured above
        from data_lakehouse_project_spark.operators.iceberg_reader import (  # noqa: E501
            read_iceberg_changelog,
        )

        t0 = time.time()
        _plan_df = read_iceberg_changelog(spark, t_ice)
        out["iceberg_changelog_plan_s"] = round(time.time() - t0, 3)

        # r11 slot: LIVE EQUALITY DELETES at N files — this used to
        # force the O(files) JVM driver planning (the fast path gated
        # on `not eq_deletes`); the anti-join now runs on top of the
        # arrow scan, so the cost must stay in the fast-path class
        from data_lakehouse_project_spark.operators.iceberg_writer import (  # noqa: E501
            write_equality_deletes,
        )

        write_equality_deletes(
            spark,
            t_ice,
            spark.createDataFrame([(1,), (3,)], "id long"),
            ["id"],
        )
        t0 = time.time()
        n_eq = read_iceberg_table(spark, t_ice).count()
        out["iceberg_eq_scan_count_s"] = round(time.time() - t0, 3)
        assert n_eq == N * (ROWS_PER_FILE - 2)

        # foreign-DML driver budget at N files (r9 slot): a DV DELETE
        # touching 1% of files (matched-position collect + DV write +
        # commit) and a MERGE upsert (ambiguity gate + left_anti insert
        # split + stage + commit) against the checkpointed table
        from data_lakehouse_project_spark.operators.delta_writer import (
            delete_from_delta,
            merge_into_delta,
        )

        t0 = time.time()
        dinfo = delete_from_delta(
            spark, t_cp, f"id % {N} < {max(N // 100, 1)} AND id % 10 = 0",
            allow_protocol_upgrade=True,
        )
        out["delta_dml_delete_s"] = round(time.time() - t0, 3)
        assert dinfo["rows_deleted"] > 0

        src = spark.range(0, 500).selectExpr(
            "id + 100000000 AS id", "CAST(id AS DOUBLE) AS v"
        )
        t0 = time.time()
        minfo = merge_into_delta(
            spark, t_cp, src, "t.id = s.id",
            when_matched_update={"v": "s.v"},
        )
        out["delta_dml_merge_s"] = round(time.time() - t0, 3)
        assert minfo["rows_inserted"] == 500

        out["n_files"] = N
        print(json.dumps(out))
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
