"""Iceberg v3 reader groundwork: PUFFIN deletion vectors (decoded from
the spec's blob layout — 4B BE length, D1 D3 39 64 magic, portable
64-bit roaring vector, 4B BE CRC) applied on snapshot reads, replayed
by the batch + streaming changelogs, and the v3 row-lineage columns
(``_row_id`` / ``_last_updated_sequence_number``).

The fixtures are hand-committed v3 metadata trees (format-version 3,
DV manifest entries with referenced_data_file/content_offset/size) —
the same read-the-spec fixture style as the v2 foreign fixtures."""

from __future__ import annotations

import json
import os
import time
import uuid

import pytest
from pyspark.sql import functions as F

from data_lakehouse_project_spark.operators.iceberg_export import (
    export_iceberg_metadata,
)
from data_lakehouse_project_spark.operators.iceberg_reader import (
    UnsupportedIcebergFeature,
    _latest_metadata_file,
    avro_records,
    iceberg_snapshot_ids,
    load_iceberg_metadata,
    read_iceberg_changelog,
    read_iceberg_table,
)
from data_lakehouse_project_spark.operators.iceberg_writer import (
    _commit_snapshot,
    _entry_avro_schema,
    delete_from_iceberg,
)
from data_lakehouse_project_spark.operators.puffin import (
    CorruptPuffinFile,
    decode_dv_blob,
    dv_positions_of_entry,
    read_puffin_footer,
    write_puffin_dv_file,
)
from data_lakehouse_project_spark.operators.txnlog import TxnTable
from data_lakehouse_project_spark.operators.iceberg_export import (
    _AvroWriter,
)


def test_puffin_roundtrip(tmp_path):
    p = str(tmp_path / "dv.puffin")
    metas = write_puffin_dv_file(
        p,
        [("data/a.parquet", [3, 1, 7, 3]), ("data/b.parquet", [0])],
        snapshot_id=5,
        sequence_number=2,
    )
    footer = read_puffin_footer(p)
    assert [b["type"] for b in footer["blobs"]] == [
        "deletion-vector-v1"
    ] * 2
    assert metas[0]["cardinality"] == 3
    got = decode_dv_blob(
        p, metas[0]["content_offset"], metas[0]["content_size_in_bytes"]
    )
    assert got == [1, 3, 7]
    # via the footer (no offsets on the entry)
    got2 = dv_positions_of_entry(
        str(tmp_path),
        {"file_path": p, "referenced_data_file": "data/b.parquet"},
    )
    assert got2 == [0]
    # corruption detected
    with open(p, "r+b") as fh:
        fh.seek(metas[0]["content_offset"] + 9)
        fh.write(b"\xff")
    with pytest.raises(CorruptPuffinFile):
        decode_dv_blob(
            p,
            metas[0]["content_offset"],
            metas[0]["content_size_in_bytes"],
        )


def _export_table(spark, tmp_path, name):
    t = TxnTable(str(tmp_path / name))
    t.write(
        spark.range(0, 40).selectExpr("id", "CAST(id AS DOUBLE) AS v"),
        mode="overwrite",
    )
    export_iceberg_metadata(t, spark)
    return t.path


def _commit_dv_snapshot(spark, path, kills):
    """Hand-commit one v3 deletion-vector snapshot (puffin file +
    delete manifest with referenced_data_file entries) and bump the
    metadata to format-version 3."""
    md_file = _latest_metadata_file(path)
    md = load_iceberg_metadata(path)
    seq = int(md.get("last-sequence-number", 0)) + 1
    snapshot_id = max(
        s["snapshot-id"] for s in md["snapshots"]
    ) + 1
    meta_dir = os.path.join(path, "metadata")
    os.makedirs(os.path.join(path, "data"), exist_ok=True)
    puffin = os.path.join(
        path, "data", f"dv-{uuid.uuid4().hex}.puffin"
    )
    metas = write_puffin_dv_file(
        puffin, sorted(kills.items()), snapshot_id, seq
    )
    mpath = os.path.join(meta_dir, f"{uuid.uuid4().hex}-dvm.avro")
    w = _AvroWriter(
        spark,
        _entry_avro_schema([], v3_fields=True),
        mpath,
        {
            "schema": json.dumps(
                next(
                    s for s in md["schemas"]
                    if s["schema-id"] == md["current-schema-id"]
                )
            ),
            "partition-spec": "[]",
            "partition-spec-id": str(md.get("default-spec-id", 0)),
            "format-version": "2",
            "content": "deletes",
        },
    )
    n = 0
    for m, (ref, _poss) in zip(metas, sorted(kills.items())):
        n += m["cardinality"]
        w.append_dict(
            {
                "status": 1,
                "snapshot_id": snapshot_id,
                "sequence_number": seq,
                "file_sequence_number": seq,
                "data_file": {
                    "content": 1,
                    "file_path": puffin,
                    "file_format": "PUFFIN",
                    "partition": {},
                    "record_count": m["cardinality"],
                    "file_size_in_bytes": os.path.getsize(puffin),
                    "referenced_data_file": m["referenced_data_file"],
                    "content_offset": m["content_offset"],
                    "content_size_in_bytes": m[
                        "content_size_in_bytes"
                    ],
                },
            }
        )
    w.close()
    new_md = _commit_snapshot(
        spark,
        path,
        md,
        md_file,
        manifest_row={
            "manifest_path": mpath,
            "manifest_length": os.path.getsize(mpath),
            "partition_spec_id": md.get("default-spec-id", 0),
            "content": 1,
            "sequence_number": seq,
            "min_sequence_number": seq,
            "added_snapshot_id": snapshot_id,
            "added_files_count": len(metas),
            "existing_files_count": 0,
            "deleted_files_count": 0,
            "added_rows_count": n,
            "existing_rows_count": 0,
            "deleted_rows_count": 0,
        },
        snapshot_id=snapshot_id,
        seq=seq,
        ts=int(time.time() * 1000),
        operation="delete",
        summary_extra={"deletion-vectors": str(len(metas))},
        rollback_paths=[puffin, mpath],
    )
    j = json.load(open(new_md))
    j["format-version"] = 3
    j["next-row-id"] = 0
    json.dump(j, open(new_md, "w"))
    return snapshot_id


def _kills_by_predicate(spark, path, pred):
    """(abs data file -> row positions) matching ``pred`` — computed
    per file so the v3 DV fixture kills the exact rows a v2
    position-delete of the same predicate kills."""
    from data_lakehouse_project_spark.operators.iceberg_reader import (
        iceberg_live_files,
    )

    _, live, _, _ = iceberg_live_files(spark, path)
    kills = {}
    for f in live:
        p = f["file_path"]
        # single-file scan: row order == file order; use collect order
        ids = [r.id for r in spark.read.parquet(p).collect()]
        poss = [
            i
            for i, v in enumerate(ids)
            if eval(pred.replace("id", str(v)))  # noqa: S307 — test
        ]
        if poss:
            kills[p] = poss
    return kills


def test_v3_dv_reads_hash_equal_to_v2_rewrite(spark, tmp_path):
    # v2 twin: position-delete parquet via the writer
    p2 = _export_table(spark, tmp_path, "v2")
    delete_from_iceberg(spark, p2, "id % 3 = 1")
    # v3: puffin DV killing the same rows
    p3 = _export_table(spark, tmp_path, "v3")
    kills = _kills_by_predicate(spark, p3, "(id % 3) == 1")
    _commit_dv_snapshot(spark, p3, kills)
    md = load_iceberg_metadata(p3)
    assert md["format-version"] == 3

    a = sorted(map(tuple, read_iceberg_table(spark, p2).collect()))
    b = sorted(map(tuple, read_iceberg_table(spark, p3).collect()))
    assert a == b and len(b) == 27

    # arrow fast path applies the DV too
    os.environ["SPARK_GRAFT_ARROW_SCAN_FILES"] = "1"
    try:
        c = sorted(
            map(tuple, read_iceberg_table(spark, p3).collect())
        )
    finally:
        os.environ.pop("SPARK_GRAFT_ARROW_SCAN_FILES", None)
    assert c == b


def test_v3_dv_changelog_and_stream_replay(spark, tmp_path):
    from data_lakehouse_project_spark.sources.python_datasource import (
        register_python_datasources,
    )

    path = _export_table(spark, tmp_path, "cdc")
    kills = _kills_by_predicate(spark, path, "(id % 5) == 2")
    sid = _commit_dv_snapshot(spark, path, kills)

    ch = read_iceberg_changelog(spark, path)
    dels = sorted(
        r.id for r in ch.where("_change_type = 'delete'").collect()
    )
    assert dels == [2, 7, 12, 17, 22, 27, 32, 37]
    assert {
        r._snapshot_id
        for r in ch.where("_change_type = 'delete'").collect()
    } == {sid}

    register_python_datasources(spark)
    sink: list = []
    q = (
        spark.readStream.format("iceberg_stream")
        .option("path", path)
        .option("readChangeFeed", "true")
        .load()
        .writeStream.foreachBatch(
            lambda df, _b: sink.extend(
                (r["_change_type"], r["id"]) for r in df.collect()
            )
        )
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    want = sorted(
        (r._change_type, r.id) for r in ch.collect()
    )
    assert sorted(sink) == want


def test_row_lineage_surfaces_and_refuses(spark, tmp_path):
    path = _export_table(spark, tmp_path, "lineage")
    # no first_row_id anywhere -> refuse, never invent
    with pytest.raises(UnsupportedIcebergFeature, match="first_row_id"):
        read_iceberg_table(spark, path, row_lineage=True)

    # stamp first_row_id onto the data manifest (v3 fields), rewriting
    # entries in place — running assignment in entry order
    md = load_iceberg_metadata(path)
    snap = md["snapshots"][-1]
    mlist = snap["manifest-list"]
    if not os.path.isabs(mlist):
        mlist = os.path.join(path, mlist)
    manifests, _ = avro_records(spark, mlist)
    next_rid = 0
    for m in manifests:
        if m.get("content", 0) != 0:
            continue
        mp = m["manifest_path"]
        if not os.path.isabs(mp):
            mp = os.path.join(path, mp)
        entries, _ = avro_records(spark, mp)
        w = _AvroWriter(
            spark,
            _entry_avro_schema([], v3_fields=True),
            mp + ".new",
            {
                "schema": json.dumps(
                    next(
                        s for s in md["schemas"]
                        if s["schema-id"] == md["current-schema-id"]
                    )
                ),
                "partition-spec": "[]",
                "partition-spec-id": "0",
                "format-version": "2",
                "content": "data",
            },
        )
        for e in entries:
            df_ = dict(e["data_file"])
            df_["first_row_id"] = next_rid
            df_.setdefault("content", 0)
            # avro bytes bounds don't round-trip the writer's JSON
            # boundary; lineage doesn't need them
            df_["lower_bounds"] = None
            df_["upper_bounds"] = None
            next_rid += int(df_.get("record_count") or 0)
            w.append_dict(
                {
                    "status": e.get("status", 1),
                    "snapshot_id": e.get("snapshot_id"),
                    "sequence_number": e.get("sequence_number"),
                    "file_sequence_number": e.get(
                        "file_sequence_number"
                    ),
                    "data_file": df_,
                }
            )
        w.close()
        os.replace(mp + ".new", mp)

    df = read_iceberg_table(spark, path, row_lineage=True)
    assert "_row_id" in df.columns
    assert "_last_updated_sequence_number" in df.columns
    rows = df.collect()
    assert len(rows) == 40
    assert sorted(r._row_id for r in rows) == list(range(40))
    assert {r._last_updated_sequence_number for r in rows} == {1}


# ---------------------------------------------------------------------------
# round 11: the v3 WRITE side — upgrade verb, DV-emitting DML, row
# lineage stamping on append/upsert, DV supersession.
# ---------------------------------------------------------------------------


def _upgrade(spark, tmp_path, name="w3", n=40):
    from data_lakehouse_project_spark.operators.iceberg_writer import (
        upgrade_iceberg_to_v3,
    )

    path = _export_table(spark, tmp_path, name) if n == 40 else None
    if path is None:
        t = TxnTable(str(tmp_path / name))
        t.write(
            spark.range(0, n).selectExpr(
                "id", "CAST(id AS DOUBLE) AS v"
            ),
            mode="overwrite",
        )
        export_iceberg_metadata(t, spark)
        path = t.path
    info = upgrade_iceberg_to_v3(spark, path)
    assert info["rows_assigned"] == n
    return path


def test_v3_upgrade_assigns_row_lineage(spark, tmp_path):
    """upgrade_iceberg_to_v3: one replace snapshot, explicit
    first_row_id on every entry, lineage readable, next-row-id set;
    the replace snapshot is invisible to the changelog."""
    path = _upgrade(spark, tmp_path)
    md = load_iceberg_metadata(path)
    assert md["format-version"] == 3
    assert md["next-row-id"] == 40
    lin = read_iceberg_table(spark, path, row_lineage=True)
    assert sorted(r._row_id for r in lin.collect()) == list(range(40))
    ch = read_iceberg_changelog(spark, path)
    assert ch.where("_change_type = 'delete'").count() == 0
    assert ch.count() == 40


def test_v3_delete_emits_puffin_dv(spark, tmp_path):
    """v3 DELETE writes puffin deletion vectors (never position-delete
    parquet), hash-equal to the same delete on the v2 twin; the
    changelog replays the DV snapshot."""
    from data_lakehouse_project_spark.operators.iceberg_reader import (
        iceberg_live_files,
    )

    p2 = _export_table(spark, tmp_path, "twin2")
    delete_from_iceberg(spark, p2, "id % 5 = 1")
    p3 = _upgrade(spark, tmp_path, "twin3")
    delete_from_iceberg(spark, p3, "id % 5 = 1")
    a = sorted(map(tuple, read_iceberg_table(spark, p2).collect()))
    b = sorted(map(tuple, read_iceberg_table(spark, p3).collect()))
    assert a == b and len(b) == 32
    _, _, posd, _ = iceberg_live_files(spark, p3)
    assert posd and all(f.get("__is_dv") for f in posd)
    dels = sorted(
        r.id
        for r in read_iceberg_changelog(spark, p3).collect()
        if r._change_type == "delete"
    )
    assert dels == [1, 6, 11, 16, 21, 26, 31, 36]


def test_v3_dv_supersession_one_dv_per_file(spark, tmp_path):
    """A second DELETE touching the same files MERGES the old DV into
    the new one and flips the old entry to DELETED — at most ONE live
    DV per data file (the v3 invariant), totals exact."""
    from collections import Counter

    from data_lakehouse_project_spark.operators.iceberg_reader import (
        iceberg_live_files,
    )

    path = _upgrade(spark, tmp_path, "sup")
    delete_from_iceberg(spark, path, "id % 5 = 1")
    delete_from_iceberg(spark, path, "id % 5 = 2")
    _, _, posd, _ = iceberg_live_files(spark, path)
    cnt = Counter(
        f["referenced_data_file"] for f in posd if f.get("__is_dv")
    )
    assert cnt and max(cnt.values()) == 1
    got = sorted(r.id for r in read_iceberg_table(spark, path).collect())
    assert got == [i for i in range(40) if i % 5 not in (1, 2)]
    # changelog: each snapshot's fresh kills only (no double emit)
    ch = read_iceberg_changelog(spark, path).collect()
    dels = [r.id for r in ch if r._change_type == "delete"]
    assert sorted(dels) == [i for i in range(40) if i % 5 in (1, 2)]
    assert len(dels) == len(set(dels))


def test_v3_append_upsert_continue_lineage(spark, tmp_path):
    """Appends and upserts allocate fresh _row_id from next-row-id;
    lineage stays readable after mixed DML; update rewrites kill the
    old row id and assign a new one (delete+insert lineage)."""
    from data_lakehouse_project_spark.operators.iceberg_writer import (
        append_to_iceberg,
        update_from_iceberg,
        upsert_into_iceberg,
    )

    path = _upgrade(spark, tmp_path, "lin")
    append_to_iceberg(
        spark,
        spark.range(100, 103).selectExpr(
            "id", "CAST(id AS DOUBLE) AS v"
        ),
        path,
    )
    md = load_iceberg_metadata(path)
    assert md["next-row-id"] == 43
    lin = {
        r.id: r._row_id
        for r in read_iceberg_table(
            spark, path, row_lineage=True
        ).collect()
    }
    assert {lin[100], lin[101], lin[102]} == {40, 41, 42}

    update_from_iceberg(spark, path, "id = 2", {"v": "222.0"})
    upsert_into_iceberg(
        spark, path,
        spark.createDataFrame(
            [(3, 333.0), (500, 5.0)], "id long, v double"
        ),
        ["id"],
    )
    md = load_iceberg_metadata(path)
    assert md["next-row-id"] == 46  # 43 +1 update +2 upsert
    lin2 = {
        r.id: (r._row_id, r.v)
        for r in read_iceberg_table(
            spark, path, row_lineage=True
        ).collect()
    }
    assert lin2[2] == (43, 222.0)  # rewritten row: fresh id
    assert lin2[3][1] == 333.0 and lin2[3][0] in (44, 45)
    assert lin2[500][1] == 5.0 and lin2[500][0] in (44, 45)
    assert lin2[0] == (0, 0.0)  # untouched rows keep their ids

    # changelog cumulative state == snapshot
    ch = read_iceberg_changelog(spark, path).collect()
    state: dict = {}
    for r in sorted(
        ch,
        key=lambda r: (r._snapshot_id, r._change_type == "insert"),
    ):
        if r._change_type == "insert":
            state[r.id] = r.v
        else:
            state.pop(r.id, None)
    snap = {
        r.id: r.v for r in read_iceberg_table(spark, path).collect()
    }
    assert state == snap


def test_v3_dv_merges_v2_position_delete_history(spark, tmp_path):
    """A table with v2 position-delete parquet history upgraded to v3:
    the first v3 DV for a file MERGES the parquet positions (DV ⊇ all
    prior deletes for the file), reads stay exact."""
    path = _export_table(spark, tmp_path, "mix")
    delete_from_iceberg(spark, path, "id % 7 = 1")  # v2 parquet
    from data_lakehouse_project_spark.operators.iceberg_writer import (
        upgrade_iceberg_to_v3,
    )

    upgrade_iceberg_to_v3(spark, path)
    delete_from_iceberg(spark, path, "id % 7 = 2")  # v3 DV
    got = sorted(r.id for r in read_iceberg_table(spark, path).collect())
    assert got == [i for i in range(40) if i % 7 not in (1, 2)]
    # the DV contains the parquet positions too (merge requirement)
    from data_lakehouse_project_spark.operators.iceberg_reader import (
        iceberg_live_files,
    )

    _, _, posd, _ = iceberg_live_files(spark, path)
    dvs = [f for f in posd if f.get("__is_dv")]
    assert dvs
    total_dv = sum(
        len(dv_positions_of_entry(path, f)) for f in dvs
    )
    assert total_dv == sum(1 for i in range(40) if i % 7 in (1, 2))


def test_v3_stream_replays_dv_dml(spark, tmp_path):
    """The streaming changelog replays v3 DV DML identically to the
    batch changelog."""
    from data_lakehouse_project_spark.operators.iceberg_writer import (
        upsert_into_iceberg,
    )
    from data_lakehouse_project_spark.sources.python_datasource import (
        register_python_datasources,
    )

    path = _upgrade(spark, tmp_path, "st")
    delete_from_iceberg(spark, path, "id % 6 = 1")
    upsert_into_iceberg(
        spark, path,
        spark.createDataFrame([(4, 44.0)], "id long, v double"),
        ["id"],
    )
    register_python_datasources(spark)
    sink: list = []

    def _each(df, _bid):
        sink.extend(
            (r["_snapshot_id"], r["_change_type"], r["id"], r["v"])
            for r in df.collect()
        )

    q = (
        spark.readStream.format("iceberg_stream")
        .option("path", path)
        .option("readChangeFeed", "true")
        .load()
        .writeStream.foreachBatch(_each)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    want = sorted(
        (r._snapshot_id, r._change_type, r.id, r.v)
        for r in read_iceberg_changelog(spark, path).collect()
    )
    assert sorted(sink) == want


def test_v3_expire_snapshots_protects_live_puffin(spark, tmp_path):
    """Snapshot expiry on a v3 table keeps puffin files referenced by
    retained snapshots (DV entries protect their container) and the
    table still reads exactly; superseded-DV history from expired
    snapshots is swept."""
    import glob

    from data_lakehouse_project_spark.operators.foreign_maintenance import (
        expire_iceberg_snapshots,
    )
    from data_lakehouse_project_spark.operators.iceberg_writer import (
        upgrade_iceberg_to_v3,
    )

    path = _export_table(spark, tmp_path, "exp3")
    upgrade_iceberg_to_v3(spark, path)
    delete_from_iceberg(spark, path, "id % 5 = 1")
    delete_from_iceberg(spark, path, "id % 5 = 2")  # supersedes
    before = sorted(
        r.id for r in read_iceberg_table(spark, path).collect()
    )
    rep = expire_iceberg_snapshots(
        spark, path, keep_last=1, dry_run=False
    )
    assert rep["expired_snapshot_ids"]
    after = sorted(
        r.id for r in read_iceberg_table(spark, path).collect()
    )
    assert after == before
    # the live (merged) DV's puffin survives
    assert glob.glob(os.path.join(path, "data", "*.puffin"))


def test_v3_row_lineage_over_arrow_fast_path(
    spark, tmp_path, monkeypatch
):
    """row_lineage=True no longer forces the JVM path: the arrow
    source's provenance columns feed the same first_row_id+position
    join — forced-gate fast path hash-equal to the JVM path, eq
    deletes included."""
    from data_lakehouse_project_spark.operators.iceberg_writer import (
        upgrade_iceberg_to_v3,
        upsert_into_iceberg,
    )

    path = _export_table(spark, tmp_path, "linfast")
    upgrade_iceberg_to_v3(spark, path)
    delete_from_iceberg(spark, path, "id % 6 = 1")
    upsert_into_iceberg(
        spark, path,
        spark.createDataFrame([(4, 44.0)], "id long, v double"),
        ["id"],
    )

    def q():
        return read_iceberg_table(spark, path, row_lineage=True)

    monkeypatch.setenv("SPARK_GRAFT_ARROW_SCAN_FILES", "1")
    fast = q()
    assert "graft_arrow_scan" in fast._jdf.queryExecution().toString()
    fast_rows = sorted(map(tuple, fast.collect()))
    monkeypatch.setenv("SPARK_GRAFT_ARROW_SCAN_FILES", "10000000")
    slow = q()
    assert "graft_arrow_scan" not in (
        slow._jdf.queryExecution().toString()
    )
    assert fast_rows == sorted(map(tuple, slow.collect()))
    assert fast.columns[-2:] == [
        "_row_id", "_last_updated_sequence_number"
    ]


def _add_default_column(
    path, name="flag", typ="int", default=7
):
    """Hand-evolve the current schema with a v3 initial-default
    column (the shape a spec-v3 writer produces on ADD COLUMN ...
    DEFAULT) and commit it as a new metadata version."""
    md_file = _latest_metadata_file(path)
    md = load_iceberg_metadata(path)
    sch = next(
        s for s in md["schemas"]
        if s["schema-id"] == md["current-schema-id"]
    )
    nid = int(md.get("last-column-id", 0)) + 1
    sch["fields"] = list(sch["fields"]) + [
        {
            "id": nid, "name": name, "type": typ, "required": False,
            "initial-default": default, "write-default": default,
        }
    ]
    md["last-column-id"] = nid
    cur_v = int(os.path.basename(md_file)[1:].split(".")[0])
    meta_dir = os.path.join(path, "metadata")
    new_path = os.path.join(meta_dir, f"v{cur_v + 1}.metadata.json")
    with open(new_path, "x") as fh:
        json.dump(md, fh)
    with open(os.path.join(meta_dir, "version-hint.text"), "w") as fh:
        fh.write(str(cur_v + 1))


def test_v3_initial_default_reads(spark, tmp_path, monkeypatch):
    """v3 initial-defaults (spec "Default values"): rows of files
    written BEFORE the column existed read the default; files
    carrying the column keep genuine values INCLUDING nulls — on the
    JVM path, the arrow fast path, and DML predicates."""
    from data_lakehouse_project_spark.operators.iceberg_writer import (
        append_to_iceberg,
        upgrade_iceberg_to_v3,
    )

    path = _export_table(spark, tmp_path, "dflt")  # ids 0..39
    upgrade_iceberg_to_v3(spark, path)
    _add_default_column(path, "flag", "int", 7)
    append_to_iceberg(
        spark,
        spark.createDataFrame(
            [(100, 1.0, 9), (101, 1.0, None)],
            "id long, v double, flag int",
        ),
        path,
    )
    got = {r.id: r.flag
           for r in read_iceberg_table(spark, path).collect()}
    assert got[0] == 7 and got[39] == 7  # pre-evolution: default
    assert got[100] == 9 and got[101] is None  # real values kept

    monkeypatch.setenv("SPARK_GRAFT_ARROW_SCAN_FILES", "1")
    fast = read_iceberg_table(spark, path)
    assert "graft_arrow_scan" in fast._jdf.queryExecution().toString()
    assert {r.id: r.flag for r in fast.collect()} == got
    monkeypatch.setenv("SPARK_GRAFT_ARROW_SCAN_FILES", "10000000")

    # DML predicate over the defaulted column sees spec values
    delete_from_iceberg(spark, path, "flag = 7 AND id < 5")
    left = sorted(
        r.id for r in read_iceberg_table(spark, path).collect()
    )
    assert left == list(range(5, 40)) + [100, 101]

    # the changelog surfaces the same defaults per branch
    ch = read_iceberg_changelog(spark, path).collect()
    ins = {r.id: r.flag for r in ch if r._change_type == "insert"}
    assert ins[0] == 7 and ins[100] == 9 and ins[101] is None
    dels = {r.id: r.flag for r in ch if r._change_type == "delete"}
    assert dels == {0: 7, 1: 7, 2: 7, 3: 7, 4: 7}


def test_v3_unsupported_default_type_refused_only_when_needed(
    spark, tmp_path
):
    """A non-primitive initial-default refuses ONLY when some file
    physically lacks the column (the default would be consulted);
    a table whose every live file carries it reads fine (review
    finding: the old check raised eagerly and made previously-
    readable tables unreadable)."""
    from data_lakehouse_project_spark.operators.iceberg_writer import (
        upgrade_iceberg_to_v3,
    )

    path = _export_table(spark, tmp_path, "dfltbad")
    upgrade_iceberg_to_v3(spark, path)
    _add_default_column(path, "amt", "decimal(10, 2)", "1.00")
    with pytest.raises(
        UnsupportedIcebergFeature, match="initial-default"
    ):
        read_iceberg_table(spark, path).collect()

    # every-file-carries-it case: stamp the default metadata onto an
    # EXISTING physical column — never consulted, reads fine
    path2 = str(tmp_path / "dfltok")
    t = TxnTable(path2)
    t.write(
        spark.range(0, 6).selectExpr(
            "id", "CAST(id AS DOUBLE) AS v",
            "CAST(id AS DECIMAL(10, 2)) AS amt",
        ),
        mode="overwrite",
    )
    export_iceberg_metadata(t, spark)
    md_file = _latest_metadata_file(path2)
    md = load_iceberg_metadata(path2)
    sch = next(
        x for x in md["schemas"]
        if x["schema-id"] == md["current-schema-id"]
    )
    for f in sch["fields"]:
        if f["name"] == "amt":
            f["initial-default"] = "1.00"
    cur_v = int(os.path.basename(md_file)[1:].split(".")[0])
    meta_dir = os.path.join(path2, "metadata")
    with open(
        os.path.join(meta_dir, f"v{cur_v + 1}.metadata.json"), "x"
    ) as fh:
        json.dump(md, fh)
    with open(
        os.path.join(meta_dir, "version-hint.text"), "w"
    ) as fh:
        fh.write(str(cur_v + 1))
    got = read_iceberg_table(spark, path2)
    assert got.count() == 6  # default never consulted: no refusal


def test_v3_initial_default_streaming(spark, tmp_path):
    """The streaming source (plain + changelog modes) fills v3
    initial-defaults identically to the batch reader."""
    from data_lakehouse_project_spark.operators.iceberg_writer import (
        append_to_iceberg,
        upgrade_iceberg_to_v3,
    )
    from data_lakehouse_project_spark.sources.python_datasource import (
        register_python_datasources,
    )

    path = _export_table(spark, tmp_path, "dfstream")
    upgrade_iceberg_to_v3(spark, path)
    _add_default_column(path, "flag", "int", 7)
    append_to_iceberg(
        spark,
        spark.createDataFrame(
            [(100, 1.0, 9)], "id long, v double, flag int"
        ),
        path,
    )
    register_python_datasources(spark)
    sink: list = []

    def _each(df, _bid):
        sink.extend((r["id"], r["flag"]) for r in df.collect())

    q = (
        spark.readStream.format("iceberg_stream")
        .option("path", path)
        .load()
        .writeStream.foreachBatch(_each)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = dict(sink)
    assert got[0] == 7 and got[39] == 7 and got[100] == 9
    assert len(sink) == 41


def test_v3_partial_dv_supersession(spark, tmp_path):
    """A delete manifest holding DVs for SEVERAL files, then a second
    DELETE touching only SOME of them: the rewritten manifest keeps
    the untouched DVs as EXISTING (original attribution) and flips
    only the superseded ones — still at most one live DV per file,
    reads exact, changelog emits each kill once."""
    from collections import Counter

    from data_lakehouse_project_spark.operators.iceberg_reader import (
        iceberg_live_files,
    )
    from data_lakehouse_project_spark.operators.iceberg_writer import (
        upgrade_iceberg_to_v3,
    )

    path = str(tmp_path / "psup")
    t = TxnTable(path)
    # 4 files of 10 rows each (ids 0..39, file i holds 10i..10i+9)
    t.write(
        spark.range(0, 40)
        .repartitionByRange(4, "id")
        .selectExpr("id", "CAST(id AS DOUBLE) AS v"),
        mode="overwrite",
    )
    export_iceberg_metadata(t, spark)
    upgrade_iceberg_to_v3(spark, path)
    # first delete touches EVERY file (one manifest, 4 DV entries)
    delete_from_iceberg(spark, path, "id % 10 = 3")
    # second delete touches only the low-id files
    delete_from_iceberg(spark, path, "id IN (1, 11)")
    _, _, posd, _ = iceberg_live_files(spark, path)
    dvs = [f for f in posd if f.get("__is_dv")]
    cnt = Counter(f["referenced_data_file"] for f in dvs)
    assert max(cnt.values()) == 1 and len(cnt) == 4
    # merged DVs on the touched files, originals on the rest
    sizes = sorted(
        len(dv_positions_of_entry(path, f)) for f in dvs
    )
    assert sizes == [1, 1, 2, 2]
    got = sorted(r.id for r in read_iceberg_table(spark, path).collect())
    dead = {3, 13, 23, 33, 1, 11}
    assert got == [i for i in range(40) if i not in dead]
    ch = read_iceberg_changelog(spark, path).collect()
    dels = [r.id for r in ch if r._change_type == "delete"]
    assert sorted(dels) == sorted(dead)
    assert len(dels) == len(set(dels))


def test_v3_multi_manifest_dv_supersession(spark, tmp_path):
    """One DML superseding DVs that live in TWO different prior
    manifests: both rewrite in the same commit, every file keeps at
    most one live DV, totals exact."""
    from collections import Counter

    from data_lakehouse_project_spark.operators.iceberg_reader import (
        iceberg_live_files,
    )
    from data_lakehouse_project_spark.operators.iceberg_writer import (
        upgrade_iceberg_to_v3,
    )

    path = str(tmp_path / "mm")
    t = TxnTable(path)
    t.write(
        spark.range(0, 40)
        .repartitionByRange(4, "id")
        .selectExpr("id", "CAST(id AS DOUBLE) AS v"),
        mode="overwrite",
    )
    export_iceberg_metadata(t, spark)
    upgrade_iceberg_to_v3(spark, path)
    delete_from_iceberg(spark, path, "id = 5")    # M1: file 0 only
    delete_from_iceberg(spark, path, "id = 35")   # M2: file 3 only
    # touches files 0..3 -> supersedes M1's and M2's DVs at once
    delete_from_iceberg(spark, path, "id % 10 = 7")
    _, _, posd, _ = iceberg_live_files(spark, path)
    dvs = [f for f in posd if f.get("__is_dv")]
    cnt = Counter(f["referenced_data_file"] for f in dvs)
    assert max(cnt.values()) == 1 and len(cnt) == 4
    dead = {5, 35, 7, 17, 27, 37}
    got = sorted(r.id for r in read_iceberg_table(spark, path).collect())
    assert got == [i for i in range(40) if i not in dead]
    ch = read_iceberg_changelog(spark, path).collect()
    dels = [r.id for r in ch if r._change_type == "delete"]
    assert sorted(dels) == sorted(dead)
    assert len(dels) == len(set(dels))
