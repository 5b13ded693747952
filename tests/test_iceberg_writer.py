"""Foreign Iceberg APPEND writer (operators/iceberg_writer.py):
snapshot commit parity through the foreign reader, incremental
attribution, identity partitions, bounds-based pruning, gating, and
the exclusive-create concurrency contract."""

from __future__ import annotations

import json
import os

import pyarrow.parquet as pq
import pytest

from data_lakehouse_project_spark.operators.iceberg_export import (
    export_iceberg_metadata,
)
from data_lakehouse_project_spark.operators.iceberg_reader import (
    UnsupportedIcebergFeature,
    iceberg_snapshot_ids,
    read_iceberg_changelog,
    read_iceberg_changes,
    read_iceberg_table,
)
from data_lakehouse_project_spark.operators.iceberg_writer import (
    append_to_iceberg,
)
from data_lakehouse_project_spark.operators.txnlog import TxnTable


def _df(spark, lo, hi, part="a"):
    return spark.range(lo, hi).selectExpr(
        "id", f"'{part}' AS part", "CAST(id AS DOUBLE) AS v"
    )


def _table(spark, tmp_path, **write_kw):
    path = str(tmp_path / "t")
    t = TxnTable(path)
    t.write(_df(spark, 0, 4), mode="overwrite", **write_kw)
    export_iceberg_metadata(t, spark)
    return path


def test_append_round_trips_and_attributes(spark, tmp_path):
    path = _table(spark, tmp_path)
    info = append_to_iceberg(spark, _df(spark, 4, 7), path)
    assert info["files"] >= 1 and info["rows"] == 3

    got = read_iceberg_table(spark, path)
    assert sorted(r.id for r in got.collect()) == list(range(7))
    sids = [s for s, _ in iceberg_snapshot_ids(path)]
    assert len(sids) == 2 and sids[1] == info["snapshot_id"]

    # incremental scan: the new rows belong to the NEW snapshot only
    inc = read_iceberg_changes(spark, path, from_snapshot_id=sids[0])
    assert sorted((r.id, r._snapshot_id) for r in inc.collect()) == [
        (4, sids[1]), (5, sids[1]), (6, sids[1]),
    ]
    # time travel: the parent snapshot is untouched
    old = read_iceberg_table(spark, path, snapshot_id=sids[0])
    assert sorted(r.id for r in old.collect()) == [0, 1, 2, 3]

    # a second append chains (parent = previous head)
    info2 = append_to_iceberg(spark, _df(spark, 7, 8), path)
    assert info2["snapshot_id"] == info["snapshot_id"] + 1
    got = read_iceberg_table(spark, path)
    assert sorted(r.id for r in got.collect()) == list(range(8))


def test_append_stream_tails_only_new(spark, tmp_path):
    from data_lakehouse_project_spark.sources.python_datasource import (
        register_python_datasources,
    )

    path = _table(spark, tmp_path)
    register_python_datasources(spark)

    def _run(ckpt, sink):
        q = (
            spark.readStream.format("iceberg_stream")
            .option("path", path)
            .load()
            .writeStream.foreachBatch(
                lambda df, _b: sink.extend(
                    r["id"] for r in df.collect()
                )
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    sink: list = []
    ckpt = str(tmp_path / "ck")
    _run(ckpt, sink)
    assert sorted(sink) == [0, 1, 2, 3]
    append_to_iceberg(spark, _df(spark, 4, 6), path)
    _run(ckpt, sink)
    assert sorted(sink) == [0, 1, 2, 3, 4, 5]


def test_append_identity_partitioned(spark, tmp_path):
    path = str(tmp_path / "tp")
    t = TxnTable(path)
    t.write(
        _df(spark, 0, 3, "a"), mode="overwrite", partition_by=["part"]
    )
    export_iceberg_metadata(t, spark)

    info = append_to_iceberg(
        spark,
        _df(spark, 3, 5, "b").union(_df(spark, 5, 6, "c")),
        path,
    )
    assert info["files"] >= 2
    got = read_iceberg_table(spark, path)
    assert sorted((r.id, r.part) for r in got.collect()) == [
        (0, "a"), (1, "a"), (2, "a"), (3, "b"), (4, "b"), (5, "c"),
    ]
    # identity partition values prune files (manifest partition struct)
    pruned = read_iceberg_table(spark, path, prune=[("part", "=", "c")])
    assert sorted(r.id for r in pruned.collect()) == [5]

    # Iceberg data files CONTAIN the partition columns (unlike Delta)
    from data_lakehouse_project_spark.operators.iceberg_reader import (
        iceberg_live_files,
    )

    _, live, _, _ = iceberg_live_files(spark, path)
    appended = [f for f in live if "append-" in f["file_path"]]
    assert appended
    for f in appended:
        cols = pq.read_schema(f["file_path"]).names
        assert "part" in cols
        # spec: every column stamped with its field id
        sch = pq.read_schema(f["file_path"])
        assert all(
            fld.metadata and b"PARQUET:field_id" in fld.metadata
            for fld in sch
        )


def test_append_bounds_enable_pruning(spark, tmp_path):
    path = _table(spark, tmp_path)
    append_to_iceberg(spark, _df(spark, 100, 104), path)
    pruned = read_iceberg_table(spark, path, prune=[("id", ">=", 100)])
    assert sorted(r.id for r in pruned.collect()) == [100, 101, 102, 103]


def test_gates_and_collision(spark, tmp_path):
    path = _table(spark, tmp_path)
    with pytest.raises(ValueError, match="schema mismatch"):
        append_to_iceberg(
            spark, spark.range(2).selectExpr("id", "id AS zzz"), path
        )

    # v1 tables refuse (no data sequence numbers)
    meta_dir = os.path.join(path, "metadata")
    hint = int(open(os.path.join(meta_dir, "version-hint.text")).read())
    md_path = os.path.join(meta_dir, f"v{hint}.metadata.json")
    md = json.load(open(md_path))
    md1 = dict(md, **{"format-version": 1})
    v1dir = str(tmp_path / "v1t")
    os.makedirs(os.path.join(v1dir, "metadata"))
    with open(
        os.path.join(v1dir, "metadata", "v1.metadata.json"), "w"
    ) as fh:
        json.dump(md1, fh)
    with open(
        os.path.join(v1dir, "metadata", "version-hint.text"), "w"
    ) as fh:
        fh.write("1")
    with pytest.raises(UnsupportedIcebergFeature, match="format-version"):
        append_to_iceberg(spark, _df(spark, 0, 1), v1dir)

    # concurrent commit: another writer takes v{N+1} first
    with open(
        os.path.join(meta_dir, f"v{hint + 1}.metadata.json"), "w"
    ) as fh:
        fh.write("{}")

    def _appended_files():
        out = set()
        for root, _, files in os.walk(path):
            out |= {f for f in files if f.startswith("append-")}
        return out

    before = _appended_files()
    with pytest.raises(ValueError, match="concurrent"):
        append_to_iceberg(spark, _df(spark, 4, 5), path)
    # staged data rolled back
    assert _appended_files() == before


def test_delete_from_iceberg_position_deletes(spark, tmp_path):
    """delete_from_iceberg: one 'delete' snapshot adds a position-
    delete file; no data rewritten; already-deleted rows never
    re-match; partition-column predicates work; time travel sees the
    pre-delete rows."""
    from data_lakehouse_project_spark.operators.iceberg_writer import (
        delete_from_iceberg,
    )

    path = str(tmp_path / "tp")
    t = TxnTable(path)
    t.write(
        _df(spark, 0, 4, "a").union(_df(spark, 4, 6, "b")),
        mode="overwrite",
        partition_by=["part"],
    )
    export_iceberg_metadata(t, spark)
    sid0 = [s for s, _ in iceberg_snapshot_ids(path)][-1]

    info = delete_from_iceberg(
        spark, path, "part = 'a' AND id IN (1, 3)"
    )
    assert info["rows_deleted"] == 2
    got = read_iceberg_table(spark, path)
    assert sorted((r.id, r.part) for r in got.collect()) == [
        (0, "a"), (2, "a"), (4, "b"), (5, "b"),
    ]
    # the deleting snapshot is labeled truthfully
    from data_lakehouse_project_spark.operators.iceberg_reader import (
        iceberg_metadata_df,
    )

    ops = {
        r.snapshot_id: r.operation
        for r in iceberg_metadata_df(spark, path, "snapshots").collect()
    }
    assert ops[info["snapshot_id"]] == "delete"
    # time travel: the pre-delete snapshot is intact
    old = read_iceberg_table(spark, path, snapshot_id=sid0)
    assert sorted(r.id for r in old.collect()) == [0, 1, 2, 3, 4, 5]

    # second delete: already-deleted rows never re-match; overlapping
    # delete files coexist (readers union them)
    info2 = delete_from_iceberg(spark, path, "id <= 2")
    assert info2["rows_deleted"] == 2  # ids 0, 2 (1 already gone)
    got = read_iceberg_table(spark, path)
    assert sorted(r.id for r in got.collect()) == [4, 5]

    # a predicate matching nothing commits nothing
    info3 = delete_from_iceberg(spark, path, "id = 999")
    assert info3["rows_deleted"] == 0 and info3["snapshot_id"] is None

    # append after delete still streams (carried delete manifest is
    # not an ADDED one) and reads
    from data_lakehouse_project_spark.operators.iceberg_writer import (
        append_to_iceberg,
    )

    append_to_iceberg(spark, _df(spark, 10, 12, "c"), path)
    got = read_iceberg_table(spark, path)
    assert sorted(r.id for r in got.collect()) == [4, 5, 10, 11]


def test_rewrite_data_files_compacts_and_drops_deletes(spark, tmp_path):
    """rewrite_data_files: one 'replace' snapshot — multi-file
    partitions compact with position deletes APPLIED, delete manifests
    drop, untouched files stay EXISTING with original attribution;
    streams and incremental scans skip the rewrite."""
    from data_lakehouse_project_spark.operators.iceberg_reader import (
        iceberg_live_files,
        iceberg_metadata_df,
    )
    from data_lakehouse_project_spark.operators.iceberg_writer import (
        delete_from_iceberg,
        rewrite_data_files,
    )
    from data_lakehouse_project_spark.sources.python_datasource import (
        register_python_datasources,
    )

    path = _table(spark, tmp_path)                   # snapshot 1
    append_to_iceberg(spark, _df(spark, 4, 6), path)  # snapshot 2
    delete_from_iceberg(spark, path, "id = 1")        # snapshot 3
    _, live_before, pd_before, _ = iceberg_live_files(spark, path)
    assert len(live_before) >= 2 and pd_before

    info = rewrite_data_files(spark, path)
    assert info["files_rewritten"] >= 2 and info["files_added"] >= 1
    got = read_iceberg_table(spark, path)
    assert sorted(r.id for r in got.collect()) == [0, 2, 3, 4, 5]

    # delete manifests are gone; the live set shrank
    _, live, pd_after, eq_after = iceberg_live_files(spark, path)
    assert not pd_after and not eq_after
    assert len(live) <= len(live_before)
    # the op label is 'replace' and streams/incremental scans skip it
    ops = {
        r.snapshot_id: r.operation
        for r in iceberg_metadata_df(spark, path, "snapshots").collect()
    }
    assert ops[info["snapshot_id"]] == "replace"
    # incremental scan: the REPLACE snapshot is skipped (no rows
    # re-attributed); the DELETE snapshot in range DELEGATES to the
    # changelog (round 11) — the scan equals its insert rows
    inc_all = read_iceberg_changes(spark, path)
    ch = read_iceberg_changelog(spark, path)
    want_ins = sorted(
        map(tuple, ch.where("_change_type = 'insert'")
            .drop("_change_type").collect())
    )
    assert sorted(map(tuple, inc_all.collect())) == want_ins
    sids_sorted = sorted(ops)
    inc = read_iceberg_changes(
        spark, path, from_snapshot_id=sids_sorted[-2]
    )  # (delete_snapshot, replace] -> replace skipped, empty
    assert inc.count() == 0

    register_python_datasources(spark)
    sink: list = []
    q = (
        spark.readStream.format("iceberg_stream")
        .option("path", path)
        .option("skipDeleteSnapshots", "true")
        .load()
        .writeStream.foreachBatch(
            lambda b, _i: sink.extend(r["id"] for r in b.collect())
        )
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # raw appends once (0..5); the delete snapshot skipped by option;
    # the replace snapshot skipped by design — nothing re-ships
    assert sorted(sink) == [0, 1, 2, 3, 4, 5]

    # time travel to the pre-rewrite snapshot still works
    sid3 = sorted(ops)[-2]
    old = read_iceberg_table(spark, path, snapshot_id=sid3)
    assert sorted(r.id for r in old.collect()) == [0, 2, 3, 4, 5]


def test_rewrite_partitioned_with_deletes(spark, tmp_path):
    from data_lakehouse_project_spark.operators.iceberg_reader import (
        iceberg_live_files,
    )
    from data_lakehouse_project_spark.operators.iceberg_writer import (
        delete_from_iceberg,
        rewrite_data_files,
    )

    path = str(tmp_path / "tp")
    t = TxnTable(path)
    t.write(
        _df(spark, 0, 3, "a"), mode="overwrite", partition_by=["part"]
    )
    export_iceberg_metadata(t, spark)
    append_to_iceberg(spark, _df(spark, 3, 5, "a"), path)
    append_to_iceberg(spark, _df(spark, 5, 7, "b"), path)
    delete_from_iceberg(spark, path, "id = 0")

    info = rewrite_data_files(spark, path)
    assert info["files_added"] >= 1
    got = read_iceberg_table(spark, path)
    assert sorted((r.id, r.part) for r in got.collect()) == [
        (1, "a"), (2, "a"), (3, "a"), (4, "a"), (5, "b"), (6, "b"),
    ]
    # partition pruning still works over the rewritten manifest
    pruned = read_iceberg_table(spark, path, prune=[("part", "=", "b")])
    assert sorted(r.id for r in pruned.collect()) == [5, 6]
    # each partition compacted to a single file carrying its typed
    # partition value in the rewritten manifest
    _, live, _, _ = iceberg_live_files(spark, path)
    by_part: dict = {}
    for f in live:
        by_part.setdefault(
            (f.get("partition") or {}).get("part"), []
        ).append(f["file_path"])
    assert len(by_part["a"]) == 1 and len(by_part["b"]) == 1


def test_update_from_iceberg_one_snapshot(spark, tmp_path):
    """update_from_iceberg: one 'overwrite' snapshot carries BOTH the
    position-delete manifest and the new data manifest — matched rows
    rewritten, time travel intact, partition-moving SETs refused."""
    from data_lakehouse_project_spark.operators.iceberg_reader import (
        iceberg_metadata_df,
    )
    from data_lakehouse_project_spark.operators.iceberg_writer import (
        update_from_iceberg,
    )

    path = str(tmp_path / "tp")
    t = TxnTable(path)
    t.write(
        _df(spark, 0, 4, "a").union(_df(spark, 4, 6, "b")),
        mode="overwrite",
        partition_by=["part"],
    )
    export_iceberg_metadata(t, spark)
    sid0 = [s for s, _ in iceberg_snapshot_ids(path)][-1]

    info = update_from_iceberg(
        spark, path, "id IN (1, 4)", {"v": "v + 1000"}
    )
    assert info["rows_updated"] == 2
    got = {r.id: (r.v, r.part)
           for r in read_iceberg_table(spark, path).collect()}
    assert got[1] == (1001.0, "a") and got[4] == (1004.0, "b")
    assert got[0] == (0.0, "a") and len(got) == 6

    ops = {
        r.snapshot_id: r.operation
        for r in iceberg_metadata_df(spark, path, "snapshots").collect()
    }
    assert ops[info["snapshot_id"]] == "overwrite"
    # time travel: originals intact
    old = {r.id: r.v
           for r in read_iceberg_table(spark, path,
                                       snapshot_id=sid0).collect()}
    assert old[1] == 1.0 and old[4] == 4.0

    # second update composes over the first (existing deletes applied)
    info2 = update_from_iceberg(spark, path, "id = 1", {"v": "0.5"})
    assert info2["rows_updated"] == 1
    got = {r.id: r.v
           for r in read_iceberg_table(spark, path).collect()}
    assert got[1] == 0.5 and len(got) == 6

    # unknown column refused; no-op ok
    with pytest.raises(ValueError, match="unknown columns"):
        update_from_iceberg(spark, path, "id = 0", {"zzz": "1"})
    noop = update_from_iceberg(spark, path, "id = 999", {"v": "0"})
    assert noop["rows_updated"] == 0 and noop["snapshot_id"] is None


def test_update_moves_row_across_identity_partitions(spark, tmp_path):
    """Partition-moving SETs (round-8 refusal lifted): the matched row
    position-deletes from its old partition's file and its rewrite
    lands in the NEW partition — one overwrite snapshot, the row reads
    back exactly once, pruning is correct on BOTH partitions, and time
    travel still sees the original placement."""
    from data_lakehouse_project_spark.operators.iceberg_reader import (
        load_iceberg_metadata,
    )
    from data_lakehouse_project_spark.operators.iceberg_writer import (
        merge_into_iceberg,
        update_from_iceberg,
    )

    path = str(tmp_path / "tm")
    t = TxnTable(path)
    t.write(
        _df(spark, 0, 4, "a").union(_df(spark, 4, 6, "b")),
        mode="overwrite",
        partition_by=["part"],
    )
    export_iceberg_metadata(t, spark)
    sid0 = [s for s, _ in iceberg_snapshot_ids(path)][-1]

    info = update_from_iceberg(spark, path, "id = 1", {"part": "'b'"})
    assert info["rows_updated"] == 1
    got = sorted(
        (r.id, r.part) for r in read_iceberg_table(spark, path).collect()
    )
    assert got.count((1, "b")) == 1 and (1, "a") not in got
    assert len(got) == 6  # exactly once, nothing lost

    # pruning correct on BOTH partitions
    in_a = read_iceberg_table(spark, path, prune=[("part", "=", "a")])
    in_b = read_iceberg_table(spark, path, prune=[("part", "=", "b")])
    assert sorted(r.id for r in in_a.collect()) == [0, 2, 3]
    assert sorted(r.id for r in in_b.collect()) == [1, 4, 5]
    # the moved row's new file is attributed to partition b in the
    # manifests (not just readable by accident)
    md = load_iceberg_metadata(path)
    assert md is not None

    # time travel: the original placement is intact
    old = read_iceberg_table(spark, path, snapshot_id=sid0,
                             prune=[("part", "=", "a")])
    assert sorted(r.id for r in old.collect()) == [0, 1, 2, 3]

    # MERGE with a partition-moving SET works the same way
    src = spark.createDataFrame(
        [(4, "a", 44.0)], "id long, part string, v double"
    )
    info2 = merge_into_iceberg(
        spark, path, src, "t.id = s.id",
        when_matched_update={"part": "s.part", "v": "s.v"},
    )
    assert info2["rows_updated"] == 1
    in_a = read_iceberg_table(spark, path, prune=[("part", "=", "a")])
    assert sorted(r.id for r in in_a.collect()) == [0, 2, 3, 4]
    in_b = read_iceberg_table(spark, path, prune=[("part", "=", "b")])
    assert sorted(r.id for r in in_b.collect()) == [1, 5]


def test_append_merge_schema_iceberg(spark, tmp_path):
    """merge_schema: new columns get FRESH field ids, last-column-id
    advances, a new schemas entry becomes current — pre-evolution
    files read the column as null via field-id resolution."""
    from data_lakehouse_project_spark.operators.iceberg_reader import (
        load_iceberg_metadata,
    )

    path = _table(spark, tmp_path)
    df = spark.range(100, 102).selectExpr(
        "id", "'a' AS part", "CAST(1.0 AS DOUBLE) AS v",
        "'n-' || id AS note"
    )
    with pytest.raises(ValueError, match="schema mismatch"):
        append_to_iceberg(spark, df, path)
    info = append_to_iceberg(spark, df, path, merge_schema=True)
    assert info["rows"] == 2
    md = load_iceberg_metadata(path)
    cur = [s for s in md["schemas"]
           if s["schema-id"] == md["current-schema-id"]][0]
    note = [f for f in cur["fields"] if f["name"] == "note"][0]
    assert note["id"] == md["last-column-id"] and not note["required"]
    got = read_iceberg_table(spark, path)
    rows = {r.id: r.note for r in got.collect()}
    assert rows[100] == "n-100" and rows[0] is None
    # plain appends keep working against the evolved schema
    append_to_iceberg(
        spark,
        spark.range(102, 103).selectExpr(
            "id", "'a' AS part", "CAST(1.0 AS DOUBLE) AS v",
            "'z' AS note"
        ),
        path,
    )
    assert read_iceberg_table(spark, path).count() == 7


def test_merge_into_iceberg_upsert(spark, tmp_path):
    """MERGE INTO iceberg in one overwrite snapshot: matched rows
    position-delete + rewrite, unmatched insert; ambiguity fails
    pre-commit; insert-only merges commit a plain append."""
    from data_lakehouse_project_spark.operators.iceberg_reader import (
        iceberg_metadata_df,
    )
    from data_lakehouse_project_spark.operators.iceberg_writer import (
        merge_into_iceberg,
    )

    path = _table(spark, tmp_path)  # ids 0..3
    source = spark.createDataFrame(
        [(2, "a", 99.0), (10, "a", 97.0)],
        "id long, part string, v double",
    )
    info = merge_into_iceberg(
        spark, path, source, "t.id = s.id",
        when_matched_update={"v": "s.v"},
    )
    assert (info["rows_updated"], info["rows_inserted"]) == (1, 1)
    got = {r.id: r.v for r in read_iceberg_table(spark, path).collect()}
    assert got == {0: 0.0, 1: 1.0, 2: 99.0, 3: 3.0, 10: 97.0}
    ops = {
        r.snapshot_id: r.operation
        for r in iceberg_metadata_df(spark, path, "snapshots").collect()
    }
    assert ops[info["snapshot_id"]] == "overwrite"

    # idempotent re-merge: same values, no inserts
    info2 = merge_into_iceberg(
        spark, path, source, "t.id = s.id",
        when_matched_update={"v": "s.v"},
    )
    assert info2["rows_inserted"] == 0 and info2["rows_updated"] == 2
    assert read_iceberg_table(spark, path).count() == 5

    # ambiguity pre-commit
    dup = spark.createDataFrame(
        [(2, "a", 1.0), (2, "a", 2.0)],
        "id long, part string, v double",
    )
    with pytest.raises(ValueError, match="ambiguous"):
        merge_into_iceberg(
            spark, path, dup, "t.id = s.id",
            when_matched_update={"v": "s.v"},
        )

    # insert-only: 'append' snapshot, streams tail it
    src2 = spark.createDataFrame(
        [(20, "a", 1.0)], "id long, part string, v double"
    )
    info3 = merge_into_iceberg(
        spark, path, src2, "t.id = s.id",
        when_matched_update=None,
    )
    assert info3["rows_inserted"] == 1
    ops = {
        r.snapshot_id: r.operation
        for r in iceberg_metadata_df(spark, path, "snapshots").collect()
    }
    assert ops[info3["snapshot_id"]] == "append"


def test_merge_into_empty_iceberg_inserts_all(spark, tmp_path):
    """MERGE into a table with NO live data files must treat every
    source row as unmatched and insert it (ADVICE r8: the scan-is-None
    path previously skipped the insert branch and silently returned
    snapshot_id None)."""
    from data_lakehouse_project_spark.operators.iceberg_writer import (
        delete_from_iceberg,
        merge_into_iceberg,
    )

    # empty table: export of a 0-row TxnTable snapshot
    path = str(tmp_path / "empty")
    t = TxnTable(path)
    t.write(_df(spark, 0, 4).limit(0), mode="overwrite")
    export_iceberg_metadata(t, spark)

    src = spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", 20.0)],
        "id long, part string, v double",
    )
    info = merge_into_iceberg(
        spark, path, src, "t.id = s.id",
        when_matched_update={"v": "s.v"},
    )
    assert info["snapshot_id"] is not None
    assert info["rows_inserted"] == 2 and info["rows_updated"] == 0
    got = {r.id: r.v for r in read_iceberg_table(spark, path).collect()}
    assert got == {1: 10.0, 2: 20.0}

    # and the merge after a full delete (live files but all rows dead)
    path2 = _table(spark, tmp_path)  # ids 0..3
    delete_from_iceberg(spark, path2, "id >= 0")
    assert read_iceberg_table(spark, path2).count() == 0
    info2 = merge_into_iceberg(
        spark, path2, src, "t.id = s.id",
        when_matched_update={"v": "s.v"},
    )
    assert info2["rows_inserted"] == 2
    got2 = {
        r.id: r.v for r in read_iceberg_table(spark, path2).collect()
    }
    assert got2 == {1: 10.0, 2: 20.0}


def test_pos_delete_filenames_never_collide(spark, tmp_path):
    """Two writers racing from the same snapshot compute the same
    snapshot_id (max+1); the position-delete parquet must still get a
    unique path so the loser's write/rollback can never clobber the
    winner's committed file (ADVICE r8)."""
    from data_lakehouse_project_spark.operators.iceberg_writer import (
        _write_pos_delete_manifest,
    )
    from data_lakehouse_project_spark.operators.iceberg_reader import (
        load_iceberg_metadata,
    )

    path = _table(spark, tmp_path)
    md = load_iceberg_metadata(path)
    pairs = [("data/whatever.parquet", 0)]
    row1, rb1 = _write_pos_delete_manifest(
        spark, path, md, pairs, snapshot_id=99, seq=9
    )
    row2, rb2 = _write_pos_delete_manifest(
        spark, path, md, pairs, snapshot_id=99, seq=9
    )
    p1 = [p for p in rb1 if p.endswith(".parquet")]
    p2 = [p for p in rb2 if p.endswith(".parquet")]
    assert p1 and p2 and set(p1).isdisjoint(p2)
    for p in p1 + p2:
        assert os.path.exists(p)


def test_write_equality_deletes(spark, tmp_path):
    """Equality-delete commit (the Flink-CDC delete shape): matching
    rows in PRIOR data files disappear without any scan/rewrite; rows
    appended AFTER the delete survive even when they match (the
    spec's strict sequence rule); readers see the manifest's
    equality_ids; incremental scans refuse the snapshot."""
    from data_lakehouse_project_spark.operators.iceberg_reader import (
        read_iceberg_changes,
    )
    from data_lakehouse_project_spark.operators.iceberg_writer import (
        write_equality_deletes,
    )

    # unpartitioned table (global eq deletes refuse partitioned specs)
    path = str(tmp_path / "eq")
    t = TxnTable(path)
    t.write(_df(spark, 0, 6), mode="overwrite")
    export_iceberg_metadata(t, spark)
    sid0 = [s for s, _ in iceberg_snapshot_ids(path)][-1]

    keys = spark.createDataFrame([(1,), (4,), (99,)], "id long")
    info = write_equality_deletes(spark, path, keys, ["id"])
    assert info["key_rows"] == 3 and info["delete_files"] >= 1
    got = sorted(r.id for r in read_iceberg_table(spark, path).collect())
    assert got == [0, 2, 3, 5]
    # time travel: pre-delete snapshot intact
    old = read_iceberg_table(spark, path, snapshot_id=sid0)
    assert sorted(r.id for r in old.collect()) == [0, 1, 2, 3, 4, 5]

    # the strict sequence rule: a LATER append of a matching key lives
    append_to_iceberg(spark, _df(spark, 4, 5), path)
    got = sorted(r.id for r in read_iceberg_table(spark, path).collect())
    assert got == [0, 2, 3, 4, 5]

    # incremental append scan DELEGATES over the eq-delete snapshot
    # (round 11): the range's adds are the post-delete append only
    inc = read_iceberg_changes(spark, path, from_snapshot_id=sid0)
    assert sorted(r.id for r in inc.collect()) == [4]

    # refusals: unknown column; missing key column (partitioned
    # tables take the GLOBAL unpartitioned-spec route since r10 —
    # see test_equality_deletes_on_partitioned_table_global_spec)
    from data_lakehouse_project_spark.operators.iceberg_writer import (
        write_equality_deletes as _weq,
    )

    with pytest.raises(ValueError, match="unknown"):
        _weq(spark, path, keys, ["zzz"])
    with pytest.raises(ValueError, match="missing"):
        _weq(spark, path, keys, ["v"])


def test_equality_deletes_on_partitioned_table_global_spec(
    spark, tmp_path
):
    """Partitioned tables take the spec's GLOBAL equality-delete
    route: the delete manifest declares an UNPARTITIONED spec (added
    to the metadata in the same commit) and kills matching keys in
    every partition; later re-inserts survive the sequence rule."""
    from data_lakehouse_project_spark.operators.iceberg_reader import (
        load_iceberg_metadata,
    )
    from data_lakehouse_project_spark.operators.iceberg_writer import (
        upsert_into_iceberg,
        write_equality_deletes,
    )

    path = str(tmp_path / "pt")
    t = TxnTable(path)
    t.write(
        spark.range(0, 12).selectExpr(
            "id", "CAST(id % 3 AS STRING) AS part",
            "CAST(id AS DOUBLE) AS v",
        ),
        mode="overwrite",
        partition_by=["part"],
    )
    export_iceberg_metadata(t, spark)
    write_equality_deletes(
        spark, path,
        spark.createDataFrame([(1,), (4,), (7,)], "id long"), ["id"],
    )
    md = load_iceberg_metadata(path)
    specs = {s["spec-id"]: s for s in md["partition-specs"]}
    unparts = [s for s in specs.values() if not s["fields"]]
    assert len(unparts) == 1  # added once, reused after
    got = sorted(r.id for r in read_iceberg_table(spark, path).collect())
    assert got == [0, 2, 3, 5, 6, 8, 9, 10, 11]

    # keyed upsert on the partitioned table: replaced keys move, new
    # keys insert, the delete manifest reuses the unpartitioned spec
    src = spark.createDataFrame(
        [(2, "9", 222.0), (100, "9", 100.0)],
        "id long, part string, v double",
    )
    upsert_into_iceberg(spark, path, src, ["id"])
    md = load_iceberg_metadata(path)
    assert (
        len([s for s in md["partition-specs"] if not s["fields"]]) == 1
    )
    rows = {
        r.id: (r.part, r.v)
        for r in read_iceberg_table(spark, path).collect()
    }
    assert rows[2] == ("9", 222.0) and rows[100] == ("9", 100.0)
    assert len(rows) == 10
    # changelog replays the partitioned upsert exactly
    ch = read_iceberg_changelog(spark, path)
    got = sorted(
        (r._change_type, r.id)
        for r in ch.where("id IN (2, 100)").collect()
    )
    assert got == [
        ("delete", 2),
        ("insert", 2),
        ("insert", 2),
        ("insert", 100),
    ]


def test_equality_delete_on_absent_partition_source_column(
    spark, tmp_path
):
    """Equality delete keyed on an identity-partition SOURCE column
    that is physically absent from the data files: the snapshot read
    applies it through the manifests' partition constants (the ident
    fill precedes the equality anti-join); CDC replay substitutes the
    same constants (round 11 — this used to refuse), so the
    changelog's cumulative state equals the snapshot."""
    from data_lakehouse_project_spark.operators.iceberg_writer import (
        write_equality_deletes,
    )

    path = str(tmp_path / "abs")
    t = TxnTable(path)
    t.write(
        spark.range(0, 12).selectExpr(
            "id", "CAST(id % 3 AS STRING) AS part",
            "CAST(id AS DOUBLE) AS v",
        ),
        mode="overwrite",
        partition_by=["part"],  # 'part' absent from the parquet
    )
    export_iceberg_metadata(t, spark)
    write_equality_deletes(
        spark, path,
        spark.createDataFrame([("1",)], "part string"), ["part"],
    )
    got = sorted(r.id for r in read_iceberg_table(spark, path).collect())
    assert got == [0, 2, 3, 5, 6, 8, 9, 11]  # part '1' gone entirely

    # CDC replay: deletes keyed on the absent column surface exactly
    ch = read_iceberg_changelog(spark, path).collect()
    dels = sorted(
        r.id for r in ch if r._change_type == "delete"
    )
    assert dels == [1, 4, 7, 10]
    assert all(
        r.part == "1" for r in ch if r._change_type == "delete"
    )
    # cumulative changelog state == snapshot
    ins = {r.id for r in ch if r._change_type == "insert"}
    assert sorted(ins - set(dels)) == got
