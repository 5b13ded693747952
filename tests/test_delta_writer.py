"""Foreign Delta APPEND writer (operators/delta_writer.py): commit
parity through the foreign reader, partitioned layout, CHECK
constraints, column mapping, writer-feature gating, and the
exclusive-create concurrency contract."""

from __future__ import annotations

import json
import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from data_lakehouse_project_spark.operators.delta_export import (
    export_delta_snapshot,
)
from data_lakehouse_project_spark.operators.delta_reader import (
    UnsupportedDeltaFeature,
    read_delta_snapshot,
    read_delta_table,
)
from data_lakehouse_project_spark.operators.delta_writer import (
    append_to_delta,
)
from data_lakehouse_project_spark.operators.txnlog import TxnTable


def _batch(spark, lo, hi, part="p0"):
    return spark.range(lo, hi).selectExpr(
        "id", f"'{part}' AS part", "id * 2.0 AS v"
    )


def _foreign(spark, tmp_path, name="f", lo=0, hi=4, **kw):
    t = TxnTable(str(tmp_path / f"src_{name}"))
    t.write(_batch(spark, lo, hi), mode="overwrite", **kw)
    out = str(tmp_path / f"ext_{name}")
    export_delta_snapshot(spark, t.path, out)
    return out


def test_append_round_trips_and_versions(spark, tmp_path):
    table = _foreign(spark, tmp_path)
    info = append_to_delta(spark, _batch(spark, 4, 7), table)
    assert info["version"] == 1 and info["rows"] == 3
    got = read_delta_table(spark, table)
    assert sorted(r.id for r in got.collect()) == list(range(7))

    # columns arrive in ANY order; values cast to the declared types
    shuffled = _batch(spark, 7, 8).select("v", "part", "id")
    info = append_to_delta(spark, shuffled, table)
    assert info["version"] == 2
    got = read_delta_table(spark, table)
    assert sorted(r.id for r in got.collect()) == list(range(8))
    # the new adds carry footer stats -> pruning skips them
    pruned = read_delta_table(spark, table, prune=[("id", ">=", 7)])
    assert sorted(r.id for r in pruned.collect()) == [7]

    # time travel: the pre-append snapshot is intact
    v0 = read_delta_table(spark, table, version=0)
    assert sorted(r.id for r in v0.collect()) == [0, 1, 2, 3]


def test_append_partitioned_layout(spark, tmp_path):
    t = TxnTable(str(tmp_path / "srcp"))
    t.write(
        _batch(spark, 0, 3, "a"), mode="overwrite",
        partition_by=["part"],
    )
    table = str(tmp_path / "extp")
    export_delta_snapshot(spark, t.path, table)

    df = _batch(spark, 3, 5, "b").union(_batch(spark, 5, 6, "c"))
    info = append_to_delta(spark, df, table)
    assert info["files"] >= 2  # one per appended partition value
    got = read_delta_table(spark, table)
    assert sorted((r.id, r.part) for r in got.collect()) == [
        (0, "a"), (1, "a"), (2, "a"), (3, "b"), (4, "b"), (5, "c"),
    ]
    pruned = read_delta_table(spark, table, prune=[("part", "=", "c")])
    assert sorted(r.id for r in pruned.collect()) == [5]

    # spec: data files do NOT contain partition columns
    snap = read_delta_snapshot(table)
    new = [f for f in snap.files if f["partition_values"].get("part")
           in ("b", "c")]
    assert new
    for f in new:
        cols = pq.read_schema(os.path.join(table, f["path"])).names
        assert "part" not in cols


def test_schema_mismatch_refused(spark, tmp_path):
    table = _foreign(spark, tmp_path, "s")
    with pytest.raises(ValueError, match="schema mismatch"):
        append_to_delta(
            spark, spark.range(3).selectExpr("id", "id AS zzz"), table
        )


def test_check_constraints_enforced(spark, tmp_path):
    t = TxnTable(str(tmp_path / "srcc"))
    t.write(_batch(spark, 0, 3), mode="overwrite")
    t.add_constraint(spark, "pos_v", "v >= 0")
    table = str(tmp_path / "extc")
    export_delta_snapshot(spark, t.path, table)

    bad = spark.range(1).selectExpr(
        "id + 100 AS id", "'x' AS part", "-5.0 AS v"
    )
    with pytest.raises(ValueError, match="pos_v"):
        append_to_delta(spark, bad, table)
    # the failed write left no data behind
    assert sorted(
        r.id for r in read_delta_table(spark, table).collect()
    ) == [0, 1, 2]
    ok = spark.range(1).selectExpr(
        "id + 100 AS id", "'x' AS part", "5.0 AS v"
    )
    info = append_to_delta(spark, ok, table)
    assert info["rows"] == 1


def test_append_column_mapped_name_mode(spark, tmp_path):
    from tests.test_delta_reader import _mapped_table

    table = _mapped_table(tmp_path)
    df = spark.createDataFrame(
        [(4, "d", "east")], "id long, vv string, p string"
    )
    info = append_to_delta(spark, df, table)
    assert info["version"] == 1
    got = read_delta_table(spark, table)
    assert sorted((r.id, r.vv, r.p) for r in got.collect()) == [
        (1, "a", "west"), (2, "b", "west"), (3, "c", "west"),
        (4, "d", "east"),
    ]
    # the written parquet carries PHYSICAL names; partitionValues are
    # keyed physically
    snap = read_delta_snapshot(table)
    new = [f for f in snap.files if f["path"] != "f0.parquet"]
    assert len(new) == 1
    cols = pq.read_schema(os.path.join(table, new[0]["path"])).names
    assert "col-id0001" in cols and "id" not in cols
    assert new[0]["partition_values"] == {"col-p0004": "east"}


def test_writer_feature_gates(spark, tmp_path):
    table = _foreign(spark, tmp_path, "g")
    log = os.path.join(table, "_delta_log", f"{0:020d}.json")
    lines = [json.loads(x) for x in open(log)]
    for a in lines:
        if "protocol" in a:
            a["protocol"] = {
                "minReaderVersion": 1,
                "minWriterVersion": 7,
                "writerFeatures": ["clustering", "domainMetadata"],
            }
    with open(log, "w") as fh:
        for a in lines:
            fh.write(json.dumps(a) + "\n")
    with pytest.raises(UnsupportedDeltaFeature, match="clustering"):
        append_to_delta(spark, _batch(spark, 4, 5), table)

    # a generated-column expression refuses regardless of version
    table2 = _foreign(spark, tmp_path, "g2")
    log2 = os.path.join(table2, "_delta_log", f"{0:020d}.json")
    lines = [json.loads(x) for x in open(log2)]
    for a in lines:
        if "metaData" in a:
            sch = json.loads(a["metaData"]["schemaString"])
            sch["fields"][2]["metadata"] = {
                "delta.generationExpression": "id * 2.0"
            }
            a["metaData"]["schemaString"] = json.dumps(sch)
    with open(log2, "w") as fh:
        for a in lines:
            fh.write(json.dumps(a) + "\n")
    with pytest.raises(UnsupportedDeltaFeature, match="generated"):
        append_to_delta(spark, _batch(spark, 4, 5), table2)


def test_concurrent_commit_collision_rolls_back(
    spark, tmp_path, monkeypatch
):
    """Race shape: another writer commits version 1 AFTER this append
    read its snapshot (simulated by pinning the snapshot at v0) — the
    exclusive-create commit must fail cleanly and roll the staged
    data files back."""
    from data_lakehouse_project_spark.operators import delta_writer

    table = _foreign(spark, tmp_path, "cc")
    stale = read_delta_snapshot(table)  # v0, read BEFORE the race
    append_to_delta(spark, _batch(spark, 4, 5), table)  # racer: v1
    files_before = {
        n for n in os.listdir(table) if n.endswith(".parquet")
    }
    monkeypatch.setattr(
        delta_writer, "read_delta_snapshot", lambda p: stale
    )
    with pytest.raises(ValueError, match="concurrent"):
        append_to_delta(spark, _batch(spark, 5, 6), table)
    # the orphaned data files were rolled back
    assert {
        n for n in os.listdir(table) if n.endswith(".parquet")
    } == files_before
    monkeypatch.undo()
    got = read_delta_table(spark, table)
    assert sorted(r.id for r in got.collect()) == [0, 1, 2, 3, 4]


def test_own_export_then_foreign_append_then_stream(spark, tmp_path):
    """The appended commit tails through the streaming source like any
    delta-spark append would."""
    from data_lakehouse_project_spark.sources.python_datasource import (
        register_python_datasources,
    )

    table = _foreign(spark, tmp_path, "st", lo=0, hi=2)
    append_to_delta(spark, _batch(spark, 2, 4), table)

    register_python_datasources(spark)
    got: list = []
    q = (
        spark.readStream.format("delta_stream")
        .option("path", table)
        .load()
        .writeStream.foreachBatch(
            lambda df, _b: got.extend(r["id"] for r in df.collect())
        )
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert sorted(got) == [0, 1, 2, 3]


# ---------------------------------------------------------------- DV
# deletes: delete_from_delta is the merge-on-read path modern
# delta-spark defaults to — remove(path, oldDV) + add(path, newDV),
# no data rewritten.


def test_delete_from_delta_dv_and_cdf_crosscheck(spark, tmp_path):
    from data_lakehouse_project_spark.operators.delta_cdf import (
        read_delta_changes,
    )
    from data_lakehouse_project_spark.operators.delta_writer import (
        delete_from_delta,
    )

    t = TxnTable(str(tmp_path / "src"))
    t.write(_batch(spark, 0, 8), mode="overwrite")
    t.delete_where(spark, "id = 1", dv=True)  # table already has DVs
    table = str(tmp_path / "ext")
    export_delta_snapshot(spark, t.path, table, dv_mode="spec")

    info = delete_from_delta(spark, table, "id IN (3, 6)")
    assert info["rows_deleted"] == 2 and info["files_updated"] >= 1
    got = read_delta_table(spark, table)
    assert sorted(r.id for r in got.collect()) == [0, 2, 4, 5, 7]

    # our own DV-diff CDF reconstructs exactly the deleted rows
    cdf = read_delta_changes(
        spark, table, starting_version=info["version"]
    )
    assert sorted(
        (r._change_type, r.id) for r in cdf.collect()
    ) == [("delete", 3), ("delete", 6)]

    # a second delete MERGES into the existing per-file DVs
    info2 = delete_from_delta(spark, table, "id = 0")
    assert info2["rows_deleted"] == 1
    got = read_delta_table(spark, table)
    assert sorted(r.id for r in got.collect()) == [2, 4, 5, 7]

    # deleting already-deleted rows is a no-op commit-wise
    info3 = delete_from_delta(spark, table, "id = 999")
    assert info3["rows_deleted"] == 0
    assert info3["version"] == info2["version"]  # nothing committed


def test_delete_from_delta_protocol_upgrade_gate(spark, tmp_path):
    from data_lakehouse_project_spark.operators.delta_writer import (
        delete_from_delta,
    )

    table = _foreign(spark, tmp_path, "up", lo=0, hi=6)  # reader v1
    with pytest.raises(UnsupportedDeltaFeature, match="deletionVectors"):
        delete_from_delta(spark, table, "id = 2")
    info = delete_from_delta(
        spark, table, "id = 2", allow_protocol_upgrade=True
    )
    assert info["rows_deleted"] == 1
    snap = read_delta_snapshot(table)
    assert "deletionVectors" in snap.protocol["readerFeatures"]
    assert sorted(
        r.id for r in read_delta_table(spark, table).collect()
    ) == [0, 1, 3, 4, 5]
    # the DV'd table still appends fine afterwards
    from data_lakehouse_project_spark.operators.delta_writer import (
        append_to_delta,
    )

    append_to_delta(spark, _batch(spark, 6, 7), table)
    assert sorted(
        r.id for r in read_delta_table(spark, table).collect()
    ) == [0, 1, 3, 4, 5, 6]


def test_delete_from_delta_partition_predicate(spark, tmp_path):
    from data_lakehouse_project_spark.operators.delta_writer import (
        delete_from_delta,
    )

    t = TxnTable(str(tmp_path / "srcp"))
    t.write(
        _batch(spark, 0, 3, "a").union(_batch(spark, 3, 5, "b")),
        mode="overwrite",
        partition_by=["part"],
    )
    table = str(tmp_path / "extp")
    export_delta_snapshot(spark, t.path, table)
    info = delete_from_delta(
        spark, table, "part = 'b' AND id >= 4",
        allow_protocol_upgrade=True,
    )
    assert info["rows_deleted"] == 1
    got = read_delta_table(spark, table)
    assert sorted((r.id, r.part) for r in got.collect()) == [
        (0, "a"), (1, "a"), (2, "a"), (3, "b"),
    ]


def test_delete_from_delta_append_only_refused(spark, tmp_path):
    from data_lakehouse_project_spark.operators.delta_writer import (
        delete_from_delta,
    )

    table = _foreign(spark, tmp_path, "ao")
    log = os.path.join(table, "_delta_log", f"{0:020d}.json")
    lines = [json.loads(x) for x in open(log)]
    for a in lines:
        if "metaData" in a:
            a["metaData"]["configuration"] = {"delta.appendOnly": "true"}
    with open(log, "w") as fh:
        for a in lines:
            fh.write(json.dumps(a) + "\n")
    with pytest.raises(UnsupportedDeltaFeature, match="appendOnly"):
        delete_from_delta(
            spark, table, "id = 1", allow_protocol_upgrade=True
        )


def test_update_from_delta_one_commit(spark, tmp_path):
    """update_from_delta: matched rows DV-deleted from their files and
    rewritten as new data files in ONE commit (delta-spark's
    DV-enabled UPDATE); CHECK constraints guard the rewritten rows."""
    from data_lakehouse_project_spark.operators.delta_writer import (
        update_from_delta,
    )

    t = TxnTable(str(tmp_path / "src"))
    t.write(_batch(spark, 0, 6), mode="overwrite")
    t.add_constraint(spark, "pos_v", "v >= 0")
    table = str(tmp_path / "ext")
    export_delta_snapshot(spark, t.path, table)

    info = update_from_delta(
        spark, table, "id >= 4", {"v": "v + 1000"},
        allow_protocol_upgrade=True,
    )
    assert info["rows_updated"] == 2 and info["version"] == 1
    got = {r.id: r.v for r in read_delta_table(spark, table).collect()}
    assert got == {0: 0.0, 1: 2.0, 2: 4.0, 3: 6.0,
                   4: 1008.0, 5: 1010.0}
    # exactly-one-commit: time travel to v0 shows the originals
    v0 = {r.id: r.v
          for r in read_delta_table(spark, table, version=0).collect()}
    assert v0[4] == 8.0 and v0[5] == 10.0

    # a SET that violates the CHECK constraint refuses BEFORE commit
    with pytest.raises(ValueError, match="pos_v"):
        update_from_delta(
            spark, table, "id = 0", {"v": "-1.0"},
            allow_protocol_upgrade=True,
        )
    assert read_delta_snapshot(table).version == 1

    # unknown SET column refuses; no-match is a no-op
    with pytest.raises(ValueError, match="unknown columns"):
        update_from_delta(spark, table, "id = 0", {"zzz": "1"})
    noop = update_from_delta(
        spark, table, "id = 999", {"v": "0.0"},
        allow_protocol_upgrade=True,
    )
    assert noop["rows_updated"] == 0 and noop["version"] == 1


def test_append_assigns_fresh_row_ids(spark, tmp_path):
    """Appends into a rowTracking table assign non-overlapping fresh
    baseRowIds from the delta.rowTracking watermark and advance it;
    DV deletes preserve the surviving rows' ids (stability)."""
    from tests.test_delta_reader import _row_tracked_table

    from data_lakehouse_project_spark.operators.delta_writer import (
        delete_from_delta,
    )

    table = _row_tracked_table(tmp_path)  # ids 0..4 over two files
    df = spark.createDataFrame([(10, "x"), (11, "y")],
                               "id long, v string")
    info = append_to_delta(spark, df, table)
    assert info["version"] == 1
    got = {r.id: r._row_id
           for r in read_delta_table(spark, table, row_ids=True)
           .collect()}
    # original files: ids 0..4; the append starts past the watermark
    # (no domain action in the fixture -> derived from the adds: 4)
    assert {got[i] for i in (0, 1, 2, 3, 4)} == {0, 1, 2, 3, 4}
    assert sorted((got[10], got[11])) == [5, 6]
    # the commit carries the advanced watermark domain
    log = os.path.join(table, "_delta_log", f"{1:020d}.json")
    domains = [json.loads(x)["domainMetadata"] for x in open(log)
               if '"domainMetadata"' in x]
    assert domains and json.loads(
        domains[0]["configuration"]
    )["rowIdHighWaterMark"] == 6

    # a second append continues from the domain watermark
    df2 = spark.createDataFrame([(12, "z")], "id long, v string")
    append_to_delta(spark, df2, table)
    got = {r.id: r._row_id
           for r in read_delta_table(spark, table, row_ids=True)
           .collect()}
    assert got[12] == 7
    assert len(set(got.values())) == len(got)  # all ids unique

    # DV delete: surviving rows keep their ids
    delete_from_delta(spark, table, "id = 10",
                      allow_protocol_upgrade=True)
    after = {r.id: r._row_id
             for r in read_delta_table(spark, table, row_ids=True)
             .collect()}
    assert 10 not in after
    assert after == {k: v for k, v in got.items() if k != 10}


def test_update_rowtracking_preserves_ids_for_rewrites(spark, tmp_path):
    """Row-id STABILITY through UPDATE/MERGE (round 9): matched
    rewrites materialize their original ids into the new files
    (generating + committing the materializedRowIdColumnName config
    on first use), so _row_id survives the rewrite while
    _row_commit_version moves to the new commit (last-modified
    semantics); merge-inserted rows still mint fresh ids."""
    from tests.test_delta_reader import _row_tracked_table

    from data_lakehouse_project_spark.operators.delta_reader import (
        read_delta_snapshot,
    )
    from data_lakehouse_project_spark.operators.delta_writer import (
        merge_into_delta,
        update_from_delta,
    )

    table = _row_tracked_table(tmp_path)
    before = {r.id: r._row_id
              for r in read_delta_table(spark, table, row_ids=True)
              .collect()}
    info = update_from_delta(
        spark, table, "id = 2", {"v": "'ZZ'"},
        allow_protocol_upgrade=True,
    )
    after = {r.id: (r._row_id, r.v, r._row_commit_version)
             for r in read_delta_table(spark, table, row_ids=True)
             .collect()}
    assert after[2][1] == "ZZ"
    # the rewritten row KEEPS its id; its commit version moves
    assert after[2][0] == before[2]
    assert after[2][2] == info["version"]
    for k, rid in before.items():
        if k != 2:
            assert after[k][0] == rid
    # the materialized column name was committed into the config
    snap = read_delta_snapshot(table)
    assert snap.configuration.get(
        "delta.rowTracking.materializedRowIdColumnName"
    )

    # MERGE: matched rewrite keeps its id, the insert mints a fresh one
    src = spark.createDataFrame(
        [(3, "mm"), (50, "nn")], "id long, v string"
    )
    merge_into_delta(
        spark, table, src, "t.id = s.id",
        when_matched_update={"v": "s.v"},
        allow_protocol_upgrade=True,
    )
    final = {r.id: r._row_id
             for r in read_delta_table(spark, table, row_ids=True)
             .collect()}
    assert final[3] == before[3]
    assert final[50] > max(before.values())
    assert len(set(final.values())) == len(final)  # ids stay unique

    # a second update composes (reads the materialized id back)
    update_from_delta(
        spark, table, "id = 2", {"v": "'Z2'"},
        allow_protocol_upgrade=True,
    )
    again = {r.id: r._row_id
             for r in read_delta_table(spark, table, row_ids=True)
             .collect()}
    assert again[2] == before[2]


def test_optimize_delta_compacts_and_applies_dvs(spark, tmp_path):
    """optimize_delta: multi-file partitions compact into fresh files
    with DVs APPLIED; every remove/add is dataChange=false, so CDF
    reports no changes and a plain stream neither refuses nor
    re-ships; vacuum then retires the superseded files."""
    import time as _time

    from data_lakehouse_project_spark.operators.delta_cdf import (
        read_delta_changes,
    )
    from data_lakehouse_project_spark.operators.delta_writer import (
        delete_from_delta,
        optimize_delta,
    )
    from data_lakehouse_project_spark.operators.foreign_maintenance import (
        vacuum_delta,
    )
    from data_lakehouse_project_spark.sources.python_datasource import (
        register_python_datasources,
    )

    table = _foreign(spark, tmp_path, "opt", lo=0, hi=4)
    append_to_delta(spark, _batch(spark, 4, 6), table)
    append_to_delta(spark, _batch(spark, 6, 8), table)
    delete_from_delta(spark, table, "id = 5",
                      allow_protocol_upgrade=True)
    before = read_delta_snapshot(table)
    assert len(before.files) >= 3
    assert any(f.get("foreign_dv") for f in before.files)

    info = optimize_delta(spark, table)
    assert info["files_removed"] >= 3 and info["files_added"] >= 1
    snap = read_delta_snapshot(table)
    assert len(snap.files) < len(before.files)
    assert not any(f.get("foreign_dv") for f in snap.files)
    got = read_delta_table(spark, table)
    assert sorted(r.id for r in got.collect()) == [0, 1, 2, 3, 4, 6, 7]

    # CDF across the optimize: zero change rows
    cdf = read_delta_changes(
        spark, table, starting_version=info["version"]
    )
    assert cdf.count() == 0

    # a plain stream STARTING AT the optimize commit neither refuses
    # nor re-ships compacted rows (dataChange=false actions are
    # no-ops; the earlier DV DELETE commit would rightly refuse a
    # full-history tail without ignoreChanges)
    register_python_datasources(spark)
    got2: list = []
    q = (
        spark.readStream.format("delta_stream")
        .option("path", table)
        .option("startingVersion", str(info["version"]))
        .load()
        .writeStream.foreachBatch(
            lambda b, _i: got2.extend(r["id"] for r in b.collect())
        )
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert got2 == []  # compaction ships nothing

    # vacuum retires the superseded files once aged
    old = _time.time() - 30 * 24 * 3600
    for root, dirs, files in os.walk(table):
        if "_delta_log" in root:
            continue
        for n in files:
            os.utime(os.path.join(root, n), (old, old))
    done = vacuum_delta(table, dry_run=False)
    assert len(done["deleted"]) >= info["files_removed"]
    got = read_delta_table(spark, table)
    assert sorted(r.id for r in got.collect()) == [0, 1, 2, 3, 4, 6, 7]


def test_optimize_delta_preserves_row_ids(spark, tmp_path):
    """OPTIMIZE on a rowTracking table MATERIALIZES each row's id /
    commit version into the compacted files (generating + committing
    the delta.rowTracking.materialized*ColumnName config on first
    use), so ids survive the rewrite; CDF stays empty and a stream
    starting at the optimize commit ships nothing."""
    from tests.test_delta_reader import _row_tracked_table

    from data_lakehouse_project_spark.operators.delta_cdf import (
        read_delta_changes,
    )
    from data_lakehouse_project_spark.operators.delta_writer import (
        delete_from_delta,
        optimize_delta,
    )
    from data_lakehouse_project_spark.sources.python_datasource import (
        register_python_datasources,
    )

    table = _row_tracked_table(tmp_path)  # ids 0..4, two files
    before = {
        r.id: (r._row_id, r._row_commit_version)
        for r in read_delta_table(spark, table, row_ids=True).collect()
    }
    info = optimize_delta(spark, table)
    assert info["files_added"] >= 1
    after = {
        r.id: (r._row_id, r._row_commit_version)
        for r in read_delta_table(spark, table, row_ids=True).collect()
    }
    assert after == before  # ids AND commit versions stable

    # the materialized column names were committed into the config
    snap = read_delta_snapshot(table)
    mat = snap.configuration.get(
        "delta.rowTracking.materializedRowIdColumnName"
    )
    assert mat
    f = [x for x in snap.files if x["path"].startswith("part-")][0]
    cols = pq.read_schema(os.path.join(table, f["path"])).names
    assert mat in cols

    # CDF-empty + stream-no-op across the optimize commit
    assert read_delta_changes(
        spark, table, starting_version=info["version"]
    ).count() == 0
    register_python_datasources(spark)
    got: list = []
    q = (
        spark.readStream.format("delta_stream")
        .option("path", table)
        .option("startingVersion", str(info["version"]))
        .load()
        .writeStream.foreachBatch(
            lambda b, _i: got.extend(r["id"] for r in b.collect())
        )
        .option("checkpointLocation", str(tmp_path / "ck_rt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert got == []

    # a later DV delete + second optimize still keeps survivor ids
    delete_from_delta(spark, table, "id = 1",
                      allow_protocol_upgrade=True)
    optimize_delta(spark, table)
    final = {
        r.id: (r._row_id, r._row_commit_version)
        for r in read_delta_table(spark, table, row_ids=True).collect()
    }
    assert final == {k: v for k, v in before.items() if k != 1}


def test_optimize_preserves_materialized_row_id_overrides(
    spark, tmp_path
):
    """A file whose materialized row-id column already OVERRIDES the
    fresh formula (spec: materialized wins) keeps the override through
    compaction."""
    from tests.test_delta_reader import _row_tracked_table

    from data_lakehouse_project_spark.operators.delta_writer import (
        optimize_delta,
    )

    table = _row_tracked_table(tmp_path, materialized=True)
    before = {
        r.id: r._row_id
        for r in read_delta_table(spark, table, row_ids=True).collect()
    }
    assert before[3] == 100  # the fixture's materialized override
    optimize_delta(spark, table)
    after = {
        r.id: r._row_id
        for r in read_delta_table(spark, table, row_ids=True).collect()
    }
    assert after == before


def test_append_merge_schema(spark, tmp_path):
    """merge_schema=True: new DataFrame columns join the table schema
    as nullable fields in the SAME commit; old rows read them null;
    time travel shows the old schema."""
    from data_lakehouse_project_spark.operators.delta_writer import (
        append_to_delta,
    )

    table = _foreign(spark, tmp_path, "ms")
    df = spark.range(100, 102).selectExpr(
        "id", "'x' AS part", "1.0 AS v", "'tag-' || id AS note"
    )
    with pytest.raises(ValueError, match="schema mismatch"):
        append_to_delta(spark, df, table)
    info = append_to_delta(spark, df, table, merge_schema=True)
    assert info["rows"] == 2
    got = read_delta_table(spark, table)
    assert "note" in got.columns
    rows = {r.id: r.note for r in got.collect()}
    assert rows[100] == "tag-100" and rows[0] is None
    # the evolved schema persists for plain appends
    df2 = spark.range(102, 103).selectExpr(
        "id", "'x' AS part", "1.0 AS v", "'z' AS note"
    )
    append_to_delta(spark, df2, table)
    # time travel: version 0 has the OLD schema
    v0 = read_delta_table(spark, table, version=0)
    assert "note" not in v0.columns


def test_optimize_zorder_narrows_file_ranges(spark, tmp_path):
    """ZORDER BY: after clustering on (id, v2), per-file id ranges are
    disjoint-ish, so a stats-prune touches fewer files than the
    unclustered layout."""
    from data_lakehouse_project_spark.operators.delta_writer import (
        optimize_delta,
    )
    from data_lakehouse_project_spark.operators.txnlog import (
        _file_may_match,
    )

    t = TxnTable(str(tmp_path / "srcz"))
    # interleaved writes: every file spans nearly the full id range
    for k in range(4):
        t.write(
            spark.range(0, 400).selectExpr(
                f"id * 4 + {k} AS id", "'p' AS part",
                "CAST(id % 7 AS DOUBLE) AS v",
            ).coalesce(1),
            mode="append" if k else "overwrite",
        )
    table = str(tmp_path / "extz")
    export_delta_snapshot(spark, t.path, table)

    def _files_matching(prune):
        snap = read_delta_snapshot(table)
        return sum(1 for f in snap.files if _file_may_match(f, prune))

    before = _files_matching([("id", "<", 100)])
    assert before == 4  # every unclustered file may match

    info = optimize_delta(
        spark, table, target_size_bytes=4 << 10, zorder_by=["id", "v"]
    )
    assert info["files_added"] >= 2
    after = _files_matching([("id", "<", 100)])
    assert after < before  # clustering narrowed the ranges
    got = read_delta_table(spark, table)
    assert got.count() == 1600
    assert sorted(
        r.id for r in read_delta_table(
            spark, table, prune=[("id", "<", 10)]
        ).collect()
    ) == list(range(10))

    with pytest.raises(ValueError, match="zorder_by"):
        optimize_delta(spark, table, zorder_by=["zzz"])


def test_merge_into_delta_upsert(spark, tmp_path):
    """MERGE INTO a foreign table in one commit: matched rows update
    via DV delete + rewrite, unmatched source rows insert; ambiguity
    and constraint violations fail BEFORE commit."""
    from data_lakehouse_project_spark.operators.delta_writer import (
        merge_into_delta,
    )

    t = TxnTable(str(tmp_path / "src"))
    t.write(_batch(spark, 0, 4), mode="overwrite")
    t.add_constraint(spark, "pos_v", "v >= 0")
    table = str(tmp_path / "ext")
    export_delta_snapshot(spark, t.path, table)

    source = spark.createDataFrame(
        [(2, "p0", 99.0), (3, "p0", 98.0), (10, "p0", 97.0)],
        "id long, part string, v double",
    )
    info = merge_into_delta(
        spark, table, source, "t.id = s.id",
        when_matched_update={"v": "s.v"},
        allow_protocol_upgrade=True,
    )
    assert info == {
        "version": 1, "rows_updated": 2, "rows_deleted": 0,
        "rows_inserted": 1,
    }
    got = {r.id: r.v for r in read_delta_table(spark, table).collect()}
    assert got == {0: 0.0, 1: 2.0, 2: 99.0, 3: 98.0, 10: 97.0}
    # one commit: v0 time travel intact
    v0 = {r.id: r.v
          for r in read_delta_table(spark, table, version=0).collect()}
    assert v0 == {0: 0.0, 1: 2.0, 2: 4.0, 3: 6.0}

    # idempotent re-merge of identical source: updates re-apply, no
    # inserts (10 now exists)
    info2 = merge_into_delta(
        spark, table, source, "t.id = s.id",
        when_matched_update={"v": "s.v"},
        allow_protocol_upgrade=True,
    )
    assert info2["rows_inserted"] == 0 and info2["rows_updated"] == 3
    assert read_delta_table(spark, table).count() == 5

    # ambiguity: two source rows hit one target row
    dup_src = spark.createDataFrame(
        [(2, "p0", 1.0), (2, "p0", 2.0)],
        "id long, part string, v double",
    )
    with pytest.raises(ValueError, match="ambiguous"):
        merge_into_delta(
            spark, table, dup_src, "t.id = s.id",
            when_matched_update={"v": "s.v"},
            allow_protocol_upgrade=True,
        )

    # constraint violation in the rewritten rows fails pre-commit
    bad_src = spark.createDataFrame(
        [(0, "p0", -5.0)], "id long, part string, v double"
    )
    with pytest.raises(ValueError, match="pos_v"):
        merge_into_delta(
            spark, table, bad_src, "t.id = s.id",
            when_matched_update={"v": "s.v"},
            allow_protocol_upgrade=True,
        )
    assert read_delta_snapshot(table).version == info2["version"]


def test_merge_into_delta_delete_and_insert_only(spark, tmp_path):
    from data_lakehouse_project_spark.operators.delta_writer import (
        merge_into_delta,
    )

    table = _foreign(spark, tmp_path, "md", lo=0, hi=5)
    # matched-delete clause: tombstone by source key
    source = spark.createDataFrame(
        [(1, ), (3, ), (77, )], "id long"
    )
    info = merge_into_delta(
        spark, table, source, "t.id = s.id",
        when_matched_delete=True,
        when_not_matched_insert=False,
        allow_protocol_upgrade=True,
    )
    assert info["rows_deleted"] == 2 and info["rows_inserted"] == 0
    assert sorted(
        r.id for r in read_delta_table(spark, table).collect()
    ) == [0, 2, 4]

    # insert-only merge needs NO deletionVectors feature: works on a
    # reader-v1 table without the protocol-upgrade opt-in
    table2 = _foreign(spark, tmp_path, "mi", lo=0, hi=2)
    src2 = _batch(spark, 1, 4)  # 1 exists, 2..3 are new
    info = merge_into_delta(
        spark, table2, src2, "t.id = s.id",
        when_matched_update=None,
        when_not_matched_insert=True,
    )
    assert info["rows_inserted"] == 2 and info["rows_updated"] == 0
    assert sorted(
        r.id for r in read_delta_table(spark, table2).collect()
    ) == [0, 1, 2, 3]
    snap = read_delta_snapshot(table2)
    assert snap.protocol["minReaderVersion"] == 1  # untouched


def test_id_mapping_nested_struct_dml(spark, tmp_path):
    """Round 11 (README limitation #3 lifted): id-mode DML on a
    NESTED-struct schema stamps parquet field ids at every nesting
    level via the positional struct cast, and the id-mode reader
    resolves the rewritten file by field id — values hash-equal, no
    refusal."""
    import pyarrow as pa
    import pyarrow.parquet as _pq

    from data_lakehouse_project_spark.operators.delta_reader import (
        read_delta_snapshot,
    )
    from tests.test_delta_reader import _commit, _info

    nested_schema = json.dumps(
        {
            "type": "struct",
            "fields": [
                {
                    "name": "id", "type": "long", "nullable": True,
                    "metadata": {
                        "delta.columnMapping.id": 1,
                        "delta.columnMapping.physicalName": "col-1",
                    },
                },
                {
                    "name": "s",
                    "type": {
                        "type": "struct",
                        "fields": [
                            {
                                "name": "a", "type": "long",
                                "nullable": True,
                                "metadata": {
                                    "delta.columnMapping.id": 3,
                                    "delta.columnMapping."
                                    "physicalName": "col-3",
                                },
                            },
                            {
                                "name": "b", "type": "string",
                                "nullable": True,
                                "metadata": {
                                    "delta.columnMapping.id": 4,
                                    "delta.columnMapping."
                                    "physicalName": "col-4",
                                },
                            },
                        ],
                    },
                    "nullable": True,
                    "metadata": {
                        "delta.columnMapping.id": 2,
                        "delta.columnMapping.physicalName": "col-2",
                    },
                },
            ],
        }
    )
    table = str(tmp_path / "idnest")
    os.makedirs(table)
    inner = pa.struct(
        [
            pa.field("col-3", pa.int64(),
                     metadata={b"PARQUET:field_id": b"3"}),
            pa.field("col-4", pa.string(),
                     metadata={b"PARQUET:field_id": b"4"}),
        ]
    )
    sch = pa.schema(
        [
            pa.field("col-1", pa.int64(),
                     metadata={b"PARQUET:field_id": b"1"}),
            pa.field("col-2", inner,
                     metadata={b"PARQUET:field_id": b"2"}),
        ]
    )
    fpath = os.path.join(table, "f0.parquet")
    _pq.write_table(
        pa.table(
            {
                "col-1": pa.array([1, 2, 3], pa.int64()),
                "col-2": pa.array(
                    [(10, "x"), (20, "y"), (30, "z")], inner
                ),
            },
            schema=sch,
        ),
        fpath,
    )
    _commit(
        table, 0,
        [
            {"protocol": {"minReaderVersion": 2,
                          "minWriterVersion": 5}},
            {
                "metaData": {
                    "id": "idnest-0001",
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": nested_schema,
                    "partitionColumns": [],
                    "configuration": {
                        "delta.columnMapping.mode": "id",
                        "delta.columnMapping.maxColumnId": "4",
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
                }
            },
            _info(1700000001000),
        ],
    )
    from data_lakehouse_project_spark.operators.delta_writer import (
        delete_from_delta,
        update_from_delta,
    )

    # DML on the nested schema: delete by nested predicate, update a
    # nested member — both rewrite files that MUST carry nested ids
    info = delete_from_delta(
        spark, table, "s.a = 20", allow_protocol_upgrade=True
    )
    assert info["rows_deleted"] == 1
    update_from_delta(
        spark, table, "id = 3",
        {"s": "named_struct('a', s.a + 100, 'b', upper(s.b))"},
        allow_protocol_upgrade=True,
    )
    got = sorted(
        (r.id, r.s.a, r.s.b)
        for r in read_delta_table(spark, table).collect()
    )
    assert got == [(1, 10, "x"), (3, 130, "Z")]
    # every rewritten parquet carries field ids at BOTH levels with
    # physical names (the delta-spark id-mode write shape)
    snap = read_delta_snapshot(table)
    new_files = [f for f in snap.files
                 if f["path"] != "f0.parquet"]
    assert new_files
    for f in new_files:
        fsch = _pq.read_schema(os.path.join(table, f["path"]))
        top = {
            fsch.field(i).name: (fsch.field(i).metadata or {}).get(
                b"PARQUET:field_id"
            )
            for i in range(len(fsch.names))
        }
        assert top == {"col-1": b"1", "col-2": b"2"}
        st = fsch.field("col-2").type
        sub = {
            st.field(i).name: (st.field(i).metadata or {}).get(
                b"PARQUET:field_id"
            )
            for i in range(st.num_fields)
        }
        assert sub == {"col-3": b"3", "col-4": b"4"}
