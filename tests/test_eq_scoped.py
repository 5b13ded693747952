"""PARTITION-SCOPED equality deletes (round 11, VERDICT r10 items
2+3): when every partition source is among the keys, the writer emits
per-partition delete files under the TABLE's spec (Flink's
upsert-sink shape) instead of the global unpartitioned route; the
reader scopes each delete file to its own (spec, partition) per the
Iceberg spec and prunes inapplicable deletes driver-side; CDC replay
substitutes manifest partition constants for key columns physically
absent from the parquet.

Reference semantics: Iceberg spec "Scan Planning" — delete files
stored with a partition apply only to data files of the same
partition; unpartitioned-spec delete files are global.
"""

from __future__ import annotations

import pytest

from data_lakehouse_project_spark.operators.iceberg_export import (
    export_iceberg_metadata,
)
from data_lakehouse_project_spark.operators.iceberg_reader import (
    avro_records,
    load_iceberg_metadata,
    read_iceberg_changelog,
    read_iceberg_table,
)
from data_lakehouse_project_spark.operators.iceberg_writer import (
    upsert_into_iceberg,
    write_equality_deletes,
)
from data_lakehouse_project_spark.operators.txnlog import TxnTable


def _rows(df):
    return sorted(map(tuple, df.collect()))


def _delete_entries(spark, path):
    """All content=2 manifest entries of the CURRENT snapshot, with
    their manifest's declared spec id."""
    md = load_iceberg_metadata(path)
    import os

    snap = next(
        s
        for s in md["snapshots"]
        if s["snapshot-id"] == md["current-snapshot-id"]
    )
    mlist = snap["manifest-list"]
    if not os.path.isabs(mlist):
        mlist = os.path.join(path, mlist)
    out = []
    for m, _ in [avro_records(spark, mlist)]:
        for mf in m:
            mp = mf["manifest_path"]
            if not os.path.isabs(mp):
                mp = os.path.join(path, mp)
            entries, _ = avro_records(spark, mp)
            for e in entries:
                if e["data_file"].get("content") == 2:
                    out.append(
                        (mf.get("partition_spec_id"), e["data_file"])
                    )
    return out


def test_scoped_upsert_bucket_partitioned(spark, tmp_path):
    """bucket(4,id)-partitioned upsert keyed on id: the delete
    manifest carries PARTITION TUPLES under the table's spec (not the
    global unpartitioned route), the snapshot replaces exactly the
    matched keys, and the changelog's cumulative state equals the
    snapshot."""
    path = str(tmp_path / "b4")
    t = TxnTable(path)
    t.write(
        spark.range(0, 40).selectExpr("id", "CAST(id AS DOUBLE) AS v"),
        mode="overwrite",
        partition_by=["bucket(4, id)"],
    )
    export_iceberg_metadata(t, spark)
    src = spark.createDataFrame(
        [(3, 333.0), (17, 177.0), (100, 100.0)], "id long, v double"
    )
    res = upsert_into_iceberg(spark, path, src, ["id"])
    assert res["delete_files"] >= 1

    dels = _delete_entries(spark, path)
    assert dels, "no equality-delete entries found"
    md = load_iceberg_metadata(path)
    default_spec = md.get("default-spec-id", 0)
    for spec_id, df_ in dels:
        # scoped: the delete manifest declares the TABLE's spec and
        # each entry carries a bucket tuple value
        assert spec_id == default_spec
        part = df_.get("partition") or {}
        assert part and all(v is not None for v in part.values())
    # keys 3 and 17 hash to buckets {1, 2} (spec murmur3) — the
    # delete files cover EXACTLY the buckets of the touched keys
    from data_lakehouse_project_spark.functions.ice_transforms import (
        transform_literal,
    )

    want_buckets = {
        transform_literal("bucket[4]", k, "long") for k in (3, 17, 100)
    }
    got_buckets = {
        list((df_.get("partition") or {}).values())[0]
        for _, df_ in dels
    }
    assert got_buckets == want_buckets

    got = _rows(read_iceberg_table(spark, path))
    want = sorted(
        [(i, float(i)) for i in range(40) if i not in (3, 17)]
        + [(3, 333.0), (17, 177.0), (100, 100.0)]
    )
    assert got == want

    # changelog replay: cumulative inserts minus deletes == snapshot
    ch = read_iceberg_changelog(spark, path).collect()
    state: dict = {}
    for r in sorted(ch, key=lambda r: (r._snapshot_id,
                                       r._change_type == "insert")):
        if r._change_type == "insert":
            state[r.id] = r.v
        else:
            state.pop(r.id, None)
    assert sorted(state.items()) == want


def test_scoped_delete_prunes_untouched_partitions(spark, tmp_path):
    """A scoped delete touching only partition '1': a pruned read of
    partition '0' skips equality-delete application entirely (no
    anti-join in the plan; the arrow fast path re-enables), while the
    unpruned read still applies it."""
    import os as _os

    path = str(tmp_path / "pp")
    t = TxnTable(path)
    t.write(
        spark.range(0, 30).selectExpr(
            "id", "CAST(id % 3 AS STRING) AS part",
            "CAST(id AS DOUBLE) AS v",
        ),
        mode="overwrite",
        partition_by=["part"],
    )
    export_iceberg_metadata(t, spark)
    res = write_equality_deletes(
        spark, path,
        spark.createDataFrame(
            [(1, "1"), (4, "1")], "id long, part string"
        ),
        ["id", "part"],
    )
    assert res["delete_files"] >= 1
    # scoped manifest: tuples present
    for spec_id, df_ in _delete_entries(spark, path):
        assert (df_.get("partition") or {}) != {}

    full = read_iceberg_table(spark, path)
    assert full.count() == 28
    assert "LeftAnti" in full._jdf.queryExecution().toString()

    pruned = read_iceberg_table(spark, path, prune=[("part", "=", "0")])
    plan = pruned._jdf.queryExecution().toString()
    assert "LeftAnti" not in plan  # delete application skipped
    assert pruned.count() == 10

    # fully-pruned deletes re-enable the arrow fast path
    _os.environ["SPARK_GRAFT_ARROW_SCAN_FILES"] = "1"
    try:
        fast = read_iceberg_table(
            spark, path, prune=[("part", "=", "0")]
        )
        assert "graft_arrow_scan" in (
            fast._jdf.queryExecution().toString()
        )
        assert fast.count() == 10
    finally:
        _os.environ.pop("SPARK_GRAFT_ARROW_SCAN_FILES", None)


def test_reader_honors_foreign_partition_scope(spark, tmp_path):
    """A partition-scoped delete file whose KEYS would match rows in
    other partitions (the shape a foreign engine can produce) kills
    ONLY its own partition — fabricated via the writer internals with
    a doctored tuple; batch changelog agrees with the snapshot."""
    import time as _time

    from data_lakehouse_project_spark.operators.iceberg_writer import (
        _commit_snapshot,
        _current_schema,
        _latest_metadata_file,
        _resolve_part_fields,
        _stage_eq_delete_files,
        _write_eq_delete_manifest,
    )

    path = str(tmp_path / "scope")
    t = TxnTable(path)
    # v repeats across partitions: v = id % 5
    t.write(
        spark.range(0, 30).selectExpr(
            "id", "CAST(id % 3 AS STRING) AS part",
            "CAST(id % 5 AS DOUBLE) AS v",
        ),
        mode="overwrite",
        partition_by=["part"],
    )
    export_iceberg_metadata(t, spark)
    import os

    path = os.path.abspath(path)
    md_file = _latest_metadata_file(path)
    md = load_iceberg_metadata(path)
    schema_fields = _current_schema(md)["fields"]
    part_fields = _resolve_part_fields(md, schema_fields)
    seq = int(md.get("last-sequence-number", 0)) + 1
    sid = max(s["snapshot-id"] for s in md["snapshots"]) + 1
    keys = spark.createDataFrame([(2.0,)], "v double")
    files, _ = _stage_eq_delete_files(
        spark, md, schema_fields, keys, ["v"], path, sid
    )
    # doctor: scope the delete to partition part='1' ONLY
    files = [(p, rc, {"part": "1"}) for p, rc, _ in files]
    row = _write_eq_delete_manifest(
        spark, md, schema_fields, files, ["v"], path, sid, seq,
        spec_id=md.get("default-spec-id", 0), part_fields=part_fields,
    )
    _commit_snapshot(
        spark, path, md, md_file, manifest_row=[row],
        snapshot_id=sid, seq=seq, ts=int(_time.time() * 1000),
        operation="delete", summary_extra={},
        rollback_paths=[p for p, *_ in files]
        + [row["manifest_path"]],
    )
    got = _rows(read_iceberg_table(spark, path).select("id"))
    # v==2.0 rows: ids 2,7,12,17,22,27; of those only part '1'
    # (id%3==1): 7, 22 die — the rest SURVIVE (scope honored)
    dead = {7, 22}
    assert got == sorted((i,) for i in range(30) if i not in dead)

    ch = read_iceberg_changelog(spark, path).collect()
    dels = sorted(r.id for r in ch if r._change_type == "delete")
    assert dels == sorted(dead)


def test_identity_partition_key_upsert_cdc(spark, tmp_path):
    """README limitation #2 lifted: upsert keyed on the IDENTITY
    partition column (stored only as manifest constants, physically
    absent from the parquet) — batch changelog AND streaming CDC
    replay it, hash-equal to the snapshot diff."""
    path = str(tmp_path / "idk")
    t = TxnTable(path)
    t.write(
        spark.range(0, 4).selectExpr(
            "CAST(id AS STRING) AS tenant", "id * 10.0 AS v"
        ),
        mode="overwrite",
        partition_by=["tenant"],  # tenant absent from parquet
    )
    export_iceberg_metadata(t, spark)
    before = {r.tenant: r.v
              for r in read_iceberg_table(spark, path).collect()}
    src = spark.createDataFrame(
        [("2", 222.0), ("9", 99.0)], "tenant string, v double"
    )
    upsert_into_iceberg(spark, path, src, ["tenant"])
    after = {r.tenant: r.v
             for r in read_iceberg_table(spark, path).collect()}
    assert after == {"0": 0.0, "1": 10.0, "2": 222.0, "3": 30.0,
                     "9": 99.0}

    # batch changelog: the upsert snapshot's diff == snapshot diff
    ch = read_iceberg_changelog(spark, path).collect()
    last_sid = max(r._snapshot_id for r in ch)
    diff = sorted(
        (r._change_type, r.tenant, r.v)
        for r in ch
        if r._snapshot_id == last_sid
    )
    assert diff == [
        ("delete", "2", before["2"]),
        ("insert", "2", 222.0),
        ("insert", "9", 99.0),
    ]

    # streaming CDC: identical rows
    from data_lakehouse_project_spark.sources.python_datasource import (
        register_python_datasources,
    )

    register_python_datasources(spark)
    sink: list = []

    def _each(df, _bid):
        sink.extend(
            (r["_snapshot_id"], r["_change_type"], r["tenant"], r["v"])
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
        (r._snapshot_id, r._change_type, r.tenant, r.v) for r in ch
    )
    assert sorted(sink) == want


def test_global_route_kept_when_keys_miss_partition_source(
    spark, tmp_path
):
    """Keys NOT covering the partition source keep the spec's GLOBAL
    unpartitioned route (delete manifest under an unpartitioned
    spec) — and apply across all partitions."""
    path = str(tmp_path / "glob")
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
        spark.createDataFrame([(4,), (8,)], "id long"), ["id"],
    )
    md = load_iceberg_metadata(path)
    unpart = [
        int(sp["spec-id"])
        for sp in md["partition-specs"]
        if not sp.get("fields")
    ]
    assert unpart, "global route must append an unpartitioned spec"
    for spec_id, df_ in _delete_entries(spark, path):
        assert spec_id == unpart[0]
        assert (df_.get("partition") or {}) == {}
    got = sorted(
        r.id for r in read_iceberg_table(spark, path).collect()
    )
    assert got == [0, 1, 2, 3, 5, 6, 7, 9, 10, 11]


def test_incremental_scan_delegates_over_mixed_history(
    spark, tmp_path
):
    """read_iceberg_changes across a mixed append/delete/upsert
    history equals the changelog's cumulative inserts (round 11 —
    this used to refuse at the first non-append snapshot)."""
    from data_lakehouse_project_spark.operators.iceberg_reader import (
        read_iceberg_changes,
    )
    from data_lakehouse_project_spark.operators.iceberg_writer import (
        append_to_iceberg,
        delete_from_iceberg,
    )

    path = str(tmp_path / "mix")
    t = TxnTable(path)
    t.write(
        spark.range(0, 8).selectExpr("id", "CAST(id AS DOUBLE) AS v"),
        mode="overwrite",
    )
    export_iceberg_metadata(t, spark)                    # snap 1
    delete_from_iceberg(spark, path, "id % 3 = 1")       # snap 2
    append_to_iceberg(                                   # snap 3
        spark,
        spark.range(20, 23).selectExpr(
            "id", "CAST(id AS DOUBLE) AS v"
        ),
        path,
    )
    upsert_into_iceberg(                                 # snap 4
        spark, path,
        spark.createDataFrame(
            [(2, 222.0), (50, 50.0)], "id long, v double"
        ),
        ["id"],
    )
    inc = read_iceberg_changes(spark, path)
    ch = read_iceberg_changelog(spark, path)
    want = sorted(
        map(
            tuple,
            ch.where("_change_type = 'insert'")
            .drop("_change_type")
            .collect(),
        )
    )
    got = sorted(map(tuple, inc.collect()))
    assert got == want
    assert {c for c in inc.columns} == {
        "id", "v", "_snapshot_id", "_committed_at"
    }
    # sub-range (snap2, snap4]: the upsert's post-image + snap3 adds
    sids = sorted(r[0] for r in ch.select("_snapshot_id")
                  .distinct().collect())
    inc2 = read_iceberg_changes(spark, path, from_snapshot_id=sids[1])
    ids2 = sorted(r.id for r in inc2.collect())
    assert ids2 == [2, 20, 21, 22, 50]


def test_arrow_fast_path_applies_equality_deletes(
    spark, tmp_path, monkeypatch
):
    """Round 11: live equality deletes no longer force the JVM path —
    the arrow fast path emits path keys and the same anti-join runs
    on top.  Forced-gate fast path == JVM path on an upserted
    partitioned table, including a columns= projection that drops the
    key columns."""
    import os as _os

    path = str(tmp_path / "aeq")
    t = TxnTable(path)
    t.write(
        spark.range(0, 60).selectExpr(
            "id", "CAST(id % 3 AS STRING) AS part",
            "CAST(id AS DOUBLE) AS v",
        ),
        mode="overwrite",
        partition_by=["part"],
    )
    export_iceberg_metadata(t, spark)
    upsert_into_iceberg(
        spark, path,
        spark.createDataFrame(
            [(5, "2", 555.0), (100, "1", 1.0)],
            "id long, part string, v double",
        ),
        ["id", "part"],
    )
    write_equality_deletes(
        spark, path,
        spark.createDataFrame([(7,)], "id long"), ["id"],
    )

    def q():
        return read_iceberg_table(spark, path)

    _os.environ["SPARK_GRAFT_ARROW_SCAN_FILES"] = "1"
    try:
        fast = q()
        plan = fast._jdf.queryExecution().toString()
        assert "graft_arrow_scan" in plan
        fast_rows = _rows(fast)
        # columns= drops the key columns; the scan keeps them
        # internally for the anti-join and projects after
        narrow = read_iceberg_table(spark, path, columns=["v"])
        assert narrow.columns == ["v"]
        narrow_sum = narrow.agg({"v": "sum"}).collect()[0][0]
    finally:
        _os.environ.pop("SPARK_GRAFT_ARROW_SCAN_FILES", None)
    slow = q()
    assert "graft_arrow_scan" not in (
        slow._jdf.queryExecution().toString()
    )
    assert fast_rows == _rows(slow)
    assert abs(
        narrow_sum
        - slow.agg({"v": "sum"}).collect()[0][0]
    ) < 1e-9


def test_dml_on_upserted_table(spark, tmp_path):
    """Round 11: DML works on tables carrying live EQUALITY deletes
    (the streaming-CDC shape) — the keyed scan applies the same
    sequence-ruled anti-join the reader uses, so already-replaced
    rows never re-match; DELETE/UPDATE/MERGE land exact."""
    from data_lakehouse_project_spark.operators.iceberg_writer import (
        delete_from_iceberg,
        merge_into_iceberg,
        update_from_iceberg,
    )

    path = str(tmp_path / "dmlup")
    t = TxnTable(path)
    t.write(
        spark.range(0, 20).selectExpr(
            "id", "CAST(id AS DOUBLE) AS v"
        ),
        mode="overwrite",
    )
    export_iceberg_metadata(t, spark)
    upsert_into_iceberg(
        spark, path,
        spark.createDataFrame(
            [(3, 333.0), (50, 50.0)], "id long, v double"
        ),
        ["id"],
    )
    # DELETE touching both a replaced key's region and plain rows:
    # the pre-image of key 3 (v=3.0) must NOT re-match v < 5
    info = delete_from_iceberg(spark, path, "v < 5.0")
    # ids 0,1,2,4 only: key 3's pre-image (v=3.0) is equality-dead
    # and must NOT re-match — a scan without the eq kill returns 5
    assert info["rows_deleted"] == 4
    got = {r.id: r.v for r in read_iceberg_table(spark, path).collect()}
    assert 3 in got and got[3] == 333.0
    assert set(range(0, 5)) & set(got) == {3}

    update_from_iceberg(spark, path, "id = 50", {"v": "500.0"})
    got = {r.id: r.v for r in read_iceberg_table(spark, path).collect()}
    assert got[50] == 500.0

    merge_into_iceberg(
        spark, path,
        spark.createDataFrame(
            [(3, 3333.0), (60, 60.0)], "id long, v double"
        ),
        "t.id = s.id",
        when_matched_update={"v": "s.v"},
        when_not_matched_insert=True,
    )
    got = {r.id: r.v for r in read_iceberg_table(spark, path).collect()}
    assert got[3] == 3333.0 and got[60] == 60.0
    # changelog cumulative state == snapshot across the mixed history
    ch = read_iceberg_changelog(spark, path).collect()
    state: dict = {}
    for r in sorted(
        ch, key=lambda r: (r._snapshot_id, r._change_type == "insert")
    ):
        if r._change_type == "insert":
            state[r.id] = r.v
        else:
            state.pop(r.id, None)
    assert state == got


def test_rewrite_compacts_equality_deletes(spark, tmp_path):
    """Round 11: compaction no longer refuses equality deletes — they
    reduce to exact position kills (sequence-ruled, scoped), every
    touched file rewrites, all delete manifests drop, and the
    strictly-newer re-insert SURVIVES (the sequence rule held through
    the rewrite)."""
    from data_lakehouse_project_spark.operators.iceberg_reader import (
        iceberg_live_files,
    )
    from data_lakehouse_project_spark.operators.iceberg_writer import (
        append_to_iceberg,
        rewrite_data_files,
    )

    path = str(tmp_path / "rw")
    t = TxnTable(path)
    t.write(
        spark.range(0, 30).repartition(3).selectExpr(
            "id", "CAST(id AS DOUBLE) AS v"
        ),
        mode="overwrite",
    )
    export_iceberg_metadata(t, spark)
    write_equality_deletes(
        spark, path,
        spark.createDataFrame([(4,), (9,)], "id long"), ["id"],
    )
    # re-insert key 4 AFTER the delete: strictly newer, must survive
    append_to_iceberg(
        spark,
        spark.createDataFrame([(4, 44.0)], "id long, v double"),
        path,
    )
    before = _rows(read_iceberg_table(spark, path))
    info = rewrite_data_files(spark, path, target_size_bytes=1 << 30)
    assert info["snapshot_id"] is not None
    after = _rows(read_iceberg_table(spark, path))
    assert after == before
    assert (4, 44.0) in after and (9, 9.0) not in after
    # all delete manifests dropped; no eq deletes remain live
    _, live, posd, eqd = iceberg_live_files(spark, path)
    assert eqd == [] and posd == []
    # changelog across the whole history still replays (the replace
    # snapshot contributes nothing)
    ch = read_iceberg_changelog(spark, path).collect()
    state: dict = {}
    for r in sorted(
        ch, key=lambda r: (r._snapshot_id, r._change_type == "insert")
    ):
        if r._change_type == "insert":
            state[r.id] = r.v
        else:
            state.pop(r.id, None)
    assert sorted(state.items()) == after


def test_v3_partitioned_scoped_upsert_interaction(spark, tmp_path):
    """Feature interaction: v3 table (row lineage) + identity
    partitioning + PARTITION-SCOPED keyed upsert + changelog replay +
    lineage read — all round-11 pieces composed."""
    from data_lakehouse_project_spark.operators.iceberg_writer import (
        upgrade_iceberg_to_v3,
    )

    path = str(tmp_path / "v3sc")
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
    upgrade_iceberg_to_v3(spark, path)
    upsert_into_iceberg(
        spark, path,
        spark.createDataFrame(
            [(4, "1", 444.0), (100, "2", 1.0)],
            "id long, part string, v double",
        ),
        ["id", "part"],
    )
    # scoped route on v3: no unpartitioned spec appended
    md = load_iceberg_metadata(path)
    assert md["format-version"] == 3
    assert all(sp.get("fields") for sp in md["partition-specs"])
    got = {r.id: r.v for r in read_iceberg_table(spark, path).collect()}
    assert got[4] == 444.0 and got[100] == 1.0 and len(got) == 13
    # lineage: upserted rows take fresh counter ids; others keep
    lin = {
        r.id: r._row_id
        for r in read_iceberg_table(
            spark, path, row_lineage=True
        ).collect()
    }
    assert {lin[4], lin[100]} == {12, 13}
    # changelog cumulative == snapshot
    ch = read_iceberg_changelog(spark, path).collect()
    state: dict = {}
    for r in sorted(
        ch, key=lambda r: (r._snapshot_id, r._change_type == "insert")
    ):
        if r._change_type == "insert":
            state[r.id] = r.v
        else:
            state.pop(r.id, None)
    assert state == got


def test_upsert_with_delete_keys_cdc_batch(spark, tmp_path):
    """One snapshot applying a FULL CDC batch: upserts AND deletions
    (delete_keys kills without re-inserting); scoped on partitioned
    tables; changelog replays exactly; both-frames key refused."""
    path = str(tmp_path / "cdcb")
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
    src = spark.createDataFrame(
        [(4, "1", 444.0), (100, "2", 1.0)],
        "id long, part string, v double",
    )
    dels = spark.createDataFrame(
        [(7, "1"), (9, "0")], "id long, part string"
    )
    info = upsert_into_iceberg(
        spark, path, src, ["id", "part"], delete_keys=dels
    )
    assert info["keys_deleted"] == 2
    # scoped route still engages (keys cover the partition source)
    md = load_iceberg_metadata(path)
    assert all(sp.get("fields") for sp in md["partition-specs"])
    got = {r.id: r.v for r in read_iceberg_table(spark, path).collect()}
    assert 7 not in got and 9 not in got
    assert got[4] == 444.0 and got[100] == 1.0
    assert len(got) == 12 - 2 + 1  # 12 base, -2 deleted, +1 fresh

    ch = read_iceberg_changelog(spark, path).collect()
    last = max(r._snapshot_id for r in ch)
    diff = sorted(
        (r._change_type, r.id)
        for r in ch
        if r._snapshot_id == last
    )
    assert diff == [
        ("delete", 4), ("delete", 7), ("delete", 9),
        ("insert", 4), ("insert", 100),
    ]

    with pytest.raises(ValueError, match="both"):
        upsert_into_iceberg(
            spark, path,
            spark.createDataFrame(
                [(4, "1", 1.0)], "id long, part string, v double"
            ),
            ["id", "part"],
            delete_keys=spark.createDataFrame(
                [(4, "1")], "id long, part string"
            ),
        )

    # pure-deletion batch (empty source, only -D rows)
    info2 = upsert_into_iceberg(
        spark, path,
        spark.createDataFrame([], "id long, part string, v double"),
        ["id", "part"],
        delete_keys=spark.createDataFrame(
            [(2, "2")], "id long, part string"
        ),
    )
    assert info2["keys_deleted"] == 1 and info2["data_files"] == 0
    assert 2 not in {
        r.id for r in read_iceberg_table(spark, path).collect()
    }


@pytest.mark.parametrize("seed", [11, 42])
def test_randomized_scoped_mix(spark, tmp_path, seed):
    """Randomized append/scoped-upsert/global-delete/delete_keys mix
    on a partitioned table, model-checked against a pure-Python
    replica: snapshot == model, changelog cumulative == snapshot at
    every step's end."""
    import random

    rng = random.Random(seed)
    path = str(tmp_path / f"fuzz{seed}")
    t = TxnTable(path)
    t.write(
        spark.range(0, 20).selectExpr(
            "id", "CAST(id % 4 AS STRING) AS part",
            "CAST(id AS DOUBLE) AS v",
        ),
        mode="overwrite",
        partition_by=["part"],
    )
    export_iceberg_metadata(t, spark)
    from data_lakehouse_project_spark.operators.iceberg_writer import (
        append_to_iceberg,
    )

    # model: {(id, part): v} — key = (id, part) for scoped ops,
    # global deletes kill by id across partitions
    model = {(i, str(i % 4)): float(i) for i in range(20)}
    next_id = 100
    for step in range(6):
        op = rng.choice(["append", "upsert", "global_del", "cdc"])
        if op == "append":
            rows = [
                (next_id + j, str((next_id + j) % 4),
                 float(next_id + j))
                for j in range(rng.randint(1, 3))
            ]
            next_id += 10
            append_to_iceberg(
                spark,
                spark.createDataFrame(
                    rows, "id long, part string, v double"
                ),
                path,
            )
            for i, p, v in rows:
                model[(i, p)] = v
        elif op == "upsert":
            keys = rng.sample(sorted(model), min(2, len(model)))
            rows = [(i, p, model[(i, p)] + 1000.0) for i, p in keys]
            rows.append((next_id, str(next_id % 4), 1.0))
            next_id += 10
            upsert_into_iceberg(
                spark, path,
                spark.createDataFrame(
                    rows, "id long, part string, v double"
                ),
                ["id", "part"],
            )
            for i, p, v in rows:
                model[(i, p)] = v
        elif op == "global_del":
            ids = {i for i, _ in model}
            kill = rng.sample(sorted(ids), min(2, len(ids)))
            write_equality_deletes(
                spark, path,
                spark.createDataFrame(
                    [(i,) for i in kill], "id long"
                ),
                ["id"],  # does NOT cover the partition source: GLOBAL
            )
            model = {
                k: v for k, v in model.items() if k[0] not in kill
            }
        else:  # cdc batch: one upsert + one deletion
            keys = rng.sample(sorted(model), min(3, len(model)))
            up = keys[:1]
            dels = [k for k in keys[1:2]]
            src = [(i, p, -1.0) for i, p in up]
            upsert_into_iceberg(
                spark, path,
                spark.createDataFrame(
                    src, "id long, part string, v double"
                ),
                ["id", "part"],
                delete_keys=spark.createDataFrame(
                    dels, "id long, part string"
                )
                if dels
                else None,
            )
            for i, p, v in src:
                model[(i, p)] = v
            for k in dels:
                model.pop(k, None)
        got = {
            (r.id, r.part): r.v
            for r in read_iceberg_table(spark, path).collect()
        }
        assert got == model, f"step {step} ({op}): mismatch"

    # changelog cumulative state == final snapshot
    ch = read_iceberg_changelog(spark, path).collect()
    state: dict = {}
    for r in sorted(
        ch, key=lambda r: (r._snapshot_id, r._change_type == "insert")
    ):
        if r._change_type == "insert":
            state[(r.id, r.part)] = r.v
        else:
            state.pop((r.id, r.part), None)
    assert state == model


def test_time_travel_before_scoped_delete(spark, tmp_path):
    """Time travel to a pre-upsert snapshot ignores later scoped
    equality deletes entirely (the delete prune sees only that
    snapshot's manifests)."""
    from data_lakehouse_project_spark.operators.iceberg_reader import (
        iceberg_snapshot_ids,
    )

    path = str(tmp_path / "tt")
    t = TxnTable(path)
    t.write(
        spark.range(0, 9).selectExpr(
            "id", "CAST(id % 3 AS STRING) AS part",
            "CAST(id AS DOUBLE) AS v",
        ),
        mode="overwrite",
        partition_by=["part"],
    )
    export_iceberg_metadata(t, spark)
    sid0 = [s for s, _ in iceberg_snapshot_ids(path)][-1]
    upsert_into_iceberg(
        spark, path,
        spark.createDataFrame(
            [(4, "1", 44.0)], "id long, part string, v double"
        ),
        ["id", "part"],
    )
    old = read_iceberg_table(spark, path, snapshot_id=sid0)
    assert {r.id: r.v for r in old.collect()}[4] == 4.0
    new = read_iceberg_table(spark, path)
    assert {r.id: r.v for r in new.collect()}[4] == 44.0


def test_rewrite_compacts_multi_sequence_eq_deletes(spark, tmp_path):
    """Review finding (r11): equality_kill_positions' short-circuit
    used MIN of the group's delete sequence numbers — a data file
    newer than the oldest delete but older than a later one lost its
    kills.  Reachable through rewrite_data_files, which aggregates
    every live eq delete into one group: upsert (data@2 + del@2),
    then a second eq delete @4 replacing a key that lives in the
    seq-2 data file, then compact — the seq-4 kill must hold."""
    from data_lakehouse_project_spark.operators.iceberg_reader import (
        iceberg_live_files,
    )
    from data_lakehouse_project_spark.operators.iceberg_writer import (
        rewrite_data_files,
    )

    path = str(tmp_path / "ms")
    t = TxnTable(path)
    t.write(
        spark.range(0, 10).selectExpr(
            "id", "CAST(id AS DOUBLE) AS v"
        ),
        mode="overwrite",
    )
    export_iceberg_metadata(t, spark)                     # seq 1
    upsert_into_iceberg(                                  # seq 2
        spark, path,
        spark.createDataFrame([(3, 33.0)], "id long, v double"),
        ["id"],
    )
    write_equality_deletes(                               # seq 3
        spark, path,
        spark.createDataFrame([(3,)], "id long"), ["id"],
    )  # kills the seq-2 upsert row for key 3
    before = _rows(read_iceberg_table(spark, path))
    assert (3, 33.0) not in before and (3, 3.0) not in before
    rewrite_data_files(spark, path, target_size_bytes=1 << 30)
    after = _rows(read_iceberg_table(spark, path))
    assert after == before  # the seq-3 kill survived compaction
    _, _, posd, eqd = iceberg_live_files(spark, path)
    assert eqd == [] and posd == []


def test_scoped_route_disabled_after_partition_evolution(
    spark, tmp_path
):
    """Review finding (r11): a table whose metadata carries MORE than
    the default spec (partition evolution, or a prior global-route
    unpartitioned spec) must take the GLOBAL route even when the keys
    cover the current partition sources — a scoped delete would
    silently skip matching rows in older-spec live files."""
    import json as _json

    from data_lakehouse_project_spark.operators.iceberg_reader import (
        _latest_metadata_file,
    )

    path = str(tmp_path / "evo")
    t = TxnTable(path)
    t.write(
        spark.range(0, 9).selectExpr(
            "id", "CAST(id % 3 AS STRING) AS part",
            "CAST(id AS DOUBLE) AS v",
        ),
        mode="overwrite",
        partition_by=["part"],
    )
    export_iceberg_metadata(t, spark)
    # simulate partition evolution: the existing spec 0 keeps the
    # live data manifests' attribution; a NEW identical spec 1
    # becomes the default (so metadata carries TWO specs)
    md_file = _latest_metadata_file(path)
    md = _json.load(open(md_file))
    cur = md["partition-specs"][0]
    md["partition-specs"] = [cur, {**cur, "spec-id": 1}]
    md["default-spec-id"] = 1
    _json.dump(md, open(md_file, "w"))

    write_equality_deletes(
        spark, path,
        spark.createDataFrame([(4, "1")], "id long, part string"),
        ["id", "part"],
    )
    # GLOBAL route: delete manifests under an unpartitioned spec with
    # empty tuples, and the row is gone
    for spec_id, df_ in _delete_entries(spark, path):
        assert (df_.get("partition") or {}) == {}
    got = sorted(r.id for r in read_iceberg_table(spark, path).collect())
    assert got == [0, 1, 2, 3, 5, 6, 7, 8]
