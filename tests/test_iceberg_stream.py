"""Streaming source over an Iceberg snapshot chain
(sources/iceberg_stream.py): snapshot-offset tailing over the
engine's own exports, exactly-once restart, backpressure splits,
the delete/overwrite refusal contract, and replace-snapshot skips."""

from __future__ import annotations

import json
import os

import pytest

from data_lakehouse_project_spark.operators.iceberg_export import (
    export_iceberg_metadata,
)
from data_lakehouse_project_spark.operators.txnlog import TxnTable
from data_lakehouse_project_spark.sources.python_datasource import (
    register_python_datasources,
)


def _run_available_now(spark, path, ckpt, sink, batches=None, **options):
    register_python_datasources(spark)
    reader = spark.readStream.format("iceberg_stream").option("path", path)
    for k, v in options.items():
        reader = reader.option(k, v)

    def _each(df, _bid):
        rows = [(r["id"], r["v"]) for r in df.collect()]
        sink.extend(rows)
        if batches is not None and rows:
            batches.append(len(rows))

    q = (
        reader.load()
        .writeStream.foreachBatch(_each)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def _table(spark, path, n0=4):
    t = TxnTable(path)
    t.write(
        spark.range(0, n0).selectExpr("id", "id * 2.0 AS v"),
        mode="overwrite",
    )
    export_iceberg_metadata(t, spark)
    return t


def test_tail_appends_exactly_once(spark, tmp_path):
    path = str(tmp_path / "t")
    t = _table(spark, path)
    t.write(
        spark.range(4, 6).selectExpr("id", "id * 2.0 AS v"), mode="append"
    )
    export_iceberg_metadata(t, spark)

    sink: list = []
    ckpt = str(tmp_path / "ck")
    _run_available_now(spark, path, ckpt, sink)
    assert sorted(i for i, _ in sink) == [0, 1, 2, 3, 4, 5]
    assert dict(sink)[3] == 6.0

    # no new snapshots: nothing replays
    _run_available_now(spark, path, ckpt, sink)
    assert len(sink) == 6

    # a new export ships ONLY the appended rows (restart exactly-once)
    t.write(
        spark.range(6, 8).selectExpr("id", "id * 2.0 AS v"), mode="append"
    )
    export_iceberg_metadata(t, spark)
    _run_available_now(spark, path, ckpt, sink)
    assert sorted(i for i, _ in sink) == list(range(8))


def test_starting_snapshot_id_and_latest(spark, tmp_path):
    from data_lakehouse_project_spark.operators.iceberg_reader import (
        iceberg_snapshot_ids,
    )

    path = str(tmp_path / "t")
    t = _table(spark, path)
    t.write(
        spark.range(4, 6).selectExpr("id", "id * 2.0 AS v"), mode="append"
    )
    export_iceberg_metadata(t, spark)
    sids = [s for s, _ in iceberg_snapshot_ids(path)]

    # startingSnapshotId is EXCLUSIVE — the named snapshot is consumed
    sink: list = []
    _run_available_now(
        spark, path, str(tmp_path / "ck1"), sink,
        startingSnapshotId=str(sids[0]),
    )
    assert sorted(i for i, _ in sink) == [4, 5]

    # startingOffset=latest tails only FUTURE snapshots
    sink2: list = []
    ck2 = str(tmp_path / "ck2")
    _run_available_now(
        spark, path, ck2, sink2, startingOffset="latest"
    )
    assert sink2 == []
    t.write(
        spark.range(6, 7).selectExpr("id", "id * 2.0 AS v"), mode="append"
    )
    export_iceberg_metadata(t, spark)
    _run_available_now(spark, path, ck2, sink2, startingOffset="latest")
    assert sorted(i for i, _ in sink2) == [6]


def _run_ticking(spark, path, ckpt, total_rows, **options):
    """processingTime trigger (Python stream sources fall back to one
    single batch under availableNow, hiding backpressure splits);
    returns the non-empty per-batch row lists."""
    import time

    register_python_datasources(spark)
    reader = spark.readStream.format("iceberg_stream").option("path", path)
    for k, v in options.items():
        reader = reader.option(k, v)
    batches: list[list[int]] = []
    q = (
        reader.load()
        .writeStream.foreachBatch(
            lambda df, _bid: batches.append(
                sorted(r["id"] for r in df.collect())
            )
        )
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="1 second")
        .start()
    )
    deadline = time.time() + 90
    while (
        time.time() < deadline
        and sum(len(b) for b in batches) < total_rows
    ):
        time.sleep(1)
    q.stop()
    return [b for b in batches if b]


def test_max_files_per_trigger_splits_mid_snapshot(spark, tmp_path):
    path = str(tmp_path / "t")
    t = TxnTable(path)
    t.write(
        spark.range(0, 8)
        .selectExpr("id", "id * 2.0 AS v")
        .repartition(4),
        mode="overwrite",
    )
    export_iceberg_metadata(t, spark)

    non_empty = _run_ticking(
        spark, path, str(tmp_path / "ck"), 8, maxFilesPerTrigger="1"
    )
    assert sorted(i for b in non_empty for i in b) == list(range(8))
    # one file per micro-batch — the single 4-file snapshot SPLITS
    assert len(non_empty) == 4


def test_max_rows_per_trigger(spark, tmp_path):
    path = str(tmp_path / "t")
    t = TxnTable(path)
    t.write(
        spark.range(0, 9)
        .selectExpr("id", "id * 2.0 AS v")
        .repartition(3),
        mode="overwrite",
    )
    export_iceberg_metadata(t, spark)
    non_empty = _run_ticking(
        spark, path, str(tmp_path / "ck"), 9,
        **{"streaming-max-rows-per-micro-batch": "3"},
    )
    assert sorted(i for b in non_empty for i in b) == list(range(9))
    assert len(non_empty) == 3


def test_delete_snapshot_refused_then_skipped(spark, tmp_path):
    path = str(tmp_path / "t")
    t = _table(spark, path)
    t.delete_where(spark, "id < 2")
    export_iceberg_metadata(t, spark)  # truthful: delete/overwrite
    t.write(
        spark.range(4, 5).selectExpr("id", "id * 2.0 AS v"), mode="append"
    )
    export_iceberg_metadata(t, spark)

    sink: list = []
    with pytest.raises(Exception, match="delete|overwrite|Snapshots"):
        _run_available_now(spark, path, str(tmp_path / "ck1"), sink)

    # with the skip options the WHOLE snapshot is skipped (Iceberg's
    # documented caveat) and the later append still streams
    sink2: list = []
    _run_available_now(
        spark, path, str(tmp_path / "ck2"), sink2,
        skipDeleteSnapshots="true", skipOverwriteSnapshots="true",
    )
    assert sorted(i for i, _ in sink2) == [0, 1, 2, 3, 4]


def test_replace_snapshot_skipped(spark, tmp_path):
    """An OPTIMIZE between exports yields a 'replace' snapshot
    (dataChange=false rewrite) — streamed tables neither refuse nor
    re-ship compacted rows."""
    from data_lakehouse_project_spark.operators.iceberg_reader import (
        iceberg_metadata_df,
    )

    path = str(tmp_path / "t")
    t = _table(spark, path)
    sink: list = []
    ckpt = str(tmp_path / "ck")
    _run_available_now(spark, path, ckpt, sink)
    assert sorted(i for i, _ in sink) == [0, 1, 2, 3]

    t.write(
        spark.range(4, 6).selectExpr("id", "id * 2.0 AS v"), mode="append"
    )
    export_iceberg_metadata(t, spark)  # append snapshot with 4..5
    t.optimize(spark)
    export_iceberg_metadata(t, spark)  # pure dataChange=false rewrite
    ops = [
        r.operation
        for r in iceberg_metadata_df(spark, path, "snapshots").collect()
    ]
    assert ops.count("replace") == 1 and ops.count("append") == 2

    # the compaction rewrote files 0..5 into one — the stream ships
    # the appended 4..5 and must NOT re-ship anything for the replace
    _run_available_now(spark, path, ckpt, sink)
    assert sorted(i for i, _ in sink) == [0, 1, 2, 3, 4, 5]

    t.write(
        spark.range(6, 7).selectExpr("id", "id * 2.0 AS v"), mode="append"
    )
    export_iceberg_metadata(t, spark)
    _run_available_now(spark, path, ckpt, sink)
    assert sorted(i for i, _ in sink) == [0, 1, 2, 3, 4, 5, 6]


def test_schema_is_session_free_and_typed(spark, tmp_path):
    path = str(tmp_path / "t")
    _table(spark, path)
    from data_lakehouse_project_spark.operators.iceberg_reader import (
        load_iceberg_metadata,
    )
    from data_lakehouse_project_spark.sources.iceberg_stream import (
        _session_free_schema,
    )

    st = _session_free_schema(load_iceberg_metadata(path))
    # id * 2.0 is Spark DECIMAL arithmetic — the export carries it
    # through as an iceberg decimal, round-tripped session-free here
    assert [(f.name, f.dataType.simpleString()) for f in st.fields] == [
        ("id", "bigint"), ("v", "decimal(23,1)"),
    ]
    assert all(
        f.metadata.get("iceberg.field.id") for f in st.fields
    )


def test_hand_built_foreign_chain_streams(spark, tmp_path):
    """Hand-built foreign fixture (not the engine's own export):
    inherited snapshot attribution — an EXISTING entry in a rewritten
    manifest is NOT re-shipped; field-id files resolve by id."""
    from tests.test_iceberg_reader import (
        SCHEMA_0,
        T1,
        T2,
        _data_file,
        _entry,
        _manifest,
        _metadata,
    )
    from data_lakehouse_project_spark.operators.iceberg_export import (
        _AvroWriter,
    )
    from tests.test_iceberg_reader import MANIFEST_FILE_AVRO

    table = str(tmp_path / "foreign")
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
        p = os.path.join(table, "metadata", name)
        w = _AvroWriter(spark, MANIFEST_FILE_AVRO, p,
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
        return p

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

    register_python_datasources(spark)
    got: list = []
    q = (
        spark.readStream.format("iceberg_stream")
        .option("path", table)
        .load()
        .writeStream.foreachBatch(
            lambda df, _b: got.extend(
                (r["id"], r["name"]) for r in df.collect()
            )
        )
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # file a ships once (snapshot 9); its EXISTING re-listing under
    # snapshot 10 contributes nothing; b ships via inheritance
    assert sorted(got) == [(1, "a"), (2, "b"), (3, "c")]


def test_offset_snapshot_expired_is_hard_error(spark, tmp_path):
    """A checkpointed offset whose snapshot left the metadata
    (expired/rolled back) must error, never silently rescan."""
    from data_lakehouse_project_spark.sources.iceberg_stream import (
        _IcebergStreamReader,
    )

    path = str(tmp_path / "t")
    _table(spark, path)
    r = _IcebergStreamReader(
        path, None, -1, skip_delete=False, skip_overwrite=False
    )
    _, _, order = r._md()
    with pytest.raises(ValueError, match="ancestry"):
        r._cursor({"snapshot_id": 999999, "pos": 0}, order)


def test_identity_partition_values_surface_in_stream(spark, tmp_path):
    """Spec: identity partition values replace an absent source
    column — the exported (delta-lite-layout) files lack the column
    physically, yet the stream ships it as the manifest's constant."""
    path = str(tmp_path / "tp")
    t = TxnTable(path)
    t.write(
        spark.range(0, 3).selectExpr(
            "id", "'a' AS part", "CAST(id AS DOUBLE) AS v"
        ),
        mode="overwrite",
        partition_by=["part"],
    )
    export_iceberg_metadata(t, spark)

    register_python_datasources(spark)
    got: list = []
    q = (
        spark.readStream.format("iceberg_stream")
        .option("path", path)
        .load()
        .writeStream.foreachBatch(
            lambda df, _b: got.extend(
                (r["id"], r["part"]) for r in df.collect()
            )
        )
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert sorted(got) == [(0, "a"), (1, "a"), (2, "a")]


def test_starting_timestamp_resolves_to_snapshot(spark, tmp_path):
    """Iceberg's stream-from-timestamp: snapshots committed AT OR
    AFTER the timestamp ship; older ones are consumed."""
    from data_lakehouse_project_spark.operators.iceberg_reader import (
        load_iceberg_metadata,
    )

    path = str(tmp_path / "t")
    t = _table(spark, path)                         # snapshot 1
    t.write(
        spark.range(4, 6).selectExpr("id", "id * 2.0 AS v"),
        mode="append",
    )
    export_iceberg_metadata(t, spark)               # snapshot 2
    md = load_iceberg_metadata(path)
    ts2 = max(s["timestamp-ms"] for s in md["snapshots"])

    sink: list = []
    _run_available_now(
        spark, path, str(tmp_path / "ck"), sink,
        startingTimestamp=str(ts2),
    )
    assert sorted(i for i, _ in sink) == [4, 5]

    # a timestamp past the newest commit tails only the future
    sink2: list = []
    _run_available_now(
        spark, path, str(tmp_path / "ck2"), sink2,
        **{"stream-from-timestamp": str(ts2 + 10_000)},
    )
    assert sink2 == []


def _run_cdf(spark, path, ckpt, sink, **options):
    register_python_datasources(spark)
    reader = (
        spark.readStream.format("iceberg_stream")
        .option("path", path)
        .option("readChangeFeed", "true")
    )
    for k, v in options.items():
        reader = reader.option(k, v)

    def _each(df, _bid):
        sink.extend(
            (r["_snapshot_id"], r["_change_type"], r["id"], r["v"])
            for r in df.collect()
        )

    q = (
        reader.load()
        .writeStream.foreachBatch(_each)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_changelog_stream_over_dml(spark, tmp_path):
    """readChangeFeed=true: delete and overwrite snapshots stream
    delete/insert rows (the streaming twin of read_iceberg_changelog)
    instead of refusing; replays match the batch changelog exactly."""
    from data_lakehouse_project_spark.operators.iceberg_reader import (
        iceberg_snapshot_ids,
        read_iceberg_changelog,
    )
    from data_lakehouse_project_spark.operators.iceberg_writer import (
        delete_from_iceberg,
        merge_into_iceberg,
    )

    path = str(tmp_path / "t")
    t = TxnTable(path)
    t.write(
        spark.range(0, 4).selectExpr(
            "id", "'a' AS part", "id * 2.0 AS v"
        ),
        mode="overwrite",
    )
    export_iceberg_metadata(t, spark)                 # snap 1
    delete_from_iceberg(spark, path, "id = 1")        # snap 2 (delete)
    src = spark.createDataFrame(
        [(2, "a", 99.0), (10, "a", 100.0)],
        "id long, part string, v double",
    )
    merge_into_iceberg(                               # snap 3 (overwrite)
        spark, path, src, "t.id = s.id",
        when_matched_update={"v": "s.v"},
    )
    sids = [s for s, _ in iceberg_snapshot_ids(path)]

    sink: list = []
    _run_cdf(spark, path, str(tmp_path / "ck"), sink)
    assert sorted(sink) == [
        (sids[0], "insert", 0, 0.0),
        (sids[0], "insert", 1, 2.0),
        (sids[0], "insert", 2, 4.0),
        (sids[0], "insert", 3, 6.0),
        (sids[1], "delete", 1, 2.0),
        (sids[2], "delete", 2, 4.0),
        (sids[2], "insert", 2, 99.0),
        (sids[2], "insert", 10, 100.0),
    ]
    # identical to the batch changelog
    batch = sorted(
        (r._snapshot_id, r._change_type, r.id, r.v)
        for r in read_iceberg_changelog(spark, path).collect()
    )
    assert batch == sorted(sink)

    # exactly-once: a later delete streams ONLY its change rows
    delete_from_iceberg(spark, path, "id = 10")       # snap 4
    _run_cdf(spark, path, str(tmp_path / "ck"), sink)
    assert len(sink) == 9
    assert sink[-1][1:] == ("delete", 10, 100.0)


def test_changelog_stream_skips_replace(spark, tmp_path):
    from data_lakehouse_project_spark.operators.iceberg_writer import (
        delete_from_iceberg,
        rewrite_data_files,
    )

    path = str(tmp_path / "t")
    t = _table(spark, path)
    delete_from_iceberg(spark, path, "id = 0")
    sink: list = []
    ckpt = str(tmp_path / "ck")
    _run_cdf(spark, path, ckpt, sink)
    n = len(sink)
    assert n == 5  # 4 inserts + 1 delete
    rewrite_data_files(spark, path)                   # replace snap
    _run_cdf(spark, path, ckpt, sink)
    assert len(sink) == n  # compaction ships nothing


def test_changelog_stream_backpressure_units(spark, tmp_path):
    """maxFilesPerTrigger counts CHANGE UNITS in changelog mode; a
    range can split between a snapshot's delete and insert units and
    still deliver everything exactly once.  (processingTime trigger:
    Python sources collapse availableNow to one batch, hiding
    splits.)"""
    import time

    from data_lakehouse_project_spark.operators.iceberg_writer import (
        update_from_iceberg,
    )

    path = str(tmp_path / "t")
    _table(spark, path)
    update_from_iceberg(spark, path, "id >= 2", {"v": "v + 100.0"})

    register_python_datasources(spark)
    batches: list[list[tuple]] = []
    q = (
        spark.readStream.format("iceberg_stream")
        .option("path", path)
        .option("readChangeFeed", "true")
        .option("maxFilesPerTrigger", "1")
        .load()
        .writeStream.foreachBatch(
            lambda df, _bid: batches.append(
                sorted(
                    (r["_change_type"], r["id"], float(r["v"]))
                    for r in df.collect()
                )
            )
        )
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(processingTime="1 second")
        .start()
    )
    deadline = time.time() + 90
    while (
        time.time() < deadline
        and sum(len(b) for b in batches) < 8
    ):
        time.sleep(1)
    q.stop()
    non_empty = [b for b in batches if b]
    rows = sorted(r for b in non_empty for r in b)
    assert rows == [
        ("delete", 2, 4.0), ("delete", 3, 6.0),
        ("insert", 0, 0.0), ("insert", 1, 2.0), ("insert", 2, 4.0),
        ("insert", 2, 104.0), ("insert", 3, 6.0),
        ("insert", 3, 106.0),
    ]
    # one unit per micro-batch: the update snapshot's insert unit and
    # delete unit land in SEPARATE batches
    assert len(non_empty) >= 3


def test_changelog_stream_delete_units_carry_partition_consts(
    spark, tmp_path
):
    """Identity partition values replace an absent source column in
    DELETE change rows too — insert and delete units of the same
    stream must surface the same per-file manifest constants."""
    from data_lakehouse_project_spark.operators.iceberg_writer import (
        delete_from_iceberg,
    )

    path = str(tmp_path / "tp")
    t = TxnTable(path)
    t.write(
        spark.range(0, 4).selectExpr(
            "id", "CASE WHEN id < 2 THEN 'a' ELSE 'b' END AS part",
            "CAST(id AS DOUBLE) AS v",
        ),
        mode="overwrite",
        partition_by=["part"],
    )
    export_iceberg_metadata(t, spark)               # snap 1: inserts
    delete_from_iceberg(spark, path, "id = 1")      # snap 2: pos-del
    delete_from_iceberg(spark, path, "part = 'b'")  # snap 3: files

    register_python_datasources(spark)
    sink: list = []
    q = (
        spark.readStream.format("iceberg_stream")
        .option("path", path)
        .option("readChangeFeed", "true")
        .load()
        .writeStream.foreachBatch(
            lambda df, _b: sink.extend(
                (r["_change_type"], r["id"], r["part"])
                for r in df.collect()
            )
        )
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert all(p is not None for _, _, p in sink), sink
    assert sorted(sink) == [
        ("delete", 1, "a"),
        ("delete", 2, "b"),
        ("delete", 3, "b"),
        ("insert", 0, "a"),
        ("insert", 1, "a"),
        ("insert", 2, "b"),
        ("insert", 3, "b"),
    ]


def test_changelog_stream_over_equality_deletes(spark, tmp_path):
    """readChangeFeed=true replays equality-delete and keyed-upsert
    snapshots (reduced to exact position kills at planning time) —
    byte-identical to the batch changelog, across a restart."""
    from data_lakehouse_project_spark.operators.iceberg_reader import (
        read_iceberg_changelog,
    )
    from data_lakehouse_project_spark.operators.iceberg_writer import (
        append_to_iceberg,
        upsert_into_iceberg,
        write_equality_deletes,
    )

    path = str(tmp_path / "eqs")
    t = TxnTable(path)
    t.write(
        spark.range(0, 5).selectExpr("id", "CAST(id AS DOUBLE) AS v"),
        mode="overwrite",
    )
    export_iceberg_metadata(t, spark)                   # snap 1
    write_equality_deletes(                             # snap 2
        spark, path,
        spark.createDataFrame([(1,), (3,)], "id long"), ["id"],
    )
    append_to_iceberg(                                  # snap 3
        spark,
        spark.range(3, 4).selectExpr("id", "CAST(id AS DOUBLE) AS v"),
        path,
    )
    src = spark.createDataFrame(
        [(3, 333.0), (20, 20.0)], "id long, v double"
    )
    upsert_into_iceberg(spark, path, src, ["id"])       # snap 4

    sink: list = []
    _run_cdf(spark, path, str(tmp_path / "ck"), sink)
    want = sorted(
        (r._snapshot_id, r._change_type, r.id, r.v)
        for r in read_iceberg_changelog(spark, path).collect()
    )
    assert sorted(sink) == want
    # the upsert snapshot emitted the replaced key's pre-image
    upsids = sorted({s for s, *_ in sink})
    last = [x for x in sink if x[0] == upsids[-1]]
    assert ("delete", 3, 3.0) in {(c, i, v) for _, c, i, v in last}
    assert ("insert", 3, 333.0) in {(c, i, v) for _, c, i, v in last}

    # restart with the same checkpoint: nothing re-ships; a further
    # eq-delete streams incrementally
    sink2: list = []
    _run_cdf(spark, path, str(tmp_path / "ck"), sink2)
    assert sink2 == []
    write_equality_deletes(                             # snap 5
        spark, path,
        spark.createDataFrame([(20,)], "id long"), ["id"],
    )
    _run_cdf(spark, path, str(tmp_path / "ck"), sink2)
    assert [(c, i, v) for _, c, i, v in sink2] == [("delete", 20, 20.0)]
