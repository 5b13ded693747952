"""Streaming source over a Delta log (sources/delta_stream.py):
version-offset tailing, exactly-once restart, partition-column
reattachment, and the Delta remove-action refusal contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_lakehouse_project_spark.operators.txnlog import TxnTable
from data_lakehouse_project_spark.sources.python_datasource import (
    register_python_datasources,
)


def _batch(spark, lo, hi, part="p0"):
    return spark.range(lo, hi).selectExpr(
        "id", f"'{part}' AS part", "id * 2.0 AS v"
    )


def _run_available_now(spark, path, ckpt, sink, **options):
    reader = spark.readStream.format("delta_stream").option("path", path)
    for k, v in options.items():
        reader = reader.option(k, v)
    q = (
        reader.load()
        .writeStream.foreachBatch(
            lambda df, _bid: sink.extend(
                (r["id"], r["part"], r["v"]) for r in df.collect()
            )
        )
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_tail_appends_exactly_once(spark, tmp_path):
    register_python_datasources(spark)
    path = str(tmp_path / "t")
    ckpt = str(tmp_path / "ckpt")
    t = TxnTable(path)
    t.write(_batch(spark, 0, 5), mode="overwrite")
    t.write(_batch(spark, 5, 8), mode="append")

    got: list[tuple] = []
    _run_available_now(spark, path, ckpt, got)
    assert sorted(r[0] for r in got) == list(range(8))
    assert all(r[2] == r[0] * 2.0 for r in got)

    # restart from the checkpoint: ONLY the new commit's rows arrive
    t.write(_batch(spark, 8, 10), mode="append")
    got2: list[tuple] = []
    _run_available_now(spark, path, ckpt, got2)
    assert sorted(r[0] for r in got2) == [8, 9]

    # nothing new -> empty batch, not a replay
    got3: list[tuple] = []
    _run_available_now(spark, path, ckpt, got3)
    assert got3 == []


def test_partition_columns_from_log(spark, tmp_path):
    """Partition columns are absent from Delta data files; the source
    must reattach them from add.partitionValues."""
    register_python_datasources(spark)
    path = str(tmp_path / "tp")
    t = TxnTable(path)
    t.write(
        _batch(spark, 0, 4, "a").union(_batch(spark, 4, 6, "b")),
        mode="overwrite",
        partition_by=["part"],
    )
    got: list[tuple] = []
    _run_available_now(spark, path, str(tmp_path / "ck"), got)
    assert sorted(got) == [
        (0, "a", 0.0), (1, "a", 2.0), (2, "a", 4.0), (3, "a", 6.0),
        (4, "b", 8.0), (5, "b", 10.0),
    ]


def test_remove_actions_refused_and_option_overrides(spark, tmp_path):
    register_python_datasources(spark)
    path = str(tmp_path / "td")
    t = TxnTable(path)
    # two single-part files so a full-file delete emits remove-only
    t.write(_batch(spark, 0, 4, "a"), mode="overwrite",
            partition_by=["part"])
    t.write(_batch(spark, 4, 8, "b"), mode="append")
    t.delete_where(spark, "part = 'b'")  # drops whole files: remove-only

    # default: the stream refuses the non-append commit
    got: list[tuple] = []
    with pytest.raises(Exception, match="ignoreDeletes|remove actions"):
        _run_available_now(spark, path, str(tmp_path / "ck1"), got)

    # ignoreDeletes: delete-only commit skipped, appends flow
    got2: list[tuple] = []
    _run_available_now(
        spark, path, str(tmp_path / "ck2"), got2, ignoreDeletes="true"
    )
    assert sorted(r[0] for r in got2) == list(range(8))

    # a REWRITE commit (update) needs ignoreChanges, not ignoreDeletes
    t.update_where(spark, "id = 1", {"v": "99.0"})
    got3: list[tuple] = []
    with pytest.raises(Exception, match="ignoreChanges|rewrites"):
        _run_available_now(
            spark, path, str(tmp_path / "ck3"), got3, ignoreDeletes="true"
        )
    got4: list[tuple] = []
    _run_available_now(
        spark, path, str(tmp_path / "ck4"), got4, ignoreChanges="true"
    )
    # rewritten file re-shipped: id 0..3 appear, id=1 carries v=99
    assert (1, "a", 99.0) in got4


def test_starting_version_skips_history(spark, tmp_path):
    register_python_datasources(spark)
    path = str(tmp_path / "ts")
    t = TxnTable(path)
    t.write(_batch(spark, 0, 5), mode="overwrite")   # v0
    t.write(_batch(spark, 5, 7), mode="append")      # v1
    t.write(_batch(spark, 7, 9), mode="append")      # v2
    got: list[tuple] = []
    _run_available_now(
        spark, path, str(tmp_path / "ck"), got, startingVersion="2"
    )
    assert sorted(r[0] for r in got) == [7, 8]


def test_max_commits_per_trigger_batches(spark, tmp_path):
    """Backpressure: maxCommitsPerTrigger=1 splits three commits into
    three micro-batches instead of one catch-up batch."""
    register_python_datasources(spark)
    path = str(tmp_path / "tb")
    t = TxnTable(path)
    t.write(_batch(spark, 0, 2), mode="overwrite")   # v0
    t.write(_batch(spark, 2, 4), mode="append")      # v1
    t.write(_batch(spark, 4, 6), mode="append")      # v2

    batches: list[list[int]] = []
    q = (
        spark.readStream.format("delta_stream")
        .option("path", path)
        .option("maxCommitsPerTrigger", "1")
        .load()
        .writeStream.foreachBatch(
            lambda df, _bid: batches.append(
                sorted(r["id"] for r in df.collect())
            )
        )
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(processingTime="1 second")
        .start()
    )
    import time

    deadline = time.time() + 90
    while time.time() < deadline and sum(len(b) for b in batches) < 6:
        time.sleep(1)
    q.stop()
    non_empty = [b for b in batches if b]
    assert non_empty == [[0, 1], [2, 3], [4, 5]]


def test_max_bytes_per_trigger_batches(spark, tmp_path):
    """maxBytesPerTrigger: a 1-byte budget still takes whole commits,
    one per micro-batch (the contract's never-fewer-than-one rule)."""
    register_python_datasources(spark)
    path = str(tmp_path / "tbb")
    t = TxnTable(path)
    t.write(_batch(spark, 0, 2), mode="overwrite")   # v0
    t.write(_batch(spark, 2, 4), mode="append")      # v1
    t.write(_batch(spark, 4, 6), mode="append")      # v2

    batches: list[list[int]] = []
    q = (
        spark.readStream.format("delta_stream")
        .option("path", path)
        .option("maxBytesPerTrigger", "1")
        .load()
        .writeStream.foreachBatch(
            lambda df, _bid: batches.append(
                sorted(r["id"] for r in df.collect())
            )
        )
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(processingTime="1 second")
        .start()
    )
    import time

    deadline = time.time() + 90
    while time.time() < deadline and sum(len(b) for b in batches) < 6:
        time.sleep(1)
    q.stop()
    non_empty = [b for b in batches if b]
    assert non_empty == [[0, 1], [2, 3], [4, 5]]


def _clean_log(path, upto):
    """Simulate Delta log cleanup: drop JSON commits < upto (the
    checkpoint at `upto` carries the state)."""
    import os

    log = os.path.join(path, "_delta_log")
    for v in range(upto):
        p = os.path.join(log, f"{v:020d}.json")
        if os.path.exists(p):
            os.remove(p)


def test_first_available_bootstraps_from_checkpoint(spark, tmp_path):
    """A log whose early commits were cleaned refuses a plain tail
    (gap), but startingVersion=first-available ships the parquet-
    checkpoint snapshot as the first batch and then tails — no manual
    version math; restart stays exactly-once."""
    register_python_datasources(spark)
    path = str(tmp_path / "tfa")
    t = TxnTable(path)
    t.write(_batch(spark, 0, 2), mode="overwrite")           # v0
    for i in range(1, 12):                                    # v1..v11
        t.write(_batch(spark, 2 * i, 2 * i + 2), mode="append")
    _clean_log(path, 10)  # checkpoint interval is 10 -> cp at v10

    # default numeric start inside the gap still raises
    with pytest.raises(Exception, match="vacuumed|not all present"):
        _run_available_now(spark, path, str(tmp_path / "ck0"), [])

    got: list[tuple] = []
    ckpt = str(tmp_path / "ck1")
    _run_available_now(
        spark, path, ckpt, got, startingVersion="first-available"
    )
    assert sorted(r[0] for r in got) == list(range(24))

    # restart: only the NEW commit arrives, never a snapshot replay
    t.write(_batch(spark, 24, 26), mode="append")            # v12
    got2: list[tuple] = []
    _run_available_now(
        spark, path, ckpt, got2, startingVersion="first-available"
    )
    assert sorted(r[0] for r in got2) == [24, 25]


def test_starting_version_latest_tails_only_future(spark, tmp_path):
    register_python_datasources(spark)
    path = str(tmp_path / "tl")
    t = TxnTable(path)
    t.write(_batch(spark, 0, 5), mode="overwrite")   # v0
    t.write(_batch(spark, 5, 7), mode="append")      # v1

    got: list[tuple] = []
    ckpt = str(tmp_path / "ck")
    _run_available_now(spark, path, ckpt, got, startingVersion="latest")
    assert got == []  # history skipped

    t.write(_batch(spark, 7, 9), mode="append")      # v2
    got2: list[tuple] = []
    _run_available_now(spark, path, ckpt, got2, startingVersion="latest")
    assert sorted(r[0] for r in got2) == [7, 8]


def test_column_mapped_tables_stream(spark, tmp_path):
    """Column-mapped foreign tables stream correctly: the executor
    pyarrow read resolves PHYSICAL names ("name" mode) or parquet
    FIELD IDS ("id" mode) and emits logical columns — formerly a
    refusal."""
    import json
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    def _mk(table, mode, with_ids):
        os.makedirs(table)
        log = os.path.join(table, "_delta_log")
        os.makedirs(log)
        if with_ids:
            sch = pa.schema(
                [
                    pa.field("col-1", pa.int64(),
                             metadata={b"PARQUET:field_id": b"1"}),
                    pa.field("col-2", pa.string(),
                             metadata={b"PARQUET:field_id": b"2"}),
                ]
            )
        else:
            sch = pa.schema([("col-1", pa.int64()), ("col-2", pa.string())])
        fp = os.path.join(table, "f0.parquet")
        pq.write_table(
            pa.table(
                {"col-1": pa.array([1, 2], pa.int64()),
                 "col-2": pa.array(["x", "y"], pa.string())},
                schema=sch,
            ),
            fp,
        )
        schema = json.dumps(
            {
                "type": "struct",
                "fields": [
                    {"name": "id", "type": "long", "nullable": True,
                     "metadata": {"delta.columnMapping.id": 1,
                                  "delta.columnMapping.physicalName":
                                  "col-1"}},
                    {"name": "name", "type": "string", "nullable": True,
                     "metadata": {"delta.columnMapping.id": 2,
                                  "delta.columnMapping.physicalName":
                                  "col-2"}},
                ],
            }
        )
        with open(os.path.join(log, f"{0:020d}.json"), "w") as fh:
            for a in [
                {"protocol": {"minReaderVersion": 2,
                              "minWriterVersion": 5}},
                {"metaData": {"id": f"cm-{mode}",
                              "format": {"provider": "parquet",
                                         "options": {}},
                              "schemaString": schema,
                              "partitionColumns": [],
                              "configuration": {
                                  "delta.columnMapping.mode": mode},
                              "createdTime": 1700000000000}},
                {"add": {"path": "f0.parquet", "partitionValues": {},
                         "size": os.path.getsize(fp),
                         "modificationTime": 1700000001000,
                         "dataChange": True,
                         "stats": json.dumps({"numRecords": 2})}},
                {"commitInfo": {"timestamp": 1700000001000,
                                "operation": "WRITE"}},
            ]:
                fh.write(json.dumps(a) + "\n")
        return table

    register_python_datasources(spark)
    for i, (mode, with_ids) in enumerate(
        [("name", False), ("id", True)]
    ):
        table = _mk(str(tmp_path / f"cm{i}"), mode, with_ids)
        got: list[tuple] = []
        q = (
            spark.readStream.format("delta_stream")
            .option("path", table)
            .load()
            .writeStream.foreachBatch(
                lambda b, _id, acc=got: acc.extend(
                    (r["id"], r["name"]) for r in b.collect()
                )
            )
            .option("checkpointLocation", str(tmp_path / f"ck{i}"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        assert sorted(got) == [(1, "x"), (2, "y")], mode


def test_read_change_feed_stream(spark, tmp_path):
    """readChangeFeed: the stream ships row-level changes with
    _change_type/_commit_version/_commit_timestamp — inserts from
    append commits, deletes from remove-only commits (partition values
    recovered from the prior snapshot), rewrites refused."""
    register_python_datasources(spark)
    path = str(tmp_path / "tcdf")
    t = TxnTable(path)
    t.write(_batch(spark, 0, 3, "a"), mode="overwrite",
            partition_by=["part"])                       # v0
    t.write(_batch(spark, 3, 5, "b"), mode="append")     # v1
    t.delete_where(spark, "part = 'b'")                  # v2 remove-only

    got: list[tuple] = []
    q = (
        spark.readStream.format("delta_stream")
        .option("path", path)
        .option("readChangeFeed", "true")
        .load()
        .writeStream.foreachBatch(
            lambda df, _bid: got.extend(
                (r["id"], r["part"], r["_change_type"],
                 r["_commit_version"]) for r in df.collect()
            )
        )
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert sorted(r for r in got if r[2] == "insert") == [
        (0, "a", "insert", 0), (1, "a", "insert", 0),
        (2, "a", "insert", 0),
        (3, "b", "insert", 1), (4, "b", "insert", 1),
    ]
    assert sorted(r for r in got if r[2] == "delete") == [
        (3, "b", "delete", 2), (4, "b", "delete", 2),
    ]

    # a rewrite commit poisons the CDF tail — the stream must refuse
    t.update_where(spark, "id = 1", {"v": "42.0"})
    with pytest.raises(Exception, match="rewrites|cdc"):
        got2: list[tuple] = []
        _run_available_now(
            spark, path, str(tmp_path / "ck"), got2,
            readChangeFeed="true",
        )


def test_foreign_dv_add_refused_in_tail(spark, tmp_path):
    """A foreign commit whose add carries a spec deletionVector must be
    REFUSED by the stream tail — shipping the whole file would
    resurrect the DV-deleted rows (round-7 audit)."""
    import json
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from data_lakehouse_project_spark.operators.dv import (
        rbm_array_serialize,
        z85_encode,
    )

    table = str(tmp_path / "fdv")
    os.makedirs(table)
    fp = os.path.join(table, "f0.parquet")
    pq.write_table(
        pa.table({"id": pa.array([0, 1, 2], pa.int64()),
                  "part": pa.array(["a"] * 3, pa.string()),
                  "v": pa.array([0.0, 2.0, 4.0], pa.float64())}),
        fp,
    )
    blob = rbm_array_serialize([1], pad4=True)
    log = os.path.join(table, "_delta_log")
    os.makedirs(log)
    schema = json.dumps(
        {
            "type": "struct",
            "fields": [
                {"name": "id", "type": "long", "nullable": True,
                 "metadata": {}},
                {"name": "part", "type": "string", "nullable": True,
                 "metadata": {}},
                {"name": "v", "type": "double", "nullable": True,
                 "metadata": {}},
            ],
        }
    )
    with open(os.path.join(log, f"{0:020d}.json"), "w") as fh:
        for a in [
            {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                          "readerFeatures": ["deletionVectors"],
                          "writerFeatures": ["deletionVectors"]}},
            {"metaData": {"id": "x", "format": {"provider": "parquet",
                                                "options": {}},
                          "schemaString": schema,
                          "partitionColumns": [], "configuration": {},
                          "createdTime": 1700000000000}},
            {"add": {"path": "f0.parquet", "partitionValues": {},
                     "size": os.path.getsize(fp),
                     "modificationTime": 1700000001000,
                     "dataChange": True,
                     "stats": json.dumps({"numRecords": 3}),
                     "deletionVector": {"storageType": "i",
                                        "pathOrInlineDv": z85_encode(blob),
                                        "sizeInBytes": len(blob),
                                        "cardinality": 1}}},
            {"commitInfo": {"timestamp": 1700000001000,
                            "operation": "WRITE"}},
        ]:
            fh.write(json.dumps(a) + "\n")

    register_python_datasources(spark)
    with pytest.raises(Exception, match="deletion-vector|deletionVector"):
        _run_available_now(spark, table, str(tmp_path / "ck"), [])


def test_cdf_first_available_bootstraps_snapshot_as_inserts(
    spark, tmp_path
):
    """readChangeFeed + startingVersion=first-available over a
    log-cleaned table: the checkpoint snapshot is emitted as `insert`
    changes stamped with the snapshot version (explicit
    emitted-from-version semantics), then the tail replays exactly the
    post-checkpoint changes — no manual version math, restart stays
    exactly-once."""
    register_python_datasources(spark)
    path = str(tmp_path / "tcfa")
    t = TxnTable(path)
    t.write(_batch(spark, 0, 2), mode="overwrite")           # v0
    for i in range(1, 12):                                    # v1..v11
        t.write(_batch(spark, 2 * i, 2 * i + 2), mode="append")
    _clean_log(path, 10)  # checkpoint at v10 carries the state

    def _run_cdf(ckpt, sink):
        q = (
            spark.readStream.format("delta_stream")
            .option("path", path)
            .option("readChangeFeed", "true")
            .option("startingVersion", "first-available")
            .load()
            .writeStream.foreachBatch(
                lambda df, _bid: sink.extend(
                    (r["id"], r["_change_type"], r["_commit_version"])
                    for r in df.collect()
                )
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    got: list[tuple] = []
    ckpt = str(tmp_path / "ck1")
    _run_cdf(ckpt, got)
    assert sorted(r[0] for r in got) == list(range(24))
    assert {r[1] for r in got} == {"insert"}
    # every bootstrap row is stamped with the snapshot version (the
    # latest reconstructable version, 11 here)
    assert {r[2] for r in got} == {11}

    # restart: only the NEW commit's changes, stamped with their own
    # commit version — never a snapshot replay
    t.write(_batch(spark, 24, 26), mode="append")            # v12
    got2: list[tuple] = []
    _run_cdf(ckpt, got2)
    assert sorted(got2) == [(24, "insert", 12), (25, "insert", 12)]


def test_foreign_dv_add_ships_live_rows_with_ignore_changes(
    spark, tmp_path
):
    """With ignoreChanges set, a DV-bearing add ships its LIVE rows
    (excluded row indexes) instead of refusing — what a DV-aware Delta
    source emits for a rewritten file."""
    import json
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from data_lakehouse_project_spark.operators.dv import (
        rbm_array_serialize,
        z85_encode,
    )

    table = str(tmp_path / "fdvi")
    os.makedirs(table)
    fp = os.path.join(table, "f0.parquet")
    pq.write_table(
        pa.table({"id": pa.array([0, 1, 2], pa.int64()),
                  "part": pa.array(["a"] * 3, pa.string()),
                  "v": pa.array([0.0, 2.0, 4.0], pa.float64())}),
        fp,
    )
    blob = rbm_array_serialize([1], pad4=True)
    log = os.path.join(table, "_delta_log")
    os.makedirs(log)
    schema = json.dumps(
        {
            "type": "struct",
            "fields": [
                {"name": "id", "type": "long", "nullable": True,
                 "metadata": {}},
                {"name": "part", "type": "string", "nullable": True,
                 "metadata": {}},
                {"name": "v", "type": "double", "nullable": True,
                 "metadata": {}},
            ],
        }
    )
    with open(os.path.join(log, f"{0:020d}.json"), "w") as fh:
        for a in [
            {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                          "readerFeatures": ["deletionVectors"],
                          "writerFeatures": ["deletionVectors"]}},
            {"metaData": {"id": "x", "format": {"provider": "parquet",
                                                "options": {}},
                          "schemaString": schema,
                          "partitionColumns": [], "configuration": {},
                          "createdTime": 1700000000000}},
            {"add": {"path": "f0.parquet", "partitionValues": {},
                     "size": os.path.getsize(fp),
                     "modificationTime": 1700000001000,
                     "dataChange": True,
                     "stats": json.dumps({"numRecords": 3}),
                     "deletionVector": {"storageType": "i",
                                        "pathOrInlineDv": z85_encode(blob),
                                        "sizeInBytes": len(blob),
                                        "cardinality": 1}}},
            {"commitInfo": {"timestamp": 1700000001000,
                            "operation": "WRITE"}},
        ]:
            fh.write(json.dumps(a) + "\n")

    register_python_datasources(spark)
    got: list[tuple] = []
    _run_available_now(
        spark, table, str(tmp_path / "ck"), got, ignoreChanges="true"
    )
    assert sorted(r[0] for r in got) == [0, 2]  # row index 1 excluded


def test_starting_timestamp_resolves_to_commit(spark, tmp_path):
    """startingTimestamp = the first commit at-or-after the given
    epoch-ms; a timestamp past the newest commit tails only future
    commits (delta-spark parity)."""
    from data_lakehouse_project_spark.operators.delta_reader import (
        _commit_timestamp_ms,
    )

    register_python_datasources(spark)
    path = str(tmp_path / "tst")
    t = TxnTable(path)
    t.write(_batch(spark, 0, 2), mode="overwrite")   # v0
    t.write(_batch(spark, 2, 4), mode="append")      # v1
    t.write(_batch(spark, 4, 6), mode="append")      # v2
    ts1 = _commit_timestamp_ms(path, 1)

    got: list[tuple] = []
    _run_available_now(
        spark, path, str(tmp_path / "ck1"), got,
        startingTimestamp=str(ts1),
    )
    assert sorted(r[0] for r in got) == [2, 3, 4, 5]

    got2: list[tuple] = []
    _run_available_now(
        spark, path, str(tmp_path / "ck2"), got2,
        startingTimestamp=str(ts1 + 10**9),
    )
    assert got2 == []  # nothing yet at that clock


def test_max_files_per_trigger(spark, tmp_path):
    """maxFilesPerTrigger: whole commits until the cumulative add-file
    count crosses the budget; always at least one commit per batch."""
    register_python_datasources(spark)
    path = str(tmp_path / "tmf")
    t = TxnTable(path)
    for i in range(3):  # 3 single-file commits
        t.write(
            _batch(spark, 2 * i, 2 * i + 2).coalesce(1),
            mode="overwrite" if i == 0 else "append",
        )
    batches: list[list[int]] = []
    q = (
        spark.readStream.format("delta_stream")
        .option("path", path)
        .option("maxFilesPerTrigger", "1")
        .load()
        .writeStream.foreachBatch(
            lambda df, _bid: batches.append(
                sorted(r["id"] for r in df.collect())
            )
        )
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(processingTime="1 second")
        .start()
    )
    import time

    deadline = time.time() + 90
    while time.time() < deadline and sum(len(b) for b in batches) < 6:
        time.sleep(1)
    q.stop()
    non_empty = [b for b in batches if b]
    assert non_empty == [[0, 1], [2, 3], [4, 5]]
