"""Iceberg-spec conformance of the metadata export (round 5).

pyiceberg and duckdb's iceberg extension are not installable offline
(probe below), so conformance is pinned by an independent reader here
that follows the public table spec: version-hint → vN.metadata.json →
current snapshot → avro manifest list → avro manifest → data files —
then scans those files with DuckDB and compares against
``TxnTable.read``. Avro container files are decoded through the Java
avro library on Spark's classpath (generic reader — shares no code
with the export's writer path beyond the avro LIBRARY itself).
"""

from __future__ import annotations

import datetime
import json
import os

import duckdb
import pytest

from data_lakehouse_project_spark.operators.iceberg_export import (
    export_iceberg_metadata,
)
from data_lakehouse_project_spark.operators.txnlog import TxnTable


def _avro_records(spark, path: str) -> list[dict]:
    """Decode an avro container file to plain dicts (generic reader)."""
    jvm = spark._jvm
    reader = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(path),
        jvm.org.apache.avro.generic.GenericDatumReader(),
    )
    schema = reader.getSchema()
    names = [
        str(schema.getFields().get(i).name())
        for i in range(schema.getFields().size())
    ]

    def _py(v):
        if v is None:
            return None
        cls = v.getClass().getName() if hasattr(v, "getClass") else None
        if cls == "org.apache.avro.util.Utf8":
            return str(v)
        if cls and cls.startswith("org.apache.avro.generic.GenericData$Record"):
            s = v.getSchema()
            return {
                str(s.getFields().get(i).name()): _py(
                    v.get(str(s.getFields().get(i).name()))
                )
                for i in range(s.getFields().size())
            }
        return v

    out = []
    while reader.hasNext():
        rec = reader.next()
        out.append({n: _py(rec.get(n)) for n in names})
    meta = {
        k: bytes(reader.getMeta(k)).decode()
        for k in ("schema", "partition-spec", "format-version", "content")
        if reader.getMeta(k) is not None
    }
    reader.close()
    return out, meta


def read_iceberg_table(spark, table_path: str):
    """Independent spec walk; returns (metadata, manifest entries,
    duckdb rows over the snapshot's data files)."""
    meta_dir = os.path.join(table_path, "metadata")
    hint = int(open(os.path.join(meta_dir, "version-hint.text")).read())
    md = json.load(open(os.path.join(meta_dir, f"v{hint}.metadata.json")))

    # required v2 surface
    assert md["format-version"] == 2
    for key in (
        "table-uuid", "location", "last-sequence-number", "schemas",
        "current-schema-id", "partition-specs", "default-spec-id",
        "snapshots", "current-snapshot-id", "refs",
    ):
        assert key in md, f"metadata.json missing {key}"

    snap = next(
        s
        for s in md["snapshots"]
        if s["snapshot-id"] == md["current-snapshot-id"]
    )
    mlist, _ = _avro_records(spark, snap["manifest-list"])
    assert mlist and all("manifest_path" in m for m in mlist)
    entries = []
    for m in mlist:
        assert m["content"] == 0 and m["partition_spec_id"] == 0
        recs, mmeta = _avro_records(spark, m["manifest_path"])
        assert mmeta["format-version"] == "2" and mmeta["content"] == "data"
        json.loads(mmeta["schema"])  # embedded schema parses
        entries += [r for r in recs if r["status"] != 2]  # not DELETED

    cols = [f["name"] for f in md["schemas"][0]["fields"]]
    selects = []
    for e in entries:
        df = e["data_file"]
        assert df["file_format"] == "PARQUET" and df["content"] == 0
        fp = df["file_path"].replace("'", "''")
        proj = ", ".join(f'"{c}"' for c in cols)
        selects.append(f"SELECT {proj} FROM read_parquet('{fp}')")
    rows = duckdb.sql(" UNION ALL ".join(selects)).fetchall() if selects else []
    return md, entries, rows


def test_iceberg_export_plain_table(spark, tmp_path):
    from pyspark.sql import functions as F

    path = str(tmp_path / "tbl")
    t = TxnTable(path)
    df = spark.range(0, 150).select(
        "id", (F.col("id") % 5).alias("g"), (F.col("id") * 1.5).alias("v")
    )
    t.write(df, mode="overwrite")
    t.delete_where(spark, "g = 2")
    out = export_iceberg_metadata(t, spark)
    assert out.endswith("v1.metadata.json")

    md, entries, rows = read_iceberg_table(spark, path)
    assert sorted(rows) == sorted(tuple(r) for r in t.read(spark).collect())
    assert sum(e["data_file"]["record_count"] for e in entries) == 120
    # field ids are assigned and contiguous
    assert [f["id"] for f in md["schemas"][0]["fields"]] == [1, 2, 3]

    # re-export after another commit: new metadata version, new snapshot
    t.write(spark.range(1000, 1010).select(
        "id", (F.col("id") % 5).alias("g"), (F.col("id") * 1.5).alias("v")
    ), mode="append")
    out2 = export_iceberg_metadata(t, spark)
    assert out2.endswith("v2.metadata.json")
    md2, _, rows2 = read_iceberg_table(spark, path)
    assert len(md2["snapshots"]) == 2
    assert len(rows2) == 130


def test_iceberg_export_transform_partitioning(spark, tmp_path):
    """Hidden transforms export as NATIVE Iceberg transforms with typed
    partition values (day → days-from-epoch int), not identity strings."""
    path = str(tmp_path / "tbl")
    t = TxnTable(path)
    rows = [
        (i, datetime.datetime(2024, 3, 1 + i % 4, 10)) for i in range(80)
    ]
    t.write(
        spark.createDataFrame(rows, "id long, ts timestamp"),
        mode="overwrite",
        partition_by=["day(ts)"],
    )
    export_iceberg_metadata(t, spark)
    md, entries, rows_out = read_iceberg_table(spark, path)

    (pf,) = md["partition-specs"][0]["fields"]
    assert pf["transform"] == "day"
    assert pf["source-id"] == 2  # ts is the second schema field
    assert pf["field-id"] == 1000

    days = {
        e["data_file"]["partition"][pf["name"]] for e in entries
    }
    want = {
        (datetime.date(2024, 3, 1 + d) - datetime.date(1970, 1, 1)).days
        for d in range(4)
    }
    assert days == want
    assert {r[0] for r in rows_out} == set(range(80))


def test_iceberg_export_bucket_and_identity(spark, tmp_path):
    from pyspark.sql import functions as F

    path = str(tmp_path / "tbl")
    t = TxnTable(path)
    df = spark.range(0, 200).select(
        "id",
        (F.col("id") % 3).cast("string").alias("region"),
        (F.col("id") * 2).alias("v"),
    )
    t.write(
        df, mode="overwrite", partition_by=["region", "bucket(4, id)"]
    )
    export_iceberg_metadata(t, spark)
    md, entries, rows_out = read_iceberg_table(spark, path)
    specs = {f["transform"] for f in md["partition-specs"][0]["fields"]}
    assert specs == {"identity", "bucket[4]"}
    assert len(rows_out) == 200
    # identity partition values carry the source type (string region)
    regions = {
        e["data_file"]["partition"]["region"] for e in entries
    }
    assert regions == {"0", "1", "2"}


def test_iceberg_readers_unavailable_offline_probe():
    for mod in ("pyiceberg",):
        with pytest.raises(ImportError):
            __import__(mod)
    with pytest.raises(Exception):
        duckdb.sql("LOAD iceberg")


def test_export_dv_table_emits_position_deletes(spark, tmp_path):
    """Round-7 probe caught DV-bearing snapshots exporting as bare data
    files — every Iceberg reader would resurrect the deleted rows. The
    export now converts the internal (basename, pos) DV parquet to a
    spec position-delete file + delete manifest; the foreign reader
    (which applies position deletes) must agree with the table's own
    read, including after a SECOND DV delete + re-export."""
    from data_lakehouse_project_spark.operators.iceberg_export import (
        export_iceberg_metadata,
    )
    from data_lakehouse_project_spark.operators.iceberg_reader import (
        iceberg_live_files,
        read_iceberg_table,
    )
    from data_lakehouse_project_spark.operators.txnlog import TxnTable

    t = TxnTable(str(tmp_path / "dvx"))
    t.write(
        spark.range(0, 20).selectExpr("id", "id * 1.0 AS v"),
        mode="overwrite",
    )
    t.delete_where(spark, "id < 5", dv=True)
    export_iceberg_metadata(t, spark)
    got = sorted(r.id for r in read_iceberg_table(spark, t.path).collect())
    assert got == list(range(5, 20))
    _, _, pos, eq = iceberg_live_files(spark, t.path)
    assert len(pos) == 1 and not eq

    t.delete_where(spark, "id >= 18", dv=True)
    export_iceberg_metadata(t, spark)
    got2 = sorted(r.id for r in read_iceberg_table(spark, t.path).collect())
    assert got2 == sorted(r.id for r in t.read(spark).collect())
    assert got2 == list(range(5, 18))


def test_export_bounds_enable_foreign_prune(spark, tmp_path):
    """The export carries column bounds (spec binary single-values)
    from the internal footer stats, so the foreign reader FILE-SKIPS
    exported tables: two id-disjoint files, a selective predicate
    keeps exactly one driver-side, and results stay exact."""
    from data_lakehouse_project_spark.operators.iceberg_export import (
        export_iceberg_metadata,
    )
    from data_lakehouse_project_spark.operators.iceberg_reader import (
        _field_names_by_id,
        _field_types_by_id,
        _iceberg_file_may_match,
        _identity_partition_sources,
        iceberg_live_files,
        load_iceberg_metadata,
        read_iceberg_table,
    )
    from data_lakehouse_project_spark.operators.txnlog import TxnTable

    t = TxnTable(str(tmp_path / "b"))
    t.write(
        spark.range(0, 100).selectExpr("id", "id * 2.0 AS v").coalesce(1),
        mode="overwrite",
    )
    t.write(
        spark.range(1000, 1100)
        .selectExpr("id", "id * 2.0 AS v")
        .coalesce(1),
        mode="append",
    )
    export_iceberg_metadata(t, spark)

    md = load_iceberg_metadata(t.path)
    _, live, _, _ = iceberg_live_files(spark, t.path)
    assert len(live) == 2
    assert all(f.get("lower_bounds") for f in live)
    name2id = {v: k for k, v in _field_names_by_id(md).items()}
    typed = [
        (name2id["id"], ">=", 1000, _field_types_by_id(md)[name2id["id"]])
    ]
    part_of = _identity_partition_sources(md)
    kept = [f for f in live if _iceberg_file_may_match(f, typed, part_of)]
    assert len(kept) == 1  # the id<100 file is provably excluded

    got = read_iceberg_table(spark, t.path, prune=[("id", ">=", 1000)])
    assert sorted(r.id for r in got.collect()) == list(range(1000, 1100))


def test_incremental_export_statuses_and_changes(spark, tmp_path):
    """Re-export after new commits emits EXISTING entries for carried
    files (original snapshot attribution) and ADDED for new ones — so
    the incremental append scan over the engine's OWN exports
    attributes rows to the right snapshot; a snapshot that dropped
    files stops claiming 'append' and the incremental scan refuses."""
    from data_lakehouse_project_spark.operators.iceberg_reader import (
        UnsupportedIcebergFeature,
        iceberg_snapshot_ids,
        read_iceberg_changes,
        read_iceberg_table,
    )
    from data_lakehouse_project_spark.operators.txnlog import TxnTable

    path = str(tmp_path / "tinc")
    t = TxnTable(path)
    t.write(
        spark.range(0, 4).selectExpr("id", "id * 2.0 AS v"),
        mode="overwrite",
    )                                                   # internal v0
    export_iceberg_metadata(t, spark)                   # snapshot 1
    t.write(
        spark.range(4, 6).selectExpr("id", "id * 2.0 AS v"),
        mode="append",
    )                                                   # internal v1
    export_iceberg_metadata(t, spark)                   # snapshot 2

    sids = [s for s, _ in iceberg_snapshot_ids(path)]
    assert len(sids) == 2
    # incremental: only the appended rows belong to snapshot 2
    inc = read_iceberg_changes(
        spark, path, from_snapshot_id=sids[0]
    )
    assert sorted((r.id, r._snapshot_id) for r in inc.collect()) == [
        (4, sids[1]), (5, sids[1]),
    ]
    # full replay attributes each file to its adding snapshot
    full = read_iceberg_changes(spark, path)
    assert sorted((r.id, r._snapshot_id) for r in full.collect()) == [
        (0, sids[0]), (1, sids[0]), (2, sids[0]), (3, sids[0]),
        (4, sids[1]), (5, sids[1]),
    ]

    # a delete drops files -> the next export is NOT an append; the
    # incremental scan DELEGATES to the changelog (round 11): the
    # delete snapshot contributes no inserts, so the range is empty
    t.delete_where(spark, "id < 4")                     # internal v2
    export_iceberg_metadata(t, spark)                   # snapshot 3
    sids = [s for s, _ in iceberg_snapshot_ids(path)]
    got = read_iceberg_table(spark, path)
    assert sorted(r.id for r in got.collect()) == [4, 5]
    inc3 = read_iceberg_changes(spark, path, from_snapshot_id=sids[1])
    assert inc3.count() == 0
