"""The foreign readers' high-file-count fast path
(sources/arrow_scan.py): per-file arrow partitions instead of Spark's
O(files) driver InMemoryFileIndex.  Every test runs the SAME table
through both paths and requires identical rows — the fast path is an
execution strategy, never a semantics change."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from data_lakehouse_project_spark.operators.delta_export import (
    export_delta_snapshot,
)
from data_lakehouse_project_spark.operators.delta_reader import (
    read_delta_table,
)
from data_lakehouse_project_spark.operators.delta_writer import (
    delete_from_delta,
)
from data_lakehouse_project_spark.operators.iceberg_export import (
    export_iceberg_metadata,
)
from data_lakehouse_project_spark.operators.iceberg_reader import (
    read_iceberg_table,
)
from data_lakehouse_project_spark.operators.iceberg_writer import (
    append_to_iceberg,
    delete_from_iceberg,
)
from data_lakehouse_project_spark.operators.txnlog import TxnTable


def _rows(df):
    return sorted(map(tuple, df.collect()))


@pytest.fixture
def force_fast(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_ARROW_SCAN_FILES", "1")


def _both(monkeypatch, fn):
    monkeypatch.setenv("SPARK_GRAFT_ARROW_SCAN_FILES", "1")
    fast = fn()
    assert "graft_arrow_scan" in fast._jdf.queryExecution().toString()
    monkeypatch.setenv("SPARK_GRAFT_ARROW_SCAN_FILES", "10000000")
    slow = fn()
    assert "graft_arrow_scan" not in slow._jdf.queryExecution().toString()
    return fast, slow


def test_iceberg_fast_path_equals_jvm_path(spark, tmp_path, monkeypatch):
    t = TxnTable(str(tmp_path / "t"))
    df = spark.range(0, 300).selectExpr(
        "id", "CAST(id % 7 AS STRING) AS part", "CAST(id AS DOUBLE) AS v"
    )
    t.write(df, mode="overwrite", partition_by=["part"])
    export_iceberg_metadata(t, spark)
    delete_from_iceberg(spark, t.path, "id % 11 = 3")   # pos deletes
    append_to_iceberg(
        spark,
        spark.createDataFrame(
            [(900, "9", 1.5)], "id long, part string, v double"
        ),
        t.path,
    )
    fast, slow = _both(
        monkeypatch, lambda: read_iceberg_table(spark, t.path)
    )
    assert _rows(fast) == _rows(slow)
    # identity-partition consts surfaced (column absent from files)
    assert fast.where("part = '9'").count() == 1


def test_iceberg_fast_path_prune_reapplies(spark, tmp_path, force_fast):
    t = TxnTable(str(tmp_path / "t"))
    t.write(
        spark.range(0, 100).selectExpr(
            "id", "CAST(id % 3 AS STRING) AS part", "id * 2.0 AS v"
        ),
        mode="overwrite",
        partition_by=["part"],
    )
    export_iceberg_metadata(t, spark)
    got = read_iceberg_table(spark, t.path, prune=[("part", "=", "1")])
    assert got.count() == 33
    assert {r.part for r in got.select("part").distinct().collect()} == {
        "1"
    }


def test_delta_fast_path_equals_jvm_path(spark, tmp_path, monkeypatch):
    t = TxnTable(str(tmp_path / "src"))
    df = spark.range(0, 300).selectExpr(
        "id", "CAST(id % 5 AS STRING) AS part", "CAST(id AS DOUBLE) AS v"
    )
    t.write(df, mode="overwrite", partition_by=["part"])
    out = str(tmp_path / "mirror")
    export_delta_snapshot(spark, t.path, out)
    delete_from_delta(  # deletion vectors -> per-file dead positions
        spark, out, "id % 13 = 4", allow_protocol_upgrade=True
    )
    fast, slow = _both(
        monkeypatch, lambda: read_delta_table(spark, out)
    )
    assert _rows(fast) == _rows(slow)
    assert fast.count() == 277


def test_delta_fast_path_gates_on_partition_type(
    spark, tmp_path, force_fast
):
    """A timestamp-typed partition column (not in the coercible set)
    keeps the JVM path — gating, not silent misreads."""
    t = TxnTable(str(tmp_path / "src"))
    t.write(
        spark.range(0, 10).selectExpr(
            "id", "timestamp'2024-01-02 03:00:00' + make_interval("
            "0,0,0,0,id) AS ts"
        ),
        mode="overwrite",
        partition_by=["ts"],
    )
    out = str(tmp_path / "tsmirror")
    export_delta_snapshot(spark, t.path, out)
    got = read_delta_table(spark, out)
    assert "graft_arrow_scan" not in got._jdf.queryExecution().toString()
    assert got.count() == 10


def test_bundling_groups_small_files(spark, tmp_path, force_fast):
    """10 tiny files bundle into ONE task (far under 128 MB), and the
    rows still come back complete."""
    t = TxnTable(str(tmp_path / "t"))
    t.write(
        spark.range(0, 10).repartition(10).selectExpr(
            "id", "id * 1.0 AS v"
        ),
        mode="overwrite",
    )
    export_iceberg_metadata(t, spark)
    df = read_iceberg_table(spark, t.path)
    assert df.rdd.getNumPartitions() == 1
    assert sorted(r.id for r in df.collect()) == list(range(10))


def test_changelog_scans_route_through_arrow(
    spark, tmp_path, force_fast
):
    """read_iceberg_changelog's insert/delete branches take the arrow
    plan at high file counts (forced via the env gate here) and emit
    the same change rows as the JVM path — provenance columns
    (__ice_path/__ice_pos) join correctly."""
    import os as _os

    from data_lakehouse_project_spark.operators.iceberg_reader import (
        read_iceberg_changelog,
    )

    t = TxnTable(str(tmp_path / "t"))
    t.write(
        spark.range(0, 60).repartition(6).selectExpr(
            "id", "CAST(id % 3 AS STRING) AS part",
            "CAST(id AS DOUBLE) AS v",
        ),
        mode="overwrite",
        partition_by=["part"],
    )
    export_iceberg_metadata(t, spark)
    delete_from_iceberg(spark, t.path, "id % 7 = 2")
    fast = sorted(
        (r._change_type, r.id, r.part)
        for r in read_iceberg_changelog(spark, t.path).collect()
    )
    _os.environ["SPARK_GRAFT_ARROW_SCAN_FILES"] = "10000000"
    slow = sorted(
        (r._change_type, r.id, r.part)
        for r in read_iceberg_changelog(spark, t.path).collect()
    )
    assert fast == slow
    assert all(p is not None for _, _, p in fast)


def test_delta_cdf_plain_branch_routes_through_arrow(
    spark, tmp_path, force_fast
):
    """read_delta_changes' multi-file insert branch takes the arrow
    plan at the file-count gate — change rows identical to the JVM
    path, per-commit metadata attached through the emitted path."""
    import os as _os

    from data_lakehouse_project_spark.operators.delta_cdf import (
        read_delta_changes,
    )

    t = TxnTable(str(tmp_path / "src"))
    t.write(
        spark.range(0, 30).selectExpr(
            "id", "CAST(id % 3 AS STRING) AS part", "id * 1.0 AS v"
        ),
        mode="overwrite",
        partition_by=["part"],
    )
    out = str(tmp_path / "mirror")
    export_delta_snapshot(spark, t.path, out)
    delete_from_delta(
        spark, out, "id % 4 = 1", allow_protocol_upgrade=True
    )

    def _ch():
        return sorted(
            (r._commit_version, r._change_type, r.id, r.part)
            for r in read_delta_changes(spark, out).collect()
        )

    fast = _ch()
    _os.environ["SPARK_GRAFT_ARROW_SCAN_FILES"] = "10000000"
    slow = _ch()
    assert fast == slow
    assert all(p is not None for *_, p in fast)
