"""MERGE/upsert semantics (Delta-style API with parquet fallback)."""

from __future__ import annotations

from data_lakehouse_project_spark.operators.upsert import (
    merge_into_path,
    merge_upsert,
)


def test_merge_upsert_dataframe(spark):
    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "id long, v string, x double"
    )
    source = spark.createDataFrame(
        [(2, "B", 99.0), (4, "d", 40.0)], "id long, v string, x double"
    )
    out = merge_upsert(target, source, ["id"])
    got = {r.id: (r.v, r.x) for r in out.collect()}
    assert got == {1: ("a", 10.0), 2: ("B", 99.0), 3: ("c", 30.0), 4: ("d", 40.0)}


def test_merge_into_path_parquet_fallback(spark, tmp_path):
    path = str(tmp_path / "tbl")
    base = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    merge_into_path(spark, path, base, ["id"], fmt="parquet")
    assert spark.read.parquet(path).count() == 2

    batch = spark.createDataFrame([(2, "B"), (3, "c")], "id long, v string")
    merge_into_path(spark, path, batch, ["id"], fmt="parquet")
    got = {r.id: r.v for r in spark.read.parquet(path).collect()}
    assert got == {1: "a", 2: "B", 3: "c"}


def test_merge_idempotent(spark, tmp_path):
    """Re-applying the same batch changes nothing (overwrite = rerun)."""
    path = str(tmp_path / "tbl2")
    batch = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    merge_into_path(spark, path, batch, ["id"], fmt="parquet")
    merge_into_path(spark, path, batch, ["id"], fmt="parquet")
    assert spark.read.parquet(path).count() == 2


def test_merge_partitioned_dynamic_overwrite(spark, tmp_path):
    path = str(tmp_path / "tbl3")
    base = spark.createDataFrame(
        [(1, "p1", "a"), (2, "p2", "b")], "id long, pt string, v string"
    )
    merge_into_path(spark, path, base, ["id"], fmt="parquet", partition_by=["pt"])
    batch = spark.createDataFrame([(2, "p2", "B")], "id long, pt string, v string")
    merge_into_path(spark, path, batch, ["id"], fmt="parquet", partition_by=["pt"])
    got = {r.id: r.v for r in spark.read.parquet(path).collect()}
    assert got == {1: "a", 2: "B"}
