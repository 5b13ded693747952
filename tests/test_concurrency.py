"""Optimistic-concurrency retry (operators/concurrency.py): lost
exclusive-create races raise ConcurrentCommitError; commit_with_retries
re-invokes the writer (which re-reads the snapshot and re-validates),
so interleaved appenders all land; exhausted retries and validation
failures surface cleanly."""

from __future__ import annotations

import os

import pytest

from data_lakehouse_project_spark.operators.concurrency import (
    ConcurrentCommitError,
    commit_with_retries,
)
from data_lakehouse_project_spark.operators.delta_export import (
    export_delta_snapshot,
)
from data_lakehouse_project_spark.operators.delta_reader import (
    read_delta_snapshot,
    read_delta_table,
)
from data_lakehouse_project_spark.operators.delta_writer import (
    append_to_delta,
    update_from_delta,
)
from data_lakehouse_project_spark.operators.txnlog import TxnTable


def _batch(spark, lo, hi, part="p0"):
    return spark.range(lo, hi).selectExpr(
        "id", f"'{part}' AS part", "id * 2.0 AS v"
    )


def _foreign(spark, tmp_path, name="f", lo=0, hi=4):
    t = TxnTable(str(tmp_path / f"src_{name}"))
    t.write(_batch(spark, lo, hi), mode="overwrite")
    out = str(tmp_path / f"ext_{name}")
    export_delta_snapshot(spark, t.path, out)
    return out


def test_interleaved_appenders_both_land(spark, tmp_path):
    """Writer B steals A's target version mid-flight; A's retry
    re-reads the new snapshot and lands at the next version."""
    table = _foreign(spark, tmp_path)
    import data_lakehouse_project_spark.operators.delta_writer as dw

    orig = dw._stage_parquet_adds
    stole = {"done": False}

    def hijack(*args, **kwargs):
        # B commits between A's staging and A's exclusive create
        out = orig(*args, **kwargs)
        if not stole["done"]:
            stole["done"] = True
            append_to_delta(spark, _batch(spark, 100, 102), table)
        return out

    dw._stage_parquet_adds = hijack
    try:
        info = commit_with_retries(
            append_to_delta, spark, _batch(spark, 4, 6), table,
        )
    finally:
        dw._stage_parquet_adds = orig
    assert info["version"] == 2  # B took 1, A retried into 2
    got = sorted(r.id for r in read_delta_table(spark, table).collect())
    assert got == [0, 1, 2, 3, 4, 5, 100, 101]
    # the loser's first-attempt orphaned files were rolled back:
    # every root parquet is referenced by the snapshot
    snap = read_delta_snapshot(table)
    referenced = {f["path"] for f in snap.files}
    on_disk = {
        n for n in os.listdir(table)
        if n.endswith(".parquet")
    }
    assert on_disk <= referenced


def test_exhausted_retries_surface_conflict(spark, tmp_path):
    table = _foreign(spark, tmp_path)

    def always_loses(*a, **k):
        raise ConcurrentCommitError("synthetic standing conflict")

    with pytest.raises(ConcurrentCommitError, match="synthetic"):
        commit_with_retries(always_loses, retries=2)


def test_validation_failures_do_not_retry(spark, tmp_path):
    """A constraint-class failure (here: unknown SET column) is not a
    commit race — it must raise immediately, not loop."""
    table = _foreign(spark, tmp_path)
    calls = {"n": 0}

    def op():
        calls["n"] += 1
        return update_from_delta(
            spark, table, "id = 0", {"zzz": "1"},
            allow_protocol_upgrade=True,
        )

    with pytest.raises(ValueError, match="unknown columns"):
        commit_with_retries(op)
    assert calls["n"] == 1


def test_iceberg_interleaved_appenders(spark, tmp_path):
    from data_lakehouse_project_spark.operators.iceberg_export import (
        export_iceberg_metadata,
    )
    from data_lakehouse_project_spark.operators.iceberg_reader import (
        read_iceberg_table,
    )
    from data_lakehouse_project_spark.operators.iceberg_writer import (
        append_to_iceberg,
    )
    import data_lakehouse_project_spark.operators.iceberg_writer as iw

    path = str(tmp_path / "it")
    t = TxnTable(path)
    t.write(
        spark.range(0, 4).selectExpr(
            "id", "'a' AS part", "CAST(id AS DOUBLE) AS v"
        ),
        mode="overwrite",
    )
    export_iceberg_metadata(t, spark)

    orig = iw._stage_iceberg_data
    stole = {"done": False}

    def hijack(*args, **kwargs):
        out = orig(*args, **kwargs)
        if not stole["done"]:
            stole["done"] = True
            iw._stage_iceberg_data = orig
            append_to_iceberg(
                spark,
                spark.range(100, 102).selectExpr(
                    "id", "'a' AS part", "CAST(id AS DOUBLE) AS v"
                ),
                path,
            )
            iw._stage_iceberg_data = hijack
        return out

    iw._stage_iceberg_data = hijack
    try:
        info = commit_with_retries(
            append_to_iceberg,
            spark,
            spark.range(4, 6).selectExpr(
                "id", "'a' AS part", "CAST(id AS DOUBLE) AS v"
            ),
            path,
        )
    finally:
        iw._stage_iceberg_data = orig
    assert info["snapshot_id"] is not None
    got = sorted(r.id for r in read_iceberg_table(spark, path).collect())
    assert got == [0, 1, 2, 3, 4, 5, 100, 101]
