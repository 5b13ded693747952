"""Snapshot drift report (operators/drift.py): identical snapshots are
stable, a shifted reload is flagged by PSI, null-rate drift surfaces."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_lakehouse_project_spark.operators.drift import (
    snapshot_drift_report,
)
from data_lakehouse_project_spark.operators.txnlog import TxnTable


def _load(spark, shift=0.0, null_every=0):
    df = spark.range(0, 2000).select(
        F.col("id"),
        (F.pmod(F.col("id") * 2654435761, F.lit(1000)) / 10.0 + shift).alias(
            "amount"
        ),
    )
    if null_every:
        df = df.withColumn(
            "amount",
            F.when(F.col("id") % null_every != 0, F.col("amount")),
        )
    return df


def test_identical_reload_is_stable(spark, tmp_path):
    t = TxnTable(str(tmp_path / "tbl"))
    t.write(_load(spark), mode="overwrite")  # v0
    t.write(_load(spark), mode="overwrite")  # v1: same distribution
    r = snapshot_drift_report(spark, t, ["amount"]).first()
    assert (r.version_a, r.version_b) == (0, 1)
    assert r.psi < 0.01
    assert abs(r.mean_a - r.mean_b) < 1e-9
    assert r.null_frac_a == 0.0 and r.null_frac_b == 0.0


def test_shifted_reload_flags_psi_and_moments(spark, tmp_path):
    t = TxnTable(str(tmp_path / "tbl"))
    t.write(_load(spark), mode="overwrite")
    t.write(_load(spark, shift=40.0), mode="overwrite")  # mean +40
    r = snapshot_drift_report(spark, t, ["amount"]).first()
    assert r.psi > 0.25  # "major shift" band
    assert 39 < r.mean_b - r.mean_a < 41


def test_null_rate_drift_surfaces(spark, tmp_path):
    t = TxnTable(str(tmp_path / "tbl"))
    t.write(_load(spark), mode="overwrite")
    t.write(_load(spark, null_every=4), mode="overwrite")  # 25% nulls
    r = snapshot_drift_report(spark, t, ["amount"]).first()
    assert r.null_frac_a == 0.0
    assert abs(r.null_frac_b - 0.25) < 0.01
    # non-null values kept the same distribution -> PSI stays low
    assert r.psi < 0.05


def test_explicit_version_pair(spark, tmp_path):
    t = TxnTable(str(tmp_path / "tbl"))
    t.write(_load(spark), mode="overwrite")  # v0
    t.write(_load(spark, shift=100.0), mode="overwrite")  # v1
    t.write(_load(spark), mode="overwrite")  # v2 == v0 again
    r = snapshot_drift_report(
        spark, t, ["amount"], version_a=0, version_b=2
    ).first()
    assert r.psi < 0.01  # v2 restored the baseline distribution
