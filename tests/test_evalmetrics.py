"""AUC / calibration (ext/evalmetrics.py) vs sklearn-free references."""

from __future__ import annotations

import pytest


def _auc_reference(pairs):
    """O(n²) probability formulation incl. half-credit for ties."""
    pos = [s for s, y in pairs if y == 1]
    neg = [s for s, y in pairs if y == 0]
    num = sum(
        1.0 if p > q else 0.5 if p == q else 0.0 for p in pos for q in neg
    )
    return num / (len(pos) * len(neg))


@pytest.mark.parametrize(
    "pairs",
    [
        # separable → AUC 1
        [(0.9, 1), (0.8, 1), (0.2, 0), (0.1, 0)],
        # heavy ties across classes
        [(0.5, 1), (0.5, 0), (0.5, 1), (0.5, 0), (0.7, 1), (0.3, 0)],
        # interleaved
        [(0.1, 1), (0.4, 0), (0.35, 1), (0.8, 0), (0.8, 1), (0.2, 0)],
    ],
)
def test_binary_auc_matches_quadratic_reference(spark, pairs):
    from data_lakehouse_project_spark.ext.evalmetrics import binary_auc

    df = spark.createDataFrame(pairs, "s double, y int")
    r = binary_auc(df, "y", "s").head()
    assert r.auc == pytest.approx(_auc_reference(pairs), abs=1e-12)
    assert r.n_pos == sum(1 for _, y in pairs if y == 1)


def test_binary_auc_degenerate_class_is_null(spark):
    from data_lakehouse_project_spark.ext.evalmetrics import binary_auc

    df = spark.createDataFrame([(0.5, 1), (0.6, 1)], "s double, y int")
    assert binary_auc(df, "y", "s").head().auc is None


def test_calibration_bins(spark):
    from data_lakehouse_project_spark.ext.evalmetrics import (
        calibration_bins,
    )

    rows = [(0.05, 0), (0.05, 0), (0.95, 1), (0.95, 1), (0.95, 0), (1.2, 1)]
    df = spark.createDataFrame(rows, "s double, y int")
    bins = {r.bin: r for r in calibration_bins(df, "y", "s", bins=10).collect()}
    assert bins[0].n == 2 and bins[0].pos_rate == 0.0
    # 0.95 and the clamped out-of-range 1.2 land in the last bin
    assert bins[9].n == 4
    assert bins[9].pos_rate == pytest.approx(0.75)
