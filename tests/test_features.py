"""Feature encoding (ext/features.py): hand-computed smoothing and
scaling."""

from __future__ import annotations

import math

import pytest


def test_target_encode_smoothed(spark):
    from data_lakehouse_project_spark.ext.features import target_encode

    rows = [("a", 10.0), ("a", 20.0), ("b", 100.0)]
    df = spark.createDataFrame(rows, "cat string, y double")
    out = {r.cat: r.cat_enc for r in target_encode(df, "cat", "y", m=2.0)
           .select("cat", "cat_enc").distinct().collect()}
    prior = (10 + 20 + 100) / 3.0
    assert out["a"] == pytest.approx((30 + 2 * prior) / 4)
    assert out["b"] == pytest.approx((100 + 2 * prior) / 3)
    # rare category shrinks toward prior more than the common one
    assert abs(out["b"] - prior) < abs(100.0 - prior)


def test_standard_scale(spark):
    from data_lakehouse_project_spark.ext.features import standard_scale

    df = spark.createDataFrame(
        [(1.0, 5.0), (2.0, 5.0), (3.0, 5.0)], "x double, c double"
    )
    rows = standard_scale(df, ["x", "c"]).orderBy("x").collect()
    sd = math.sqrt(2.0 / 3.0)
    assert [r.x_z for r in rows] == pytest.approx(
        [-1.0 / sd, 0.0, 1.0 / sd]
    )
    assert all(r.c_z is None for r in rows)  # constant column → null
