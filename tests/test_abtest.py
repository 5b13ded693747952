"""A/B readout (ext/abtest.py): hand-computed z on a crafted cohort."""

from __future__ import annotations

import math

import pytest


def test_ab_proportions_hand_computed(spark):
    from data_lakehouse_project_spark.ext.abtest import ab_test_proportions

    # A: 100 users, 20 convert; B: 100 users, 30 convert
    rows = [("A", 1)] * 20 + [("A", 0)] * 80 + [("B", 1)] * 30 + [("B", 0)] * 70
    df = spark.createDataFrame(rows, "variant string, converted int")
    r = ab_test_proportions(df).head()
    assert (r.n_a, r.n_b, r.conv_a, r.conv_b) == (100, 100, 20, 30)
    assert r.rate_a == pytest.approx(0.2)
    assert r.rate_b == pytest.approx(0.3)
    assert r.lift == pytest.approx(0.1)
    pooled = 0.25
    se = math.sqrt(pooled * 0.75 * (0.02))
    assert r.z_score == pytest.approx(0.1 / se, rel=1e-12)


def test_ab_degenerate_pooled_rate_nulls_z(spark):
    from data_lakehouse_project_spark.ext.abtest import ab_test_proportions

    # nobody converts anywhere: se = 0 → z null, rates 0
    rows = [("A", 0)] * 5 + [("B", 0)] * 5
    df = spark.createDataFrame(rows, "variant string, converted int")
    r = ab_test_proportions(df).head()
    assert r.z_score is None and r.rate_a == 0.0 and r.lift == 0.0


def test_assignment_is_deterministic_and_user_grain(spark):
    from data_lakehouse_project_spark.ext.abtest import assign_and_measure

    rows = [
        (1, "view"), (1, "purchase"), (1, "view"),
        (2, "view"), (3, "purchase"),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string")
    got = {r.user_id: (r.variant, r.converted)
           for r in assign_and_measure(df).collect()}
    assert set(got) == {1, 2, 3}
    assert got[1][1] == 1 and got[2][1] == 0 and got[3][1] == 1
    again = {r.user_id: r.variant
             for r in assign_and_measure(df).collect()}
    assert {u: v for u, (v, _) in got.items()} == again
