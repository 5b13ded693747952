"""Table-level data-quality expectations (Deequ-lite) over known-dirty data."""

from __future__ import annotations

from pyspark.sql import Row

from data_lakehouse_project_spark.operators.expectations import (
    expect_foreign_key,
    expect_not_null,
    expect_range,
    expect_row_count_between,
    expect_unique,
    run_expectations,
)


def _by_check(df):
    return {r["check"]: r for r in df.collect()}


def test_expectations_on_dirty_frame(spark):
    child = spark.createDataFrame(
        [
            Row(id=1, pid=10, v=5.0),
            Row(id=1, pid=10, v=-1.0),   # dup id, out-of-range v
            Row(id=2, pid=99, v=None),   # orphan pid, null v
            Row(id=3, pid=None, v=150.0),  # null pid, above hi
        ]
    )
    parent = spark.createDataFrame([Row(pk=10), Row(pk=11)])

    report = run_expectations(
        [
            expect_unique(child, ["id"]),
            expect_not_null(child, ["pid", "v"]),
            expect_range(child, "v", lo=0.0, hi=100.0),
            expect_foreign_key(child, "pid", parent, "pk"),
            expect_row_count_between(child, 1, 10),
        ]
    )
    rows = _by_check(report)
    assert len(rows) == 5

    assert rows["unique(id)"]["violations"] == 1 and not rows["unique(id)"]["passed"]
    assert rows["not_null(pid,v)"]["violations"] == 2
    assert rows["range(v,0.0,100.0)"]["violations"] == 2
    # null pid does not join, so it counts as an orphan alongside pid=99
    assert rows["fk(pid->pk)"]["violations"] == 2
    assert rows["row_count[1,10]"]["passed"]


def test_accepted_values_and_mean_bounds(spark):
    from data_lakehouse_project_spark.operators.expectations import (
        expect_accepted_values,
        expect_mean_between,
    )

    df = spark.createDataFrame(
        [Row(s="a", v=10.0), Row(s="b", v=20.0), Row(s="zz", v=30.0),
         Row(s=None, v=None)]
    )
    rows = _by_check(
        run_expectations(
            [
                expect_accepted_values(df, "s", ["a", "b"]),
                expect_mean_between(df, "v", 15.0, 25.0),  # mean = 20
                expect_mean_between(df, "v", 0.0, 5.0),    # out of band
            ]
        )
    )
    assert rows["accepted(s)"]["violations"] == 1  # 'zz'; NULL not counted
    assert rows["mean(v,[15.0,25.0])"]["passed"]
    assert not rows["mean(v,[0.0,5.0])"]["passed"]


def test_expectations_all_pass_on_clean_table(testdata):
    orders, customer = testdata["orders"], testdata["customer"]
    report = run_expectations(
        [
            expect_unique(orders, ["o_orderkey"]),
            expect_not_null(orders, ["o_custkey", "o_totalprice"]),
            expect_range(orders, "o_totalprice", lo=0.0),
            expect_foreign_key(orders, "o_custkey", customer, "c_custkey"),
        ]
    )
    assert all(r["passed"] for r in report.collect())


def test_fused_expectations_single_scan(spark, testdata):
    """All agg-shaped checks must share one scan + one global aggregate:
    exactly one Exchange in the plan, results identical to the separate
    per-check evaluation."""
    from data_lakehouse_project_spark.operators.expectations import (
        agg_accepted_values,
        agg_mean_between,
        agg_not_null,
        agg_range,
        agg_row_count_between,
        fused_expectations,
    )

    orders = testdata["orders"]
    fused = fused_expectations(
        orders,
        [
            agg_not_null(["o_custkey", "o_totalprice"]),
            agg_range("o_totalprice", lo=0.0),
            agg_accepted_values("o_orderstatus", ["O", "F", "P"]),
            agg_row_count_between(1),
            agg_mean_between("o_totalprice", 0.0, 1e9),
        ],
    )
    plan = fused._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange ") == 1
    rows = {r["check"]: r for r in fused.collect()}
    assert len(rows) == 5
    assert all(r["passed"] for r in rows.values())
    assert rows["row_count[1,None]"]["violations"] == 0
