"""Binned interval join (ext/rangejoin.py): equivalence with the
nested-loop formulation, no-duplicate guarantee, edge semantics, and
the no-BNLJ plan gate that is the operator's reason to exist."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_lakehouse_project_spark.ext.rangejoin import interval_bin_join


def _fixtures(spark):
    points = spark.range(0, 1000).select(
        F.col("id"), (F.col("id") * 7.3 % 500).alias("v")
    )
    intervals = spark.createDataFrame(
        [
            ("a", 0.0, 50.0),
            ("b", 25.0, 120.0),  # overlaps a
            ("c", 119.9, 120.0),  # sliver
            ("d", 400.0, 1e9),  # open-ended
            ("e", 200.0, 200.0),  # empty interval matches nothing
        ],
        "name string, lo double, hi double",
    )
    return points, intervals


def test_bin_join_equals_nested_loop(spark):
    points, intervals = _fixtures(spark)
    binned = interval_bin_join(
        points, intervals, "v", "lo", "hi", bin_width=30.0, clamp_hi=500.0
    )
    bnlj = points.join(
        intervals,
        (F.col("v") >= F.col("lo")) & (F.col("v") < F.col("hi")),
    )
    key = lambda df: sorted((r.id, r.name) for r in df.collect())
    got, want = key(binned), key(bnlj)
    assert got == want and len(got) > 0
    assert len(got) == len(set(got))  # exactly-once, no dedup needed
    assert all(n != "e" for _, n in got)


def test_bin_join_edge_semantics(spark):
    """hi is exclusive; an interval ending on a bin boundary must not
    leak into the next bin; points on lo are included."""
    points = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 19.999)], "id long, v double"
    )
    intervals = spark.createDataFrame(
        [("x", 10.0, 20.0)], "name string, lo double, hi double"
    )
    got = sorted(
        r.id
        for r in interval_bin_join(
            points, intervals, "v", "lo", "hi", bin_width=10.0
        ).collect()
    )
    assert got == [1, 3]  # v=20.0 excluded (hi exclusive), v=10.0 in


def test_bin_join_plan_has_no_nested_loop(spark):
    points, intervals = _fixtures(spark)
    big_intervals = (
        intervals.crossJoin(
            spark.range(200).select(F.col("id").alias("rep"))
        )
        .select("name", "lo", "hi")
        .localCheckpoint(eager=True)  # the fixture's own crossJoin must
        # not appear in the plan under test
    )
    q = interval_bin_join(
        points, big_intervals, "v", "lo", "hi", 30.0, clamp_hi=500.0
    )
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
