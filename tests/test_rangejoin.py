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


def test_interval_overlap_join_matches_brute_force(spark):
    """Binned interval×interval overlap == raw inequality join, each
    pair exactly once (the overlap-start-bin rule needs no distinct)."""
    import random

    from data_lakehouse_project_spark.ext.rangejoin import (
        interval_overlap_join,
    )

    rng = random.Random(7)
    a_rows = []
    for i in range(300):
        lo = float(rng.randint(0, 300))
        a_rows.append((i, lo, lo + rng.randint(1, 40)))
    b_rows = []
    for j in range(300):
        lo = float(rng.randint(0, 300))
        b_rows.append((j, lo, lo + rng.randint(1, 40)))
    a = spark.createDataFrame(a_rows, "a_id long, a_lo double, a_hi double")
    b = spark.createDataFrame(b_rows, "b_id long, b_lo double, b_hi double")
    got = interval_overlap_join(
        a, b, "a_lo", "a_hi", "b_lo", "b_hi", bin_width=16.0
    )
    brute = a.crossJoin(b).where(
        F.greatest("a_lo", "b_lo") < F.least("a_hi", "b_hi")
    )
    assert got.count() == brute.count()
    assert (
        got.groupBy("a_id", "b_id").count().where("count > 1").count() == 0
    )
    # zero-length interval ([x, x)) overlaps nothing
    z = spark.createDataFrame([(0, 5.0, 5.0)], "a_id long, a_lo double, a_hi double")
    assert interval_overlap_join(
        z, b, "a_lo", "a_hi", "b_lo", "b_hi", bin_width=16.0
    ).count() == 0


def test_interval_overlap_join_is_equi_join_plan(spark):
    """The rewrite must plan a hash-partitioned equi-join on the bin
    key — no BroadcastNestedLoopJoin / CartesianProduct."""
    from data_lakehouse_project_spark.ext.rangejoin import (
        interval_overlap_join,
    )

    a = spark.range(2000).select(
        F.col("id").alias("a_id"),
        (F.col("id") % 500).cast("double").alias("a_lo"),
        ((F.col("id") % 500) + 10).cast("double").alias("a_hi"),
    )
    b = spark.range(2000).select(
        F.col("id").alias("b_id"),
        (F.col("id") % 500).cast("double").alias("b_lo"),
        ((F.col("id") % 500) + 10).cast("double").alias("b_hi"),
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = (
            interval_overlap_join(
                a, b, "a_lo", "a_hi", "b_lo", "b_hi", bin_width=20.0
            )
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan


def test_interval_overlap_clamped_start_before_window(spark):
    """A pair whose overlap STARTS below clamp_lo but extends into the
    clamp window must still be emitted exactly once (regression: the
    exactly-once bin used the unclamped start, which no exploded ring
    contained)."""
    from data_lakehouse_project_spark.ext.rangejoin import (
        interval_overlap_join,
    )

    left = spark.createDataFrame([(1, -50.0, 30.0)], "lid long, lo double, hi double")
    right = spark.createDataFrame([(2, -40.0, 25.0)], "rid long, lo2 double, hi2 double")
    out = interval_overlap_join(
        left, right, "lo", "hi", "lo2", "hi2",
        bin_width=10.0, clamp_lo=0.0, clamp_hi=100.0,
    ).collect()
    assert len(out) == 1  # overlap [-40, 25) crosses into the window
