"""grouped_quantiles_exact (registry_r6): the bounded-memory
counts-grain straddle must be BIT-IDENTICAL to Spark's holistic
``F.percentile`` (percentile_cont interpolation) — that identity is
what lets every oracle row survive the rewrite of agg_mad /
agg_median_percentile / rfm / pareto / length_outlier_filter."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from data_lakehouse_project_spark.registry_r6 import (
    grouped_median_exact,
    grouped_quantiles_exact,
)

QS = {"p01": 0.01, "q1": 0.25, "med": 0.5, "q3": 0.75, "p90": 0.9,
      "p999": 0.999}


def _ref(df, keys, val, qs):
    return {
        tuple(r[k] for k in keys): r
        for r in df.groupBy(*keys)
        .agg(
            *[F.percentile(val, q).alias(o) for o, q in qs.items()],
            F.count(F.lit(1)).alias("__n"),
        )
        .collect()
    }


def test_bit_identical_to_holistic_percentile(spark):
    random.seed(42)
    rows = [
        (random.choice("abcd"), random.randint(0, 80) + random.random())
        for _ in range(4000)
    ]
    rows += [("a", 5.5)] * 97 + [("d", 0.125)] * 13  # heavy ties
    df = spark.createDataFrame(rows, "k string, v double")
    mine = {
        (r["k"],): r
        for r in grouped_quantiles_exact(df, ["k"], "v", QS).collect()
    }
    ref = _ref(df, ["k"], "v", QS)
    assert set(mine) == set(ref)
    for k, r in ref.items():
        for o in list(QS) + ["__n"]:
            assert mine[k][o] == r[o], (k, o, mine[k][o], r[o])


def test_single_literal_group_is_global(spark):
    df = spark.range(0, 1001).select(
        F.lit(1).alias("g"), (F.col("id") * 0.5).alias("v")
    )
    got = grouped_quantiles_exact(
        df, ["g"], "v", {"med": 0.5, "p90": 0.9}
    ).collect()[0]
    ref = df.agg(
        F.percentile("v", 0.5).alias("med"),
        F.percentile("v", 0.9).alias("p90"),
    ).collect()[0]
    assert (got["med"], got["p90"]) == (ref["med"], ref["p90"])
    assert got["__n"] == 1001


@pytest.mark.parametrize("n", [1, 2, 3, 4])
def test_tiny_groups_and_edges(spark, n):
    df = spark.createDataFrame(
        [("g", float(i * i)) for i in range(n)], "k string, v double"
    )
    qs = {"p0": 0.0, "med": 0.5, "p100": 1.0}
    got = grouped_quantiles_exact(df, ["k"], "v", qs).collect()[0]
    ref = df.agg(
        *[F.percentile("v", q).alias(o) for o, q in qs.items()]
    ).collect()[0]
    for o in qs:
        assert got[o] == ref[o], (n, o, got[o], ref[o])


def test_median_wrapper_unchanged(spark):
    df = spark.createDataFrame(
        [("x", 1.0), ("x", 2.0), ("x", 3.0), ("x", 4.0), ("y", 7.0)],
        "k string, v double",
    )
    got = {
        r["k"]: (r["med"], r["__n"])
        for r in grouped_median_exact(df, ["k"], "v").collect()
    }
    assert got == {"x": (2.5, 4), "y": (7.0, 1)}


def test_disc_matches_sql_percentile_disc(spark):
    """grouped_quantiles_disc == the SQL PERCENTILE_DISC ... WITHIN
    GROUP form (the r9 counts-grain replacement for the last holistic
    registry slot keeps the SQL form pinned here), including boundary
    cases where cume_dist lands exactly on q."""
    import random

    from data_lakehouse_project_spark.functions.quantiles import (
        grouped_quantiles_disc,
    )

    rng = random.Random(7)
    rows = [
        (k, float(rng.choice([1, 2, 2, 3, 5, 8, 13])))
        for k in ("a", "b", "c")
        for _ in range(rng.choice([4, 8, 40]))  # n*q hits integers
    ]
    df = spark.createDataFrame(rows, "k string, v double")
    df.createOrReplaceTempView("t_disc")
    qs = {"q1": 0.25, "q2": 0.5, "q3": 0.75, "p90": 0.9}
    want = {
        r.k: (r.q1, r.q2, r.q3, r.p90)
        for r in spark.sql(
            """SELECT k,
                 percentile_disc(0.25) WITHIN GROUP (ORDER BY v) q1,
                 percentile_disc(0.50) WITHIN GROUP (ORDER BY v) q2,
                 percentile_disc(0.75) WITHIN GROUP (ORDER BY v) q3,
                 percentile_disc(0.90) WITHIN GROUP (ORDER BY v) p90
               FROM t_disc GROUP BY k"""
        ).collect()
    }
    got = {
        r.k: (r.q1, r.q2, r.q3, r.p90)
        for r in grouped_quantiles_disc(df, ["k"], "v", qs).collect()
    }
    assert got == want


def test_cont_matches_sql_percentile_cont(spark):
    """grouped_quantiles_exact == the SQL PERCENTILE_CONT ... WITHIN
    GROUP form (pins the SQL form the r9 counts-grain rebuild of
    percentile_cont_qty replaced)."""
    import random

    rng = random.Random(11)
    rows = [
        (k, float(rng.randint(1, 50)))
        for k in ("x", "y")
        for _ in range(rng.choice([13, 29]))
    ]
    df = spark.createDataFrame(rows, "k string, v double")
    df.createOrReplaceTempView("t_cont")
    qs = {"q1": 0.25, "med": 0.5, "q3": 0.75}
    want = {
        r.k: (r.q1, r.med, r.q3)
        for r in spark.sql(
            """SELECT k,
                 percentile_cont(0.25) WITHIN GROUP (ORDER BY v) q1,
                 percentile_cont(0.50) WITHIN GROUP (ORDER BY v) med,
                 percentile_cont(0.75) WITHIN GROUP (ORDER BY v) q3
               FROM t_cont GROUP BY k"""
        ).collect()
    }
    got = {
        r.k: (r.q1, r.med, r.q3)
        for r in grouped_quantiles_exact(df, ["k"], "v", qs).collect()
    }
    for k in want:
        for a, b in zip(got[k], want[k]):
            assert abs(a - b) < 1e-9, (k, got[k], want[k])
