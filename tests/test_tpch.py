"""Decision-support batch 2 (registry_tpch): correctness invariants +
physical-plan gates for the Q2/Q5/Q15/Q18/Q19/Q22 shapes.

Value-level correctness is owned by the DuckDB oracle differential
(tools/selfcheck.py / the driver's CORRECTNESS gate); these tests pin
the *shape* properties that matter at 100 TB: aggregates run before
join-backs, dimension joins broadcast, disjunctive predicates still
push per-table residuals into the scans.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_lakehouse_project_spark import registry_tpch as T
from tests.conftest import SF_DIR


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_local_supplier_volume_dims_broadcast(spark):
    """Q5: region/nation/supplier ride broadcast joins; no SMJ for dims."""
    df = T.q_local_supplier_volume(spark, SF_DIR)
    plan = _plan(df)
    assert plan.count("BroadcastHashJoin") >= 3
    rows = df.collect()
    # every surviving nation must be an ASIA nation with a local supplier
    assert all(r.revenue > 0 for r in rows)


def test_top_supplier_aggregates_before_join(spark):
    """Q15: the supplier join input is the post-agg winner set, not raw
    lineitem — the physical plan must aggregate below the broadcast join."""
    df = T.q_top_supplier_revenue(spark, SF_DIR)
    plan = _plan(df)
    agg_pos = plan.find("HashAggregate")
    join_pos = plan.find("BroadcastHashJoin")
    assert agg_pos != -1 and join_pos != -1
    rows = df.collect()
    assert len(rows) >= 1
    assert len({r.total_revenue for r in rows}) == 1  # all tie at the max


def test_large_orders_filter_on_aggregate(spark):
    """Q18: HAVING runs on the aggregate; every output row respects it,
    and each qualifying order appears exactly once."""
    df = T.q_large_order_customers(spark, SF_DIR)
    rows = df.collect()
    assert rows, "threshold should qualify some orders at every SF"
    assert all(r.total_qty > 250.0 for r in rows)
    keys = [r.o_orderkey for r in rows]
    assert len(keys) == len(set(keys))


def test_disjunctive_filter_pushes_brand_residual(spark):
    """Q19: the extracted per-table residual of the OR-of-ANDs (brand IN /
    size range) must reach the part scan as a pushed filter."""
    df = T.q_disjunctive_filter_revenue(spark, SF_DIR)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "PushedFilters" in plan
    assert "Brand#11" in plan or "In(p_brand" in plan


def test_min_price_join_back_matches_window_formulation(spark):
    """Q2 shape: the agg+join-back result must equal the window-function
    formulation (two independent evaluation strategies agree)."""
    from data_lakehouse_project_spark.sources.readers import load_testdata
    from pyspark.sql.window import Window

    got = {
        (r.p_brand, r.p_partkey)
        for r in T.q_min_price_part_per_brand(spark, SF_DIR).collect()
    }
    part = load_testdata(spark, SF_DIR)["part"]
    w = Window.partitionBy("p_brand")
    want = {
        (r.p_brand, r.p_partkey)
        for r in part.withColumn("mn", F.min("p_retailprice").over(w))
        .where(F.col("p_retailprice") == F.col("mn"))
        .collect()
    }
    assert got == want


def test_waiting_customers_anti_join_complement(spark):
    """Q22: qualifying customers with and without recent orders must
    partition the above-average set exactly."""
    from data_lakehouse_project_spark.sources.readers import load_testdata

    t = load_testdata(spark, SF_DIR)
    customer, orders = t["customer"], t["orders"]
    avg_bal = customer.where(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    rich = customer.crossJoin(F.broadcast(avg_bal)).where(
        F.col("c_acctbal") > F.col("avg_bal")
    )
    recent = orders.where(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    n_rich = rich.count()
    n_active = rich.join(
        recent, F.col("c_custkey") == F.col("o_custkey"), "left_semi"
    ).count()
    n_waiting = sum(
        r.numcust for r in T.q_waiting_customers(spark, SF_DIR).collect()
    )
    assert n_waiting == n_rich - n_active


def test_array_hof_stays_jvm_side(spark):
    """The HOF query must not contain a Python evaluation node — the
    lambdas compile to Catalyst expressions."""
    df = T.q_array_hof_surface(spark, SF_DIR)
    plan = _plan(df)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_window_ignore_nulls_fill_semantics(spark):
    """filled_price carries the last non-null forward; first_nonnull is
    constant within each order."""
    df = T.q_window_ignore_nulls(spark, SF_DIR)
    rows = df.where(F.col("l_orderkey") == F.lit(1)).collect()
    last_seen = None
    firsts = set()
    for r in sorted(rows, key=lambda r: (r.l_linenumber,)):
        if r.maybe_price is not None:
            last_seen = r.maybe_price
        if last_seen is not None:
            assert r.filled_price == last_seen
        firsts.add(r.first_nonnull)
    assert len(firsts) <= 1


def test_supplier_part_counts_excludes_negative_balance(spark):
    """Q16: no excluded supplier may contribute to any distinct count —
    rebuild one group by hand and compare."""
    from data_lakehouse_project_spark.sources.readers import load_testdata

    t = load_testdata(spark, SF_DIR)
    out = T.q_supplier_part_counts(spark, SF_DIR).collect()
    assert out, "selected sizes must match some parts"
    bad = {
        r.s_suppkey
        for r in t["supplier"].where(F.col("s_acctbal") < 0.0).collect()
    }
    row = out[0]
    manual = (
        t["lineitem"]
        .join(
            t["part"].where(
                (F.col("p_brand") == row.p_brand)
                & (F.col("p_type") == row.p_type)
                & (F.col("p_size") == row.p_size)
            ),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .select("l_suppkey")
        .distinct()
        .collect()
    )
    expect = {r.l_suppkey for r in manual} - bad
    assert row.supplier_cnt == len(expect)


def test_sole_late_supplier_counts_multi_supplier_orders_only(spark):
    """Q21: every counted order must have ≥2 suppliers and exactly one
    late one; total numwait equals the number of qualifying orders."""
    from data_lakehouse_project_spark.sources.readers import load_testdata

    t = load_testdata(spark, SF_DIR)
    out = T.q_sole_late_supplier(spark, SF_DIR)
    total = out.agg(F.sum("numwait").alias("s")).collect()[0]["s"]
    flags = (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.max(
                F.when(
                    F.col("l_shipdate")
                    > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"),
                    1,
                ).otherwise(0)
            ).alias("late")
        )
    )
    qualifying = (
        flags.groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("ns"), F.sum("late").alias("nl"))
        .where((F.col("ns") >= 2) & (F.col("nl") == 1))
        .count()
    )
    assert total == qualifying


def test_dominant_suppliers_nonempty_and_above_fair_share(spark):
    rows = T.q_dominant_part_suppliers(spark, SF_DIR).collect()
    assert rows, "fair-share threshold should select some suppliers"
    keys = [r.s_suppkey for r in rows]
    assert len(keys) == len(set(keys))
