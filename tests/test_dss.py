"""Decision-support query shapes: semantics + physical-plan assertions."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_lakehouse_project_spark import registry_dss
from tests.conftest import SF_DIR


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_exists_decorrelates_to_semi_join(spark):
    df = registry_dss.q_subquery_exists(spark, SF_DIR)
    plan = _plan(df)
    assert "LeftSemi" in plan
    # semi-join must not duplicate orders: count <= orders in window
    total = df.agg(F.sum("order_count")).collect()[0][0] or 0
    from data_lakehouse_project_spark.sources.readers import load_testdata

    orders = load_testdata(df.sparkSession, SF_DIR)["orders"]
    in_window = orders.filter(
        (F.to_date("o_orderdate") >= "1996-01-01")
        & (F.to_date("o_orderdate") < "1996-04-01")
    ).count()
    assert total <= in_window


def test_custdist_includes_zero_order_customers(spark, testdata):
    df = registry_dss.q_custdist(spark, SF_DIR)
    rows = {r["c_count"]: r["custdist"] for r in df.collect()}
    # distribution covers every customer exactly once
    assert sum(rows.values()) == testdata["customer"].count()


def test_small_qty_revenue_broadcasts_part_dim(spark):
    df = registry_dss.q_small_qty_revenue(spark, SF_DIR)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan  # brand dim never shuffles lineitem


def test_unpivot_long_shape(spark, testdata):
    df = registry_dss.q_unpivot_status_measures(spark, SF_DIR)
    n_status = testdata["orders"].select("o_orderstatus").distinct().count()
    assert df.count() == 3 * n_status
    assert set(df.columns) == {"o_orderstatus", "measure", "value"}


def test_nation_pair_only_fact_join_shuffles(spark):
    """4 dimension lookups broadcast; only lineitem⋈orders may shuffle."""
    df = registry_dss.q_nation_pair_volume(spark, SF_DIR)
    plan = _plan(df)
    # the 4 dimension lookups must broadcast (at tiny SF orders may too);
    # at most the lineitem⋈orders fact join is allowed to shuffle
    assert plan.count("BroadcastHashJoin") >= 4
    assert plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin") <= 1


def test_returned_items_filter_pushed_to_scan(spark):
    df = registry_dss.q_returned_item_customers(spark, SF_DIR)
    formatted = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "EqualTo(l_returnflag,R)" in formatted


def test_argminmax_consistent_with_max(spark, testdata):
    df = registry_dss.q_argminmax_orders(spark, SF_DIR)
    orders = testdata["orders"]
    for r in df.collect():
        top = orders.filter(
            (F.col("o_orderstatus") == r["o_orderstatus"])
            & (F.col("o_orderkey") == r["priciest_order"])
        ).collect()[0]
        # the argmax row really carries the max price for its group
        assert abs(top["o_totalprice"] - r["max_price"]) < 0.01


def test_range_frame_sums_trailing_window(spark):
    df = registry_dss.q_window_range_trailing(spark, SF_DIR)
    # trailing sum must always include the current row's own price
    from data_lakehouse_project_spark.sources.readers import load_testdata

    orders = load_testdata(spark, SF_DIR)["orders"]
    joined = df.join(orders, ["o_custkey", "o_orderkey"]).filter(
        F.col("trailing_30d_rev") < F.col("o_totalprice") - 0.01
    )
    assert joined.count() == 0
