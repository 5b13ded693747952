"""Query-surface property checks on sf0.001 (SURVEY §5 strategy 4).

The DuckDB oracle differential (strategy 1) runs via tools/selfcheck.py
and the driver; these are cheap invariants that catch logic regressions
without an oracle."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_lakehouse_project_spark import registry
from tests.conftest import SF_DIR


def test_registry_contract():
    qs = registry.queries()
    oracles = registry.oracle_sql()
    assert len(qs) >= 40
    assert set(oracles) <= set(qs)
    # most queries must be oracle-checked (rows-only is the exception)
    assert len(oracles) >= 0.8 * len(qs)


def test_flagship_entry(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {
        "transaction_date",
        "total_amount",
        "transaction_count",
    }


def test_daily_totals_sum_to_global(spark, testdata):
    """sum(per-group sums) == global sum (partial-agg correctness)."""
    out = registry.q_daily_sales_summary(spark, SF_DIR)
    per_group = out.agg(F.sum("transaction_count")).first()[0]
    assert per_group == testdata["orders"].count()


def test_window_topk_bounded(spark):
    out = registry.q_window_topk_per_customer(spark, SF_DIR)
    worst = out.groupBy("o_custkey").count().agg(F.max("count")).first()[0]
    assert worst <= 3


def test_setops_partition_keys(spark, testdata):
    """intersect ∪ except == all customer keys; disjoint."""
    both = registry.q_setop_intersect(spark, SF_DIR)
    only_cust = registry.q_setop_except(spark, SF_DIR)
    n_c = testdata["customer"].select("c_custkey").distinct().count()
    assert both.count() + only_cust.count() == n_c
    assert both.intersect(only_cust).count() == 0


def test_semi_anti_complement(spark, testdata):
    semi = registry.q_join_semi(spark, SF_DIR)
    anti = registry.q_join_anti(spark, SF_DIR)
    assert semi.count() + anti.count() == testdata["customer"].count()


def test_dedup_idempotent(spark):
    """Property: dedup of dedup output changes nothing."""
    out = registry.q_dedup_exact_groups(spark, SF_DIR)
    again = out.dropDuplicates(["fingerprint"])
    assert again.count() == out.count()


def test_rollup_grand_total(spark, testdata):
    out = registry.q_rollup_status_priority(spark, SF_DIR)
    grand = out.where(
        F.col("o_orderstatus").isNull() & F.col("o_orderpriority").isNull()
    ).collect()
    assert len(grand) == 1
    assert grand[0].order_count == testdata["orders"].count()


def test_pricing_summary_partial_vs_total(spark, testdata):
    out = registry.q_pricing_summary(spark, SF_DIR)
    total = out.agg(F.sum("count_order")).first()[0]
    expected = testdata["lineitem"].where(
        F.col("l_shipdate") <= "1998-09-01"
    ).count()
    assert total == expected


@pytest.mark.parametrize("name", ["ann_cosine_topk", "ann_lsh_topk"])
def test_topk_row_bounds(spark, name):
    fn = registry.queries()[name]
    assert fn(spark, SF_DIR).count() <= 10


def test_stratified_sampling(spark, testdata):
    """Seeded sampleBy: per-stratum fractions honored, deterministic."""
    lineitem = testdata["lineitem"]
    fractions = {"A": 0.5, "N": 0.1, "R": 0.0}
    s1 = lineitem.sampleBy("l_returnflag", fractions, seed=7)
    s2 = lineitem.sampleBy("l_returnflag", fractions, seed=7)
    assert s1.count() == s2.count()  # deterministic under fixed seed
    counts = {
        r.l_returnflag: r["count"]
        for r in s1.groupBy("l_returnflag").count().collect()
    }
    assert counts.get("R", 0) == 0
    total_a = lineitem.where(F.col("l_returnflag") == "A").count()
    assert abs(counts.get("A", 0) / total_a - 0.5) < 0.1
