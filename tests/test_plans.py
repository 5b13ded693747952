"""Physical-plan shape assertions — the 100 TB design gate.

Correctness says the answer is right; these say the PLAN is right:
filters reach the parquet scan, small dims broadcast, aggregates are
partial+final around one exchange, hot paths stay in whole-stage
codegen, and Python appears only where Arrow batching is intended.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_lakehouse_project_spark import registry
from tests.conftest import SF_DIR


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _formatted(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_filter_pushdown_reaches_scan(spark):
    df = registry.q_filter_lineitem(spark, SF_DIR)
    plan = _formatted(df)
    assert "PushedFilters:" in plan
    # the equality and range predicates must be pushed, not post-filtered
    assert "EqualTo(l_returnflag,R)" in plan
    assert "GreaterThanOrEqual(l_quantity,10.0)" in plan


def test_column_pruning(spark):
    """A 2-column projection must not read all 11 lineitem columns."""
    df = registry.q_filter_lineitem(spark, SF_DIR)
    plan = _formatted(df)
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "l_partkey" not in read_schema
    assert "l_tax" not in read_schema


def test_dimension_joins_broadcast(spark):
    df = registry.q_join_region_rollup(spark, SF_DIR)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan  # dims must never trigger a shuffle


def test_aggregate_is_partial_final(spark):
    df = registry.q_pricing_summary(spark, SF_DIR)
    df.collect()  # finalize the adaptive plan before inspecting it
    plan = _plan(df)
    # partial + final HashAggregate around one exchange (map-side combine);
    # "partial_sum" marks the map-side combine, "*(n)" marks codegen stages
    assert "partial_sum" in plan
    assert plan.count("HashAggregate") >= 2
    assert "*(1)" in plan  # whole-stage codegen span


def test_topk_uses_take_ordered(spark):
    """ORDER BY + LIMIT must plan TakeOrderedAndProject, not a total sort."""
    df = registry.q_topk_orders(spark, SF_DIR)
    assert "TakeOrderedAndProject" in _plan(df)


def test_text_ops_are_jvm_only(spark):
    """No Python evaluation in corpus-scan hot paths."""
    for q in ("text_stats", "dedup_exact_groups", "dedup_simhash_fingerprints"):
        plan = _plan(registry.queries()[q](spark, SF_DIR))
        assert "BatchEvalPython" not in plan, q
        assert "ArrowEvalPython" not in plan, q


def test_similarity_scan_is_single_pass(spark):
    """Brute-force top-k: scan → project(score) → TakeOrdered; the query
    vector is a folded literal, not a join."""
    df = registry.q_ann_cosine_topk(spark, SF_DIR)
    plan = _plan(df)
    assert "Join" not in plan
    assert "TakeOrderedAndProject" in plan


def test_union_all_is_shuffle_free(spark):
    """UNION ALL is a metadata concat — any Exchange would be a bug."""
    df = registry.queries()["union_all_tagged"](spark, SF_DIR)
    assert "Exchange" not in _plan(df)


def test_multimodal_uses_arrow_batches(spark):
    from data_lakehouse_project_spark.ext import multimodal as mm

    df = mm.extract_features(mm.synthetic_media(spark, 8))
    assert "MapInPandas" in _plan(df)


def test_partition_pruning_on_partitioned_write(spark, tmp_path, testdata):
    """partitionBy write + partition-key filter → pruned scan."""
    from data_lakehouse_project_spark.operators.sinks import write_table

    path = str(tmp_path / "orders_part")
    df = testdata["orders"].withColumn(
        "status", F.col("o_orderstatus")
    )
    write_table(df, path, partition_by=["status"])
    scan = spark.read.parquet(path).where(F.col("status") == "F")
    plan = _formatted(scan)
    assert "PartitionFilters" in plan and "status" in plan


def test_dynamic_partition_pruning(spark, tmp_path, testdata):
    """DPP: a selective dimension filter must prune FACT partitions at
    runtime through the join — the 100 TB star-join read-avoidance path.
    The fact scan's PartitionFilters must carry a dynamicpruning
    expression rather than reading all partitions."""
    fact_path = str(tmp_path / "orders_by_year")
    dim_path = str(tmp_path / "year_dim")
    orders = testdata["orders"].withColumn(
        "order_year", F.year("o_orderdate")
    )
    orders.write.partitionBy("order_year").mode("overwrite").parquet(fact_path)
    (
        orders.select("order_year")
        .distinct()
        .withColumn(
            "focus_tag",
            F.when(F.col("order_year") == 1996, "Y").otherwise("N"),
        )
        .write.mode("overwrite")
        .parquet(dim_path)
    )
    fact = spark.read.parquet(fact_path)
    # NB: the dim filter must be a comparison predicate — a bare boolean
    # attribute does not count as "likely selective" and DPP skips it
    dim = spark.read.parquet(dim_path).where(F.col("focus_tag") == "Y")
    joined = fact.join(dim, "order_year").groupBy("order_year").agg(
        F.count(F.lit(1)).alias("n")
    )
    plan = _formatted(joined)
    assert "dynamicpruning" in plan.lower(), plan
    rows = joined.collect()
    assert [r.order_year for r in rows] == [1996]


def test_self_join_reuses_exchange(spark, testdata):
    """Joining an aggregate to itself must reuse the shuffle output
    (ReusedExchange), not recompute the aggregation twice — Spark's
    CacheManager-free plan-level dedup that iterative/self-comparison
    pipelines rely on at scale."""
    orders = testdata["orders"]
    agg = orders.groupBy("o_custkey").agg(F.sum("o_totalprice").alias("t"))
    j = (
        agg.alias("a")
        .join(agg.alias("b"), F.col("a.o_custkey") == F.col("b.o_custkey"))
        .select(F.col("a.t").alias("ta"), F.col("b.t").alias("tb"))
    )
    j.collect()
    assert "ReusedExchange" in _plan(j)


def test_join_strategy_hints_honored(spark, testdata):
    """shuffle_hash / merge hints must override the planner's default —
    the manual override path when AQE's choice is wrong for a known
    workload (e.g. forcing SHJ to skip the sort on a huge one-off join)."""
    li, orders = testdata["lineitem"], testdata["orders"]
    shj = li.hint("shuffle_hash").join(orders, li.l_orderkey == orders.o_orderkey)
    shj.write.format("noop").mode("overwrite").save()
    assert "ShuffledHashJoin" in _plan(shj)
    smj = li.hint("merge").join(orders, li.l_orderkey == orders.o_orderkey)
    smj.write.format("noop").mode("overwrite").save()
    assert "SortMergeJoin" in _plan(smj)


def test_analyze_table_statistics_recorded(spark, testdata, tmp_path):
    """ANALYZE TABLE COMPUTE STATISTICS must record size+rowCount in the
    catalog — what the cost-based optimizer consults for join sizing
    when file-size estimates lie (e.g. high-compression columns)."""
    spark.sql("CREATE DATABASE IF NOT EXISTS stats_db")
    try:
        testdata["nation"].write.mode("overwrite").option(
            "path", str(tmp_path / "nation_tbl")
        ).saveAsTable("stats_db.nation_stats")
        spark.sql("ANALYZE TABLE stats_db.nation_stats COMPUTE STATISTICS")
        det = {
            r.col_name: r.data_type
            for r in spark.sql(
                "DESCRIBE TABLE EXTENDED stats_db.nation_stats"
            ).collect()
        }
        assert "Statistics" in det
        assert "rows" in det["Statistics"]  # e.g. "1843 bytes, 25 rows"
    finally:
        spark.sql("DROP TABLE IF EXISTS stats_db.nation_stats")
        spark.sql("DROP DATABASE IF EXISTS stats_db")


def test_runtime_bloom_filter_injected(spark, testdata):
    """With a selective filter on one SMJ side, Spark injects a runtime
    bloom filter (might_contain) on the probe side — row-level join
    pruning before the shuffle. Size thresholds are lowered to simulate
    the at-scale condition (default application-side gate is 10 GB)."""
    to_restore = {
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": None,
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": None,
        "spark.sql.autoBroadcastJoinThreshold": None,
    }
    for k in to_restore:
        to_restore[k] = spark.conf.get(k)
    try:
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter."
            "applicationSideScanSizeThreshold",
            "0",
        )
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
            "100MB",
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        li, orders = testdata["lineitem"], testdata["orders"]
        sel = orders.where(F.col("o_orderpriority") == "1-URGENT")
        j = li.join(sel, li.l_orderkey == sel.o_orderkey).agg(
            F.sum("l_extendedprice").alias("s")
        )
        j.collect()
        assert "might_contain" in _plan(j)
    finally:
        for k, v in to_restore.items():
            spark.conf.set(k, v)


def test_aqe_skew_join_splits_hot_partition(spark):
    """A 90%-hot join key must trigger AQE's skew-join handling: the
    final plan shows SortMergeJoin(skew=true) with an AQEShuffleRead
    that split the oversized partition. Thresholds are lowered to make
    the local dataset 'skewed' by the same relative rule that applies
    at 100 TB; confs restored afterwards."""
    keys = [
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "spark.sql.autoBroadcastJoinThreshold",
    ]
    saved = {k: spark.conf.get(k) for k in keys}
    try:
        spark.conf.set(keys[0], "1.0")
        spark.conf.set(keys[1], "16KB")
        spark.conf.set(keys[2], "8KB")
        spark.conf.set(keys[3], "-1")
        left = spark.range(0, 500000).select(
            F.when(F.col("id") % 10 < 9, 0).otherwise(F.col("id")).alias("k"),
            F.concat(F.lit("x" * 50), F.col("id")).alias("pad"),
        )
        right = spark.range(0, 2000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("w")
        )
        out = left.join(right, "k").agg(F.count(F.lit(1)).alias("n"))
        [row] = out.collect()
        plan = _plan(out)
        assert "skew=true" in plan
        assert "skewed" in plan  # AQEShuffleRead split the hot partition
        # correctness untouched by the split: 450000 hot rows match k=0,
        # plus ids ending in 9 below 2000 (9, 19, …, 1999) = 200 rows
        assert row.n == 450000 + 200
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
