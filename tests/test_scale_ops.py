"""Scale-path operators: salted aggregation, IVF ANN, bucketed co-located
joins, streaming watermark late-data eviction."""

from __future__ import annotations

import datetime

import numpy as np
import pytest
from pyspark.sql import functions as F


def test_salted_aggregate_equals_plain_groupby(spark, testdata):
    from data_lakehouse_project_spark.ext.skew import salted_aggregate

    events = testdata["events"]
    salted = salted_aggregate(
        events,
        keys=["event_type"],
        sums={"v": "value"},
        count_name="n",
        avgs={"a": "value"},
        salt_buckets=8,
    )
    plain = events.groupBy("event_type").agg(
        F.sum("value").alias("v"),
        F.count(F.lit(1)).alias("n"),
        F.avg("value").alias("a"),
    )
    s = {r.event_type: (round(r.v, 6), r.n, round(r.a, 6)) for r in salted.collect()}
    p = {r.event_type: (round(r.v, 6), r.n, round(r.a, 6)) for r in plain.collect()}
    assert s == p


def test_salted_aggregate_two_shuffles(spark, testdata):
    """The plan must show the two-phase shape: agg on (key, salt) then on
    key — i.e. at least two exchanges and salt in the first grouping."""
    from data_lakehouse_project_spark.ext.skew import salted_aggregate

    out = salted_aggregate(
        testdata["events"], keys=["event_type"], count_name="n", salt_buckets=8
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "_salt" in plan


@pytest.fixture(scope="module")
def planted_vectors(spark):
    rng = np.random.default_rng(11)
    base = rng.standard_normal(16)
    rows = []
    for i in range(80):
        v = base + 0.1 * rng.standard_normal(16) if i < 6 else rng.standard_normal(16)
        rows.append((i, [float(x) for x in v]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>"), base


def test_ivf_topk_finds_planted_cluster(planted_vectors):
    from data_lakehouse_project_spark.ext.ivf import ivf_topk

    df, base = planted_vectors
    got = ivf_topk(
        df, "embedding", "vec_id", [float(x) for x in base], k=6,
        n_clusters=8, nprobe=3,
    )
    ids = {r.vec_id for r in got.collect()}
    # the planted cluster lands in one inverted list; probing 3/8 must hit it
    assert len(ids & {0, 1, 2, 3, 4, 5}) >= 5


def test_ivf_exact_when_probing_all_lists(planted_vectors):
    from data_lakehouse_project_spark.ext.ivf import (
        ivf_topk,
        train_centroids,
    )
    from data_lakehouse_project_spark.ext.similarity import cosine_topk

    df, base = planted_vectors
    q = [float(x) for x in base]
    cents = train_centroids(df, "embedding", k=4, seed=42)
    approx = ivf_topk(
        df, "embedding", "vec_id", q, k=5, nprobe=4, centroids=cents
    )
    exact = cosine_topk(df, "embedding", "vec_id", q, k=5)
    assert [r.vec_id for r in approx.collect()] == [
        r.vec_id for r in exact.collect()
    ]


def test_bucketed_join_is_shuffle_free(spark, testdata, tmp_path):
    """bucketBy co-location: joining two tables bucketed on the same key
    plans a SortMergeJoin with NO Exchange — the 100 TB fact-fact join."""
    wh = str(tmp_path / "wh")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bkt LOCATION '{wh}'")
    for name, df, key in (
        ("orders_b", testdata["orders"], "o_orderkey"),
        ("lineitem_b", testdata["lineitem"], "l_orderkey"),
    ):
        (
            df.write.mode("overwrite")
            .bucketBy(8, key)
            .sortBy(key)
            .option("path", f"{wh}/{name}")
            .saveAsTable(f"bkt.{name}")
        )
    # force the sort-merge path: at this test SF Spark would broadcast
    # (and skip bucket use); at 100 TB neither side is broadcastable
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("bkt.orders_b").join(
            spark.table("bkt.lineitem_b"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        joined.collect()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        # co-located buckets: the join needs NO shuffle exchange
        assert "Exchange hashpartitioning" not in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    spark.sql("DROP TABLE bkt.orders_b")
    spark.sql("DROP TABLE bkt.lineitem_b")
    spark.sql("DROP DATABASE bkt")


def test_watermark_drops_late_rows(spark, tmp_path):
    """Append-mode windowed agg with watermark: a row arriving after the
    watermark has passed its window is dropped (state eviction — the
    requirement for unbounded streams)."""
    from data_lakehouse_project_spark.streaming.events import (
        streaming_hourly_rollup,
    )

    schema = "event_id long, ts timestamp, user_id long, event_type string, value double"
    src = str(tmp_path / "late_src")
    ckpt = str(tmp_path / "late_ckpt")
    base = datetime.datetime(2024, 1, 1, 0, 0, 0)

    batch1 = spark.createDataFrame(
        [
            (1, base, 1, "click", 1.0),
            (2, base + datetime.timedelta(hours=5), 1, "click", 1.0),  # advances watermark to 3h
        ],
        schema,
    )
    batch1.write.mode("overwrite").parquet(src)

    out = str(tmp_path / "late_out")

    def run_once():
        stream = spark.readStream.schema(batch1.schema).parquet(src)
        q = (
            streaming_hourly_rollup(stream, watermark="2 hours")
            .writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    # batch 2: a row for hour 0 — its window closed once watermark hit 3h
    spark.createDataFrame(
        [(3, base + datetime.timedelta(minutes=30), 1, "click", 99.0)], schema
    ).write.mode("append").parquet(src)
    run_once()

    rows = spark.read.parquet(out).collect()
    hour0 = [r for r in rows if r.window_start == "2024-01-01 00:00:00"]
    # hour-0 window emitted once with the on-time row only; late row dropped
    assert sum(r.event_count for r in hour0) == 1
