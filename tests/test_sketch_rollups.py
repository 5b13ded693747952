"""Mergeable sketch hierarchies (streaming/rollup.py): KLL quantile
rollups and theta-sketch set algebra — the decomposable-partial pattern
that makes quantile/overlap hierarchies affordable without raw rescans."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def sketch_events(spark):
    """6 days × 400 events; user populations shift by 100/day so
    consecutive days overlap in exactly 300 users."""
    base = datetime.datetime(2024, 1, 1, 0, 0, 0)
    rows = []
    for d in range(6):
        for i in range(400):
            rows.append(
                (
                    base + datetime.timedelta(days=d, minutes=i),
                    d * 100 + i,  # users [100d, 100d+400): 300 shared
                    float((i * 37 + d * 11) % 1000),
                )
            )
    return spark.createDataFrame(
        rows, "ts timestamp, user_id long, value double"
    )


def test_kll_monthly_merge_tracks_exact_quantiles(spark, sketch_events):
    from data_lakehouse_project_spark.streaming.rollup import (
        kll_daily_value_sketch,
        kll_monthly_quantiles,
    )

    daily = kll_daily_value_sketch(sketch_events)
    assert daily.count() == 6
    assert {int(r.n) for r in daily.collect()} == {400}

    monthly = kll_monthly_quantiles(daily, quantiles=(0.5, 0.95)).collect()
    assert len(monthly) == 1
    row = monthly[0]
    assert int(row.n) == 2400  # every daily sketch merged, none dropped

    # rank guarantee: the merged estimate must sit between the exact
    # quantiles at q +/- 0.05 (KLL default-k error is ~1.7%)
    exact = sketch_events.agg(
        *[
            F.expr(
                f"percentile_cont({q}) WITHIN GROUP (ORDER BY value)"
            ).alias(f"q{int(q * 100)}")
            for q in (0.45, 0.55, 0.90, 0.99)
        ]
    ).first()
    assert exact.q45 <= row.p50 <= exact.q55
    assert exact.q90 <= row.p95 <= exact.q99


def test_theta_daily_and_returning_users(spark, sketch_events):
    from data_lakehouse_project_spark.streaming.rollup import (
        theta_daily_users,
        theta_returning_users,
    )

    daily = theta_daily_users(sketch_events)
    # below the sketch's exact-mode threshold -> estimates are exact
    for r in daily.collect():
        assert abs(r.users_est - 400) / 400 < 0.02

    flows = {
        r.day.day: (r.returning_est, r.new_est, r.churned_est)
        for r in theta_returning_users(daily).collect()
    }
    assert set(flows) == {2, 3, 4, 5, 6}  # one row per consecutive pair
    for day, (ret, new, churn) in flows.items():
        assert abs(ret - 300) / 300 < 0.05, (day, ret)
        assert abs(new - 100) / 100 < 0.05, (day, new)
        assert abs(churn - 100) / 100 < 0.05, (day, churn)


def test_theta_union_matches_hll_story(spark, sketch_events):
    """Theta union across all days ≡ global distinct (exact mode), so
    the same rollup feeds both the union hierarchy and the set algebra."""
    from data_lakehouse_project_spark.streaming.rollup import (
        theta_daily_users,
    )

    daily = theta_daily_users(sketch_events)
    est = daily.agg(
        F.theta_sketch_estimate(
            F.theta_union_agg("user_sketch")
        ).alias("est")
    ).first()
    exact = sketch_events.select("user_id").distinct().count()  # 900
    assert abs(est.est - exact) / exact < 0.02


def test_streaming_maintained_theta_rollup_equals_batch(
    spark, sketch_events, tmp_path
):
    """Sketches are the streaming-friendly aggregate: per micro-batch,
    daily theta sketches merge (theta_union_agg) into a persisted
    delta-lite rollup — no raw-event state retained — and the drained
    rollup's estimates equal computing over all events at once."""
    from data_lakehouse_project_spark.operators.txnlog import TxnTable
    from data_lakehouse_project_spark.streaming.rollup import (
        theta_daily_users,
    )

    src = str(tmp_path / "sk_src")
    rollup = TxnTable(str(tmp_path / "sk_rollup"))
    sketch_events.where("user_id % 2 = 0").write.mode("overwrite").parquet(src)
    sketch_events.where("user_id % 2 = 1").write.mode("append").parquet(src)

    def _apply(batch_df, _bid):
        daily = theta_daily_users(batch_df).select("day", "user_sketch")
        if rollup.latest_version() >= 0:
            daily = rollup.read(batch_df.sparkSession).unionByName(daily)
        merged = daily.groupBy("day").agg(
            F.theta_union_agg("user_sketch").alias("user_sketch")
        )
        rollup.write(merged, mode="overwrite")

    q = (
        spark.readStream.schema(sketch_events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(_apply)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "sk_ckpt"))
        .start()
    )
    q.awaitTermination(180)

    got = {
        r.day: round(r.est)
        for r in rollup.read(spark)
        .select("day", F.theta_sketch_estimate("user_sketch").alias("est"))
        .collect()
    }
    want = {
        r.day: round(r.est)
        for r in theta_daily_users(sketch_events)
        .select("day", F.col("users_est").alias("est"))
        .collect()
    }
    assert got == want and len(got) == 6
