"""Batch 3 (registry_ts): cross-implementation invariants for the
window-bucketing and lateral operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_lakehouse_project_spark import registry_ts as TS
from data_lakehouse_project_spark.sources.readers import load_testdata
from data_lakehouse_project_spark.streaming.events import sessionize
from tests.conftest import SF_DIR


def test_session_window_agrees_with_gaps_and_islands(spark):
    """F.session_window and the lag/cumsum sessionize are independent
    implementations of the same semantics — per-user session counts and
    total event counts must match exactly."""
    sw = (
        TS.q_events_session_window(spark, SF_DIR)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum("n_events").alias("n_events"),
        )
    )
    gi = sessionize(load_testdata(spark, SF_DIR)["events"], gap_minutes=30)
    mismatches = (
        sw.alias("a")
        .join(gi.alias("b"), "user_id", "full_outer")
        .where(
            (F.col("a.n_sessions") != F.col("b.n_sessions"))
            | (F.col("a.n_events") != F.col("b.n_events"))
            | F.col("a.n_sessions").isNull()
            | F.col("b.n_sessions").isNull()
        )
        .count()
    )
    assert mismatches == 0


def test_session_windows_are_disjoint_per_user(spark):
    """Within a user, merged session windows must not overlap."""
    from pyspark.sql.window import Window

    df = TS.q_events_session_window(spark, SF_DIR)
    w = Window.partitionBy("user_id").orderBy("session_start")
    overlaps = (
        df.withColumn("prev_end", F.lag("session_end").over(w))
        .where(F.col("prev_end").isNotNull() & (F.col("session_start") < F.col("prev_end")))
        .count()
    )
    assert overlaps == 0


def test_hopping_window_double_counts_exactly(spark):
    """Size 2h / slide 1h: every event lands in exactly 2 windows."""
    n_events = load_testdata(spark, SF_DIR)["events"].count()
    total = (
        TS.q_events_hopping_window(spark, SF_DIR)
        .agg(F.sum("n_events").alias("t"))
        .collect()[0]["t"]
    )
    assert total == 2 * n_events


def test_explode_outer_keeps_empty_docs(spark):
    """explode_outer must keep one NULL row per matchless document, so
    distinct doc_ids are preserved; plain explode would drop them."""
    docs = load_testdata(spark, SF_DIR)["documents"]
    out = TS.q_explode_outer_lateral(spark, SF_DIR)
    assert out.select("doc_id").distinct().count() == docs.count()
    assert out.where(F.col("long_token").isNull()).count() > 0


def test_funnel_monotone_and_cohort_conserves_users(spark):
    """Funnel stages can only shrink; cohort cells at weeks_since=0
    cover every user exactly once (each user appears in their own
    cohort's first week)."""
    from data_lakehouse_project_spark import registry_ts as TS2

    stages = {
        r.stage: r.n_users for r in TS2.q_events_funnel(spark, SF_DIR).collect()
    }
    assert (
        stages["1_view"]
        >= stages["2_click_after_view"]
        >= stages["3_purchase_after_click"]
    )
    cohort = TS2.q_events_cohort_retention(spark, SF_DIR).collect()
    week0_users = sum(r.active_users for r in cohort if r.weeks_since == 0)
    n_users = (
        load_testdata(spark, SF_DIR)["events"]
        .select("user_id")
        .distinct()
        .count()
    )
    assert week0_users == n_users
    assert all(r.weeks_since >= 0 for r in cohort)


def test_rolling_anomaly_flags_injected_spike(spark, tmp_path):
    """A flat hourly baseline with one 10x spike: the spike hour (and
    only it) must be flagged, and its own count must not contaminate
    its baseline (trailing frame excludes the current row)."""
    import datetime

    from data_lakehouse_project_spark.registry_ts import (
        q_events_rolling_anomaly,
    )

    base = datetime.datetime(2024, 3, 1)
    rows = []
    eid = 0
    for h in range(48):
        # varying baseline (4/5/6) so the trailing sd is nonzero —
        # a perfectly flat baseline has sd=0 and emits no score by design
        burst = 50 if h == 40 else 4 + (h % 3)
        for i in range(burst):
            rows.append(
                (eid, base + datetime.timedelta(hours=h, minutes=i % 60),
                 1, "click", 1.0, "{}")
            )
            eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    sf_dir = str(tmp_path / "sfanom")
    import os

    os.makedirs(sf_dir, exist_ok=True)
    df.write.mode("overwrite").parquet(os.path.join(sf_dir, "events.parquet"))

    out = q_events_rolling_anomaly(spark, sf_dir).collect()
    flagged = [r.hour for r in out if r.is_anomaly]
    assert flagged == ["2024-03-02 16:00:00"]  # hour 40 = Mar 2, 16:00
    # hours right after the spike are NOT flagged (baseline absorbs it)
    zs = {r.hour: r.z for r in out}
    assert zs["2024-03-02 17:00:00"] is not None
    assert abs(zs["2024-03-02 17:00:00"]) < 3
