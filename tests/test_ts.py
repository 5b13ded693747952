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
