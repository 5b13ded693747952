"""Event analytics: batch/stream parity + sessionization properties."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from data_lakehouse_project_spark.streaming import (
    hourly_rollup,
    parse_props,
    sessionize,
    streaming_hourly_rollup,
)


@pytest.fixture(scope="module")
def events(spark):
    base = datetime.datetime(2024, 1, 1, 0, 0, 0)
    rows = []
    for i in range(40):
        rows.append(
            (
                i,
                base + datetime.timedelta(minutes=7 * i),
                i % 3,
                ["click", "view"][i % 2],
                float(i),
                '{"k": %d}' % (i % 5),
            )
        )
    return spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


def test_parse_props(events):
    parsed = parse_props(events)
    r = parsed.select("props_parsed.k").collect()
    assert {row.k for row in r} == {0, 1, 2, 3, 4}


def test_hourly_rollup_counts(events):
    out = hourly_rollup(events)
    total = sum(r.event_count for r in out.collect())
    assert total == 40  # partition of the input — no loss, no dup
    # 40 events * 7min ≈ 4.6h → 5 hourly windows × ≤2 types
    starts = {r.window_start for r in out.collect()}
    assert len(starts) == 5


def test_sessionize_gap_semantics(spark):
    base = datetime.datetime(2024, 1, 1)
    rows = [
        (1, 100, base),
        (2, 100, base + datetime.timedelta(minutes=10)),  # same session
        (3, 100, base + datetime.timedelta(minutes=50)),  # 40min gap → new
        (4, 200, base),
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    got = {r.user_id: (r.n_sessions, r.n_events) for r in sessionize(df).collect()}
    assert got[100] == (2, 3)
    assert got[200] == (1, 1)


def test_gapfill_fills_missing_hours(spark):
    """A 3-hour gap appears on the spine with count 0 and carried value."""
    import datetime

    from data_lakehouse_project_spark.streaming.events import gapfill_hourly

    t0 = datetime.datetime(2024, 1, 1, 0, 30)
    rows = [
        (1, t0, 1, "click", 10.0, "{}"),
        (2, t0 + datetime.timedelta(hours=4), 1, "click", 20.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = {r.bucket: r for r in gapfill_hourly(df).collect()}
    assert len(out) == 5  # hours 00..04 inclusive
    gap = out["2024-01-01 02:00:00"]
    assert gap.event_count == 0
    assert gap.value_sum is None
    assert gap.value_sum_ffill == 10.0  # carried forward from hour 0


def test_streaming_matches_batch(spark, events, tmp_path):
    """Structured Streaming rollup over a file source == batch rollup."""
    src = str(tmp_path / "events_src")
    events.write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(events.schema).parquet(src)
    agg = streaming_hourly_rollup(stream)
    q = (
        agg.writeStream.format("memory")
        .queryName("rollup_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r.window_start, r.event_type): (r.event_count, r.value_sum)
        for r in spark.sql("SELECT * FROM rollup_test").collect()
    }
    want = {
        (r.window_start, r.event_type): (r.event_count, r.value_sum)
        for r in hourly_rollup(events).collect()
    }
    assert got == want


def test_stream_stream_interval_join_matches_batch(spark, events, tmp_path):
    """Watermarked stream-stream join (availableNow) == batch interval join."""
    from data_lakehouse_project_spark.streaming.events import (
        stream_stream_interval_join,
    )

    clicks = events.where(F.col("event_type") == "click")
    views = events.where(F.col("event_type") == "view")
    csrc, vsrc = str(tmp_path / "clicks"), str(tmp_path / "views")
    clicks.write.mode("overwrite").parquet(csrc)
    views.write.mode("overwrite").parquet(vsrc)

    cstream = spark.readStream.schema(events.schema).parquet(csrc)
    vstream = spark.readStream.schema(events.schema).parquet(vsrc)
    joined = stream_stream_interval_join(cstream, vstream, max_delay="30 minutes")
    q = (
        joined.writeStream.format("memory")
        .queryName("ssj_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        tuple(r) for r in spark.sql(
            "SELECT user_id, l_ts, r_ts, delay_s FROM ssj_test"
        ).collect()
    }
    want = {
        tuple(r)
        for r in stream_stream_interval_join(clicks, views, max_delay="30 minutes")
        .select("user_id", "l_ts", "r_ts", "delay_s")
        .collect()
    }
    assert got == want
    assert len(want) > 0  # the window actually matches something
    # every delay respects the interval bound
    assert all(0 < r[3] <= 1800 for r in want)


def test_streaming_session_window_matches_batch(spark, events, tmp_path):
    """Stateful streaming session_window (append + watermark) emits
    exactly the batch sessions once the watermark passes them. A
    far-future sentinel event advances the watermark past every real
    session so all of them close and emit."""
    from data_lakehouse_project_spark.streaming.events import (
        streaming_session_rollup,
    )

    sentinel = spark.createDataFrame(
        [(999, datetime.datetime(2024, 1, 3, 0, 0, 0), 99, "click", 0.0, "{}")],
        events.schema,
    )
    src = str(tmp_path / "sess_src")
    events.unionByName(sentinel).write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(events.schema).parquet(src)
    q = (
        streaming_session_rollup(stream)
        .writeStream.format("memory")
        .queryName("sess_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r.user_id, r.session_start, r.session_end): (r.n_events, r.value_sum)
        for r in spark.sql(
            "SELECT * FROM sess_test WHERE user_id != 99"
        ).collect()
    }
    want = {
        (r.user_id, r.session_start, r.session_end): (r.n_events, r.value_sum)
        for r in events.groupBy(
            "user_id", F.session_window("ts", "30 minutes")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("value_sum"),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "value_sum",
        )
        .collect()
    }
    assert got == want


def test_hll_rollup_merge_equals_direct(spark, events):
    """Merging daily HLL sketches into months must give EXACTLY the same
    estimates as sketching each month directly (sketch-union
    associativity), and estimates must be near-exact at this cardinality."""
    from data_lakehouse_project_spark.streaming.rollup import (
        hll_daily_users,
        hll_monthly_from_daily,
    )

    daily = hll_daily_users(events)
    merged = {
        r.month: r.users_est
        for r in hll_monthly_from_daily(daily).collect()
    }
    direct = {
        r.month: r.est
        for r in events.groupBy(
            F.date_trunc("month", F.col("ts")).alias("month")
        )
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est"))
        .collect()
    }
    assert merged == direct
    exact = {
        r.month: r.n
        for r in events.groupBy(
            F.date_trunc("month", F.col("ts")).alias("month")
        )
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for m, est in merged.items():
        assert abs(est - exact[m]) <= max(1, 0.02 * exact[m])


def test_checkpoint_recovery_exactly_once(spark, events, tmp_path):
    """Stop a file-source stream mid-history, add new input, restart
    from the SAME checkpoint: the parquet sink must contain every event
    exactly once — the offset log replays only unprocessed files."""
    src = str(tmp_path / "ck_src")
    sink = str(tmp_path / "ck_sink")
    ckpt = str(tmp_path / "ck_state")

    first = events.where(F.col("event_id") < 20)
    second = events.where(F.col("event_id") >= 20)
    first.write.mode("overwrite").parquet(src)

    def run_once():
        stream = spark.readStream.schema(events.schema).parquet(src)
        q = (
            stream.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    n1 = spark.read.parquet(sink).count()
    assert n1 == first.count()

    # new files arrive while the stream is down; restart from checkpoint
    second.write.mode("append").parquet(src)
    run_once()
    out = spark.read.parquet(sink)
    assert out.count() == events.count()  # no loss
    assert out.select("event_id").distinct().count() == events.count()  # no dups


def test_stream_static_enrichment_join(spark, events, tmp_path):
    """Stream-static join: a streaming fact enriched against a static
    dimension (broadcast per micro-batch, no state store, no watermark
    needed) — the bronze-enrichment shape. Result must equal the batch
    join, and unmatched stream rows survive via left join."""
    dim = spark.createDataFrame(
        [(0, "segment_a"), (1, "segment_b")], "user_id int, segment string"
    )  # user_id 2 deliberately missing

    src = str(tmp_path / "ss_src")
    events.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(events.schema).parquet(src)

    enriched = stream.join(F.broadcast(dim), "user_id", "left").groupBy(
        F.coalesce("segment", F.lit("unknown")).alias("segment")
    ).agg(F.count(F.lit(1)).alias("n"))

    q = (
        enriched.writeStream.format("memory")
        .queryName("ss_enriched")
        .outputMode("complete")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ss_ckpt"))
        .start()
    )
    q.awaitTermination(120)

    got = {
        r.segment: r.n
        for r in spark.sql("SELECT * FROM ss_enriched").collect()
    }
    want = {
        r.segment: r.n
        for r in events.join(F.broadcast(dim), "user_id", "left")
        .groupBy(F.coalesce("segment", F.lit("unknown")).alias("segment"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want and "unknown" in got  # user 2 rows kept


def test_streaming_dedup_within_watermark(spark, tmp_path):
    """Redelivered events (same event_id) within the watermark horizon
    are dropped; the output carries each key exactly once."""
    import datetime as dt

    from data_lakehouse_project_spark.streaming.events import (
        streaming_dedup_within_watermark,
    )

    t0 = dt.datetime(2024, 6, 1, 12, 0, 0)
    rows = [
        (1, t0, "click", 1.0),
        (1, t0, "click", 1.0),                       # exact redelivery
        (1, t0 + dt.timedelta(minutes=5), "click", 1.0),  # late dup, same id
        (2, t0 + dt.timedelta(minutes=1), "view", 2.0),
    ]
    src = str(tmp_path / "dedup_src")
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    )
    df.write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(df.schema).parquet(src)
    deduped = streaming_dedup_within_watermark(
        stream, keys=["event_id"], watermark="1 hour"
    )
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_wm_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = spark.sql(
        "SELECT event_id, count(*) AS n FROM dedup_wm_test GROUP BY 1"
    ).collect()
    assert {r.event_id: r.n for r in got} == {1: 1, 2: 1}
