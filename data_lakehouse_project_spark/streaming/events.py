"""Event analytics: batch windowed rollups + Structured Streaming.

The reference has no streaming surface (SURVEY §2.9); this implements the
north-star event operators (SURVEY §2.8) batch-first — every batch
operator has identical semantics when fed by ``readStream`` because they
are expressed as time-window groupBys, the shape Structured Streaming
supports incrementally with watermarks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_lakehouse_project_spark.schemas import EVENT_PROPS


def parse_props(df: DataFrame, props_col: str = "props") -> DataFrame:
    """JSON-in-string column → typed struct (SURVEY §2.8 `events.props`).

    ``from_json`` with an explicit schema — schema-on-read stays a JVM
    projection, no sampling pass, no Python.
    """
    return df.withColumn("props_parsed", F.from_json(F.col(props_col), EVENT_PROPS))


def hourly_rollup(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Tumbling 1-hour rollup per event_type: count + value sum.

    Batch expression of the streaming windowed-agg shape: group on
    (date_trunc(hour, ts), event_type) — one shuffle, partial aggregation
    upstream. Window start is emitted as a formatted string so results are
    timezone-stable for external comparison.
    """
    return (
        df.groupBy(
            F.date_format(
                F.date_trunc("hour", F.col(ts_col)), "yyyy-MM-dd HH:mm:ss"
            ).alias("window_start"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("event_count"),
            F.round(F.sum("value"), 2).alias("value_sum"),
        )
    )


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
) -> DataFrame:
    """Per-user session assignment via gap analysis (lag window).

    A new session starts when the gap since the previous event exceeds
    ``gap_minutes``. One shuffle on user_id; the window sort is per-user.
    Returns (user_id, n_sessions, n_events).

    Gaps are computed on a timezone-independent microsecond epoch:
    TIMESTAMP_NTZ wall clocks are measured with ``timestampdiff`` against
    an NTZ epoch literal (``unix_timestamp`` would interpret them in the
    session time zone, distorting any gap that spans a DST transition,
    and truncates sub-second precision); TIMESTAMP instants use
    ``unix_micros`` (already an absolute instant).
    """
    from pyspark.sql.types import TimestampNTZType
    from pyspark.sql.window import Window

    w = Window.partitionBy(user_col).orderBy(ts_col)
    gap_us = gap_minutes * 60 * 1_000_000
    if isinstance(df.schema[ts_col].dataType, TimestampNTZType):
        ntz_epoch = F.lit("1970-01-01 00:00:00").cast("timestamp_ntz")

        def _epoch_us(c):
            return F.timestamp_diff("MICROSECOND", ntz_epoch, c)
    else:
        def _epoch_us(c):
            return F.unix_micros(F.col(c) if isinstance(c, str) else c)

    with_breaks = df.withColumn(
        "new_session",
        F.when(
            _epoch_us(F.col(ts_col))
            - _epoch_us(F.lag(F.col(ts_col)).over(w))
            > gap_us,
            1,
        )
        .when(F.lag(F.col(ts_col)).over(w).isNull(), 1)
        .otherwise(0),
    )
    return with_breaks.groupBy(user_col).agg(
        F.sum("new_session").alias("n_sessions"),
        F.count(F.lit(1)).alias("n_events"),
    )


def gapfill_hourly(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Hourly totals on a dense time spine: missing hours appear with
    count 0, and value_sum is forward-filled from the last seen hour.

    The spine is generated from the table's own min/max (sequence +
    explode — a few thousand rows even for years of hours, so the
    cross-join with the 1-row bounds aggregate is trivial); the rollup
    left-joins onto it; the forward fill is last_value(ignorenulls) over
    the spine order. Shape: 2 scans (bounds + rollup), one broadcast-ish
    join, one window — no driver-side iteration.
    """
    from pyspark.sql.window import Window

    bounds = df.agg(
        F.date_trunc("hour", F.min(ts_col)).alias("lo"),
        F.date_trunc("hour", F.max(ts_col)).alias("hi"),
    )
    spine = bounds.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
        ).alias("bucket")
    )
    hourly = df.groupBy(
        F.date_trunc("hour", F.col(ts_col)).alias("bucket")
    ).agg(
        F.count(F.lit(1)).alias("event_count"),
        F.sum("value").alias("value_sum"),
    )
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    return (
        spine.join(hourly, "bucket", "left")
        .select(
            F.date_format("bucket", "yyyy-MM-dd HH:mm:ss").alias("bucket"),
            F.coalesce("event_count", F.lit(0)).alias("event_count"),
            "value_sum",
        )
        .withColumn(
            "value_sum_ffill", F.last("value_sum", ignorenulls=True).over(w)
        )
    )


def streaming_hourly_rollup(
    stream_df: DataFrame, ts_col: str = "ts", watermark: str = "2 hours"
) -> DataFrame:
    """Structured Streaming variant of ``hourly_rollup``.

    ``F.window`` + watermark so state for closed windows is evicted — the
    requirement for unbounded 100 TB/day streams. Feed with
    ``spark.readStream`` and sink with ``writeStream`` (see tests for a
    memory-sink example); the aggregation logic matches the batch rollup.
    """
    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), "1 hour"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("event_count"),
            F.round(F.sum("value"), 2).alias("value_sum"),
        )
        .select(
            F.date_format("window.start", "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
            "event_count",
            "value_sum",
        )
    )


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    max_delay: str = "30 minutes",
) -> DataFrame:
    """Watermarked stream-stream inner join: pair each left event with
    the same key's right events arriving within ``(left_ts, left_ts +
    max_delay]``.

    Both sides carry a watermark equal to the join window, which is what
    lets Spark bound the join state (rows older than the watermark can
    never match and are evicted) — without it a stream-stream join is an
    unbounded state buildup, the classic 100 TB/day failure mode. The
    same plan runs in batch mode (watermarks become no-ops), so batch
    equivalence is testable.

    Returns (key, left_ts, left_type, right_ts, right_type, delay_s).
    """
    lw = left.withWatermark(ts_col, max_delay).select(
        F.col(key).alias("k"),
        F.col(ts_col).alias("l_ts"),
        F.col("event_type").alias("l_type"),
    )
    rw = right.withWatermark(ts_col, max_delay).select(
        F.col(key).alias("r_k"),
        F.col(ts_col).alias("r_ts"),
        F.col("event_type").alias("r_type"),
    )
    cond = (
        (F.col("k") == F.col("r_k"))
        & (F.col("r_ts") > F.col("l_ts"))
        & (F.col("r_ts") <= F.col("l_ts") + F.expr(f"INTERVAL {max_delay}"))
    )
    return (
        lw.join(rw, cond)
        .select(
            F.col("k").alias(key),
            "l_ts",
            "l_type",
            "r_ts",
            "r_type",
            (F.unix_timestamp("r_ts") - F.unix_timestamp("l_ts"))
            .cast("long")
            .alias("delay_s"),
        )
    )


def streaming_session_rollup(
    stream: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Stateful session aggregation on a stream: ``session_window``
    merges a user's events into gap-separated sessions as state, emitting
    each session once its window falls behind the watermark (append
    mode). The batch twin is the same groupBy on a static frame —
    tests assert they agree on every closed session.
    """
    return (
        stream.withWatermark("ts", watermark)
        .groupBy("user_id", F.session_window("ts", gap))
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
    )


def streaming_dedup_within_watermark(
    stream_df: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """At-least-once → effectively-once: drop duplicate events by key
    with ``dropDuplicatesWithinWatermark`` so the dedup STATE is evicted
    once the watermark passes — the requirement for unbounded streams
    (a plain ``dropDuplicates`` on a stream keys state forever and OOMs
    at 100 TB/day; the within-watermark variant bounds state to the
    watermark horizon while deduplicating events whose duplicates
    arrive within it, the Kafka-redelivery case).

    The first-arrival row wins (per the operator's contract). Emits the
    input schema unchanged.
    """
    return stream_df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        keys
    )
