"""Streaming throughput/latency probe (round-5 verdict task 8).

The streaming surface is correctness-tested (exactly-once MERGE,
sessionize ≡ batch) but was never measured. This probe drives the rate
source at increasing target rows/sec through two sink shapes and
records, per rate step, the MEASURED processing rate and end-to-end
micro-batch latency from ``StreamingQuery.recentProgress``:

* **rollup** — watermarked windowed aggregation (the
  ``streaming_hourly_rollup`` shape at 1-minute grain so state
  actually turns over during the probe) to a noop-equivalent
  foreachBatch sink.
* **merge**  — ``foreachBatch`` exactly-once MERGE into a delta-lite
  table (``TxnTable.streaming_merge``), the CDC-apply shape: every
  batch pays the find-touched-files join + rewrite + commit.

A rate step is SUSTAINED when the processing rate keeps up with the
input rate (no growing backlog: processedRowsPerSecond ≥ ~95% of
inputRowsPerSecond once warm). The knee is the first step that fails —
reported explicitly, with batch-duration percentiles so the latency
cliff is visible alongside the throughput ceiling. Results go into
BASELINE.md ("streaming throughput" section).

Usage: python tools/streaming_probe.py [rollup|merge ...] [rates...]
"""

from __future__ import annotations

import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from data_lakehouse_project_spark import get_spark

RATES = [50_000, 200_000, 500_000, 1_000_000, 2_000_000, 4_000_000]
STEP_SECONDS = 25
WARM_BATCHES = 3  # skip ramp-up progress entries


def _rate_events(spark, rows_per_second: int):
    """rate source -> events-shaped stream (ts, user_id, event_type,
    value): the arithmetic projection is deliberately cheap so the
    probe measures the SINK pipeline, not synthetic-data generation."""
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .option("numPartitions", 8)
        .load()
        .select(
            F.col("timestamp").alias("ts"),
            (F.col("value") % 10_000).alias("user_id"),
            F.concat(
                F.lit("type_"), (F.col("value") % 7).cast("string")
            ).alias("event_type"),
            (F.col("value") % 1000).cast("double").alias("value"),
        )
    )


def _drain(query, seconds: int):
    # wait the step, then keep waiting (up to 3×) until enough batches
    # completed to skip warmup — near the knee individual batches can
    # exceed the whole step
    deadline = time.time() + 3 * seconds
    time.sleep(seconds)
    while (
        len(query.recentProgress) <= WARM_BATCHES + 1
        and time.time() < deadline
    ):
        time.sleep(2)
    progress = list(query.recentProgress)
    query.stop()
    warm = min(WARM_BATCHES, max(0, len(progress) - 2))
    rows = []
    for p in progress[warm:]:
        if p["numInputRows"] == 0 or p["inputRowsPerSecond"] is None:
            continue
        rows.append(
            (
                p["inputRowsPerSecond"],
                p["processedRowsPerSecond"],
                p["batchDuration"],
            )
        )
    return rows


def _report(shape: str, rate: int, rows) -> bool:
    if not rows:
        print(f"{shape:7s} rate={rate:>9,}/s  (no steady batches)")
        return False
    in_rps = statistics.median(r[0] for r in rows)
    proc_rps = statistics.median(r[1] for r in rows)
    durs = sorted(r[2] for r in rows)
    p50 = statistics.median(durs)
    p95 = durs[max(0, int(len(durs) * 0.95) - 1)]
    sustained = proc_rps >= 0.95 * in_rps
    print(
        f"{shape:7s} rate={rate:>9,}/s  in={in_rps:>11,.0f}/s "
        f"proc={proc_rps:>11,.0f}/s  batch p50={p50:>6,.0f}ms "
        f"p95={p95:>6,.0f}ms  {'SUSTAINED' if sustained else 'KNEE'}",
        flush=True,
    )
    return sustained


def probe_rollup(spark, rates) -> None:
    from data_lakehouse_project_spark.streaming.events import (
        streaming_hourly_rollup,
    )

    for rate in rates:
        events = _rate_events(spark, rate)
        agg = streaming_hourly_rollup(
            events, ts_col="ts", watermark="30 seconds"
        )
        with tempfile.TemporaryDirectory() as ckpt:
            q = (
                agg.writeStream.outputMode("update")
                .foreachBatch(lambda df, bid: df.write.format(
                    "noop").mode("overwrite").save())
                .option("checkpointLocation", ckpt)
                .trigger(processingTime="2 seconds")
                .start()
            )
            rows = _drain(q, STEP_SECONDS)
        if not _report("rollup", rate, rows):
            break


def probe_merge(spark, rates) -> None:
    from data_lakehouse_project_spark.operators.txnlog import TxnTable

    for rate in rates:
        with tempfile.TemporaryDirectory() as root:
            t = TxnTable(os.path.join(root, "t"))
            # seed the target so every batch's merge joins a real table
            t.write(
                spark.range(0, 10_000).selectExpr(
                    "id AS user_id",
                    "timestamp'2024-01-01' AS ts",
                    "'seed' AS event_type",
                    "CAST(0.0 AS DOUBLE) AS value",
                ),
                mode="overwrite",
            )
            events = _rate_events(spark, rate)
            # upsert at user grain: aggregate the batch to the key
            # first (MERGE requires unique source keys), the standard
            # CDC compaction
            apply_batch = t.streaming_merge(
                "probe", ["user_id"], matched_update="all", insert=True
            )

            def _apply(df, bid, apply_batch=apply_batch):
                compact = (
                    df.groupBy("user_id")
                    .agg(
                        F.max("ts").alias("ts"),
                        F.max("event_type").alias("event_type"),
                        F.sum("value").alias("value"),
                    )
                    .select("user_id", "ts", "event_type", "value")
                )
                apply_batch(compact, bid)

            ckpt = os.path.join(root, "ckpt")
            q = (
                events.writeStream.foreachBatch(_apply)
                .option("checkpointLocation", ckpt)
                .trigger(processingTime="2 seconds")
                .start()
            )
            rows = _drain(q, STEP_SECONDS)
        if not _report("merge", rate, rows):
            break


def main() -> None:
    args = sys.argv[1:]
    shapes = [a for a in args if not a.replace("_", "").isdigit()]
    rates = [int(a) for a in args if a.replace("_", "").isdigit()]
    shapes = shapes or ["rollup", "merge"]
    rates = rates or RATES
    spark = get_spark(app_name="streaming-probe")
    spark.sparkContext.setLogLevel("ERROR")
    if "rollup" in shapes:
        probe_rollup(spark, rates)
    if "merge" in shapes:
        probe_merge(spark, rates)
    spark.stop()


if __name__ == "__main__":
    main()
