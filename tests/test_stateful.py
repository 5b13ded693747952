"""Custom stateful streaming operator (applyInPandasWithState)."""

from __future__ import annotations

import datetime


def test_running_user_profile_matches_batch(spark, tmp_path):
    from pyspark.sql import functions as F

    from data_lakehouse_project_spark.streaming.stateful import (
        running_user_profile,
    )

    base = datetime.datetime(2024, 1, 1)
    rows = [
        (i, base + datetime.timedelta(minutes=i), i % 4, float(i))
        for i in range(40)
    ]
    events = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )
    src = str(tmp_path / "events_state_src")
    events.write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(events.schema).parquet(src)
    q = (
        running_user_profile(stream)
        .writeStream.format("memory")
        .queryName("profiles")
        .outputMode("update")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)

    got = {
        r.user_id: (r.n_events, r.value_sum)
        for r in spark.sql("SELECT * FROM profiles").collect()
    }
    want = {
        r.user_id: (r.n, r.s)
        for r in events.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    assert got == want
