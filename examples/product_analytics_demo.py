"""Runnable product-analytics tour: the round-5 analytics surface on
one event stream.

Loads the driver testdata events table and walks the full
"what happened, why, what's next" readout a product team runs:

  1. attribution  — which channels drive purchases (last-touch + linear)
  2. A/B readout  — md5-parity experiment, two-proportion z-test
  3. top paths    — most common user-day navigation sequences
  4. transitions  — first-order Markov matrix between event types
  5. downsampling — M4 pixel-exact series reduction for the dashboard
  6. forecast     — SES smoothing + Holt linear projection of daily GMV

    python examples/product_analytics_demo.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from data_lakehouse_project_spark import get_spark
from data_lakehouse_project_spark.ext.abtest import (
    ab_test_proportions,
    assign_and_measure,
)
from data_lakehouse_project_spark.ext.attribution import attribution_report
from data_lakehouse_project_spark.ext.downsample import (
    epoch_bucket,
    m4_downsample,
)
from data_lakehouse_project_spark.ext.forecast import holt_forecast, ses_smooth
from data_lakehouse_project_spark.sources.readers import load_testdata


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="product-analytics-demo")
    events = load_testdata(spark, sf_dir)["events"]

    print("\n== 1. channel attribution (last-touch vs linear) ==")
    for model in ("last", "linear"):
        rep = attribution_report(events, model=model).withColumn(
            "model", F.lit(model)
        )
        rep.orderBy("touch_type").show(truncate=False)

    print("== 2. A/B readout on purchase conversion ==")
    ab_test_proportions(assign_and_measure(events)).show(truncate=False)

    print("== 3. top user-day paths ==")
    seq = F.array_join(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct("ts", "event_id", "event_type"))
            ),
            lambda s: s["event_type"],
        ),
        ">",
    )
    (
        events.groupBy("user_id", F.col("ts").cast("date").alias("day"))
        .agg(seq.alias("path"))
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), "path")
        .show(10, truncate=False)
    )

    print("== 4. event-type transition matrix ==")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    (
        events.select(
            F.col("event_type").alias("src"),
            F.lead("event_type").over(w).alias("dst"),
        )
        .where(F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("src", "dst")
        .show(truncate=False)
    )

    print("== 5. M4 dashboard downsampling (6h pixels) ==")
    m4_downsample(
        events, bucket_col=epoch_bucket(events, "ts", 21600)
    ).orderBy("bucket_start").show(8, truncate=False)

    print("== 6. daily GMV: SES smoothing + Holt 7-day projection ==")
    daily = events.where(F.col("event_type") == "purchase").groupBy(
        F.col("ts").cast("date").alias("day")
    ).agg(F.round(F.sum("value"), 2).alias("gmv")).withColumn(
        "series", F.lit("gmv")
    )
    ses_smooth(daily, ["series"], "day", "gmv", alpha=0.3).orderBy(
        "day"
    ).show(8)
    holt_forecast(
        daily, ["series"], "day", "gmv", horizon=7
    ).where(F.col("step") > 0).orderBy("step").show(truncate=False)

    spark.stop()


if __name__ == "__main__":
    main()
