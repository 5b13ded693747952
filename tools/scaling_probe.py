"""Scaling probe: does the core scan+agg throughput hold as data grows?

Replicates lineitem N× (union of re-reads, so input bytes actually grow),
runs the TPC-H Q1 pricing-summary shape at each multiple, and prints
rows/sec. Flat rows/sec across multiples = linear scaling of the
partial+final aggregation; a falling curve would indicate a shuffle or
memory cliff. Results recorded in BASELINE.md.
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from data_lakehouse_project_spark import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="scaling-probe")
    base = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    n_base = base.count()

    for mult in (1, 4, 16):
        df = functools.reduce(
            lambda a, b: a.unionByName(b), [base] * mult
        )
        t0 = time.perf_counter()
        (
            df.where(F.col("l_shipdate") <= "1998-09-01")
            .groupBy("l_returnflag", "l_linestatus")
            .agg(
                F.sum("l_quantity").alias("sum_qty"),
                F.sum(
                    F.col("l_extendedprice") * (1 - F.col("l_discount"))
                ).alias("sum_disc_price"),
                F.avg("l_extendedprice").alias("avg_price"),
                F.count(F.lit(1)).alias("n"),
            )
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
        dt = time.perf_counter() - t0
        rows = n_base * mult
        print(
            f"mult={mult:3d} rows={rows:>10,} wall={dt:6.2f}s "
            f"throughput={rows / dt / 1e6:6.2f}M rows/s"
        )
    spark.stop()


if __name__ == "__main__":
    main()
