"""Wide-table / large-file probe for the arrow fast path (round 11,
VERDICT r10 tasks #1 and #7): a 24-column Iceberg table in the
REALISTIC-file-size regime (~40 files x 100k rows, several MB each —
the 10k-file probe is all tiny files), scanned through the forced
arrow path:

* ``wide_full_count_s`` — full-width read (every column shipped),
* ``wide_narrow_agg_s`` — the same aggregate with ``columns=`` (the
  round-11 pruning: only 2 of 24 columns leave the parquet reader),
* ``wide_narrow_filter_s`` — narrow + a pushed filter (row-group
  stats pruning via the advisory pushFilters path),
* ``wide_jvm_narrow_s`` — the JVM path's narrow aggregate (Catalyst
  pruning), the reference point.

Each slot runs twice; the MIN is reported (warm-cache convention,
BASELINE.md round-7 variance rule).  Prints one JSON line.

Usage: python tools/probe_wide_scan.py [n_files] [rows_per_file]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

N_FILES = int(sys.argv[1]) if len(sys.argv) > 1 else 40
ROWS = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
N_COLS = 24


def main() -> None:
    from pyspark.sql import functions as F

    from data_lakehouse_project_spark.operators.iceberg_export import (
        export_iceberg_metadata,
    )
    from data_lakehouse_project_spark.operators.iceberg_reader import (
        read_iceberg_table,
    )
    from data_lakehouse_project_spark.operators.txnlog import TxnTable
    from data_lakehouse_project_spark.session import get_spark

    spark = get_spark(app_name="probe-wide-scan")
    root = tempfile.mkdtemp(prefix="probe_wide_")
    t = TxnTable(os.path.join(root, "wide"))
    wide = (
        spark.range(0, N_FILES * ROWS)
        .repartition(N_FILES)
        .select(
            "id",
            (F.col("id") % 1000).cast("long").alias("k"),
            *[
                (F.col("id") * (i + 1)).cast("double").alias(f"c{i}")
                for i in range(N_COLS - 2)
            ],
        )
    )
    t.write(wide, mode="overwrite")
    export_iceberg_metadata(t, spark)
    nbytes = sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _, fs in os.walk(t.path)
        for f in fs
        if f.endswith(".parquet")
    )

    os.environ["SPARK_GRAFT_ARROW_SCAN_FILES"] = "1"  # force fast path

    def _timed(fn):
        best = None
        for _ in range(2):
            t0 = time.time()
            fn()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        return round(best, 2)

    out = {
        "n_files": N_FILES,
        "rows": N_FILES * ROWS,
        "cols": N_COLS,
        "data_mb": round(nbytes / 1e6, 1),
    }
    df_full = read_iceberg_table(spark, t.path)
    assert "graft_arrow_scan" in df_full._jdf.queryExecution().toString()
    out["wide_full_count_s"] = _timed(
        lambda: read_iceberg_table(spark, t.path)
        .agg(F.sum("c0"), F.count("*"))
        .collect()
    )
    out["wide_narrow_agg_s"] = _timed(
        lambda: read_iceberg_table(spark, t.path, columns=["k", "c0"])
        .agg(F.sum("c0"), F.count("*"))
        .collect()
    )
    out["wide_narrow_filter_s"] = _timed(
        lambda: read_iceberg_table(spark, t.path, columns=["k", "c0"])
        .where(F.col("k") == 7)
        .agg(F.sum("c0"), F.count("*"))
        .collect()
    )
    os.environ["SPARK_GRAFT_ARROW_SCAN_FILES"] = "10000000"
    out["wide_jvm_narrow_s"] = _timed(
        lambda: read_iceberg_table(spark, t.path)
        .select("k", "c0")
        .agg(F.sum("c0"), F.count("*"))
        .collect()
    )
    os.environ.pop("SPARK_GRAFT_ARROW_SCAN_FILES", None)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
