"""sf40 cold/warm re-baseline (VERDICT r7 bench-hygiene item).

For each slot: sync + drop the page cache (needs root), run the query
once (COLD — includes real disk reads of the ~7 GB tier), clear
Spark's cache, run again (WARM — page-cache resident).  Prints one
JSON line per slot plus a summary line, so BASELINE.md rows can carry
an explicit cache-state note instead of the round-7 "tier was just
generated, treat as warm" caveat.

Usage: python tools/sf40_coldwarm.py [sf_dir] [slot,slot,...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SLOTS = [
    "daily_sales_summary",
    "pricing_summary",
    "agg_mad",
    "lineitem_mad_outliers",
    "window_topk_per_customer",
    "lineitem_profile_wide",
    "join_lineitem_orders",
    "nation_revenue",
]


def _drop_caches() -> bool:
    try:
        os.system("sync")
        with open("/proc/sys/vm/drop_caches", "w") as fh:
            fh.write("3")
        return True
    except OSError:
        return False


def main() -> None:
    from data_lakehouse_project_spark import registry
    from data_lakehouse_project_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".testdata/sf40"
    slots = sys.argv[2].split(",") if len(sys.argv) > 2 else SLOTS
    spark = get_spark(app_name="sf40-coldwarm")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warm
    qs = registry.queries()
    out = {}
    for name in slots:
        fn = qs[name]
        times = []
        cold_ok = _drop_caches()
        for _run in range(2):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            times.append(round(time.perf_counter() - t0, 2))
        out[name] = {
            "cold_s": times[0] if cold_ok else None,
            "warm_s": times[1],
            "cache_dropped": cold_ok,
        }
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps({"sf_dir": sf_dir, "slots": out}))
    spark.stop()


if __name__ == "__main__":
    main()
