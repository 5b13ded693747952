"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The headline set covers the engine's main plan shapes (scan+agg, fact-fact
join, star join, window, LSH dedup, ANN, text scan, event rollup) and uses
the *scale-path* variants (LSH, not O(n²) exact pairs) — the exact
baselines exist for correctness, not throughput. Each query is forced end
to end with a noop-format write so every output column is computed (a
count() would let Catalyst prune projections).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data_lakehouse_project_spark import get_spark, registry

HEADLINE = [
    "daily_sales_summary",
    "pricing_summary",
    "filter_lineitem",
    "join_lineitem_orders",
    "join_customer_orders",
    "nation_revenue",
    "top_unshipped",
    "window_topk_per_customer",
    "window_running_total",
    "rollup_status_priority",
    "dedup_exact_groups",
    "dedup_tokenset_groups",
    # production LSH configs (the graded names now run recall-1/full-probe
    # grading configs; the bench keeps timing the 100 TB candidate-pruning
    # shapes — BASELINE.md maps the renamed slots)
    "dedup_minhash_pairs_lsh16",
    "ann_cosine_topk",
    "ann_lsh_probe_topk",
    "embedding_pairs_lsh",
    "text_stats",
    "bpe_token_count",
    "events_hourly_rollup",
    "events_sessionize",
    # session-2 additions: lexical ranking + one-pass profiling (new
    # slots — no prior-round baseline; tracked from BENCH_r04 on)
    "bm25_search_topk",
    # r5: the bench times the WIDE profile on the approx="auto" HLL
    # route (the at-scale default); the exact 4-column lineitem_profile
    # stays the graded oracle anchor. BASELINE.md maps r4's
    # "lineitem_profile" slot (exact, 3.27 s) to this one.
    "lineitem_profile_wide",
    # r5 additions: ExactSubstr span detection (rolling-hash windows +
    # interval merge) and fixed-iteration PageRank over the near-dup
    # graph — new slots, baselined from BENCH_r05 on. PageRank is
    # benched over LSH edges: the graded doc_pagerank's exact-Jaccard
    # edge generator is Σdf²-bounded and already unusable at sf0.1
    # (char-trigram df² blowup) — the LSH edge set is the scale shape.
    "dedup_substring_spans",
    "doc_pagerank_lsh",
    # r5 session 3 additions: grid-binned spatial self-join and
    # funnel attribution — new slots, baselined from BENCH_r05 on
    "geo_neighbor_pairs",
    "attribution_last_touch",
    # r5 session 4 additions: C4-style segment dedup (full corpus scan →
    # two hash-key shuffles) and DSIR importance weights (token explode →
    # bucket agg → broadcast ratio join) — baselined from BENCH_r05 on
    "segment_dedup_summary",
    "dsir_importance_weights",
    # real multimodal decode through Arrow mapInPandas (JVM-built
    # 2-frame PPM videos → per-frame pixel stats) — baselined from
    # BENCH_r05 on
    "video_frame_stats",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    # optional slot filter (comma-separated) — used by the sf1 tier
    # (tools/gen_sf1.py + BASELINE.md "sf1" section) to time the heavy
    # subset; the driver's default run is unaffected
    subset = os.environ.get("SPARK_GRAFT_BENCH_QUERIES")
    headline = (
        [q for q in subset.split(",") if q] if subset else HEADLINE
    )
    spark = get_spark(app_name="bench")
    qs = registry.queries()

    # warm the JVM/session and the input listing (parquet footers + file
    # index) so timings measure query execution, not cold-FS startup
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    from data_lakehouse_project_spark.sources.readers import load_testdata

    for df in load_testdata(spark, sf_dir).values():
        df.select(df.columns[0]).limit(1).collect()
    # warm the Arrow python workers (several headline ops use pandas UDFs);
    # lambda form sidesteps stringified-annotation inference under
    # `from __future__ import annotations`
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    _ident = pandas_udf(lambda x: x, "long")
    spark.range(10_000).select(_ident(F.col("id"))).count()

    # min-of-2 runs per query: single-run wall time on a shared machine
    # carries ±25%+ load noise (BASELINE.md); the min is the stable
    # estimator of the query's actual cost. Spark's CacheManager can
    # reuse persisted subtrees across identical plans, so run 2 measures
    # warm-path cost — both runs build the full plan end to end.
    timings: dict[str, float] = {}
    for name in headline:
        fn = qs[name]
        best = float("inf")
        for _ in range(2):
            # clear persisted subtrees: CacheManager matches identical
            # logical plans across runs, which would make run 2 a warm
            # cache hit instead of a comparable cold measurement
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
