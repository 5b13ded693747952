"""Plan auditor: scan every registry query's EXECUTED physical plan for
scale red flags.

Flags:
- CartesianProduct / BroadcastNestedLoopJoin where not expected (only
  `join_cross` and `join_range_bands` legitimately use them)
- row-at-a-time Python (BatchEvalPython) anywhere — Arrow variants
  (ArrowEvalPython / MapInPandas / FlatMapCoGroupsInPandas) are the
  sanctioned Python path and listed for visibility, not flagged
- excessive exchanges (> 6 per query — joins+aggs normally need 2-4)
- missing PushedFilters on queries with obvious scan predicates

Usage: python tools/plan_audit.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_lakehouse_project_spark import get_spark, registry

EXPECT_NESTED_LOOP = {
    "join_cross",
    "join_range_bands",
    # deliberate O(n²) exactness baselines for the LSH scale paths
    # (COVERAGE.md §2.8): pairwise self-joins on id_a < id_b
    "dedup_jaccard_pairs",
    "embedding_pairs_exact",
    # exact-edge variant of the semantic dedup chain (LSH is the scale path)
    "embedding_dedup_clusters",
    # Q22: crossJoin(broadcast(<1-row aggregate>)) — the distributed form
    # of an uncorrelated scalar subquery; BNLJ against one row is O(n)
    "waiting_customers",
    # same 1-row broadcast-scalar shape (mixture denominator/total)
    "corpus_mix_weights",
    # same shape: corpus token total feeding the unigram LM
    "unigram_xentropy_scores",
    # same shape: N feeding the bigram LM's unigram backoff
    "bigram_xentropy_scores",
    # same shape via its BM25 leg: N and avgdl 1-row broadcasts
    "hybrid_search_rrf",
    # same 1-row broadcast-scalar shape: basket total / mu+sigma stats /
    # approx-percentile boundary array
    "basket_pair_lift",
    "orders_feature_encode",
    "histogram_equidepth_price_approx",
    # same shape: Q11 global revenue threshold
    "supplier_value_concentration",
    # same shape: corpus size N feeding the smoothed idf
    "tfidf_search_topk",
    # same shape twice: N and avgdl ride 1-row broadcasts into BM25
    "bm25_search_topk",
    # same shape: total-occurrence count feeding the support threshold
    "corpus_frequent_tokens",
    # same shape: (min,max) bounds broadcast into the bin expression
    "orders_price_histogram",
    # same shape: target/raw model totals (1 row) broadcast into the
    # bucket log-ratio table
    "dsir_importance_weights",
    # r7: corpus max-date + 3-median scalars (1 row each) broadcast
    # into the customer grain; decile boundaries (1 row of 9 exact
    # percentiles) broadcast likewise — BNLJ against one row is O(n)
    "customer_rfm_segments",
    "customer_pareto_deciles",
}
# multi-stage by design: collapse → band self-join → distinct → verify →
# expand is ~8 logical shuffles (each counted again by AQE stage reuse);
# connected components is iterative (one join+agg per propagation round)
EXPECT_MANY_EXCHANGES = {
    "dedup_minhash_pairs",
    "dedup_minhash_pairs_lsh16",  # production banding, same pipeline
    "dedup_minhash_rep_pairs",  # same pipeline minus the member fan-out
    "dedup_clusters",
    "embedding_dedup_clusters",  # iterative label propagation
    # Q8: 7-table star with two fact-sized sides (lineitem, orders,
    # customer) — three shuffle joins + final agg is the intended plan;
    # the five dimension joins all broadcast (0 exchanges)
    "market_share",
    # batch-vs-corpus probe: fingerprint join + shingle posting join +
    # three aggregation grains + best-match window + two left joins
    "incremental_dedup",
    # basket self-join references the persisted `kept` twice: the plan
    # TEXT re-prints the distinct + Apriori semi-join prefix under each
    # InMemoryRelation reference (same artifact as neardup_triangle_
    # stats); execution fills the cache once — real exchanges ≈ 6
    "basket_pair_lift",
    # hashed-TF components (2 agg grains + norm join) feeding the
    # inverted-index pair join + pair-grain agg — 4 logical shuffles,
    # doubled in the plan text by AQE stage reuse
    "doc_semantic_pairs",
    # staged sketch-index pipeline: corpus distinct + bloom build
    # groupBy(word) + probe groupBy + final sort = 5 real shuffles,
    # every grain bounded (filter words / batch rows); BOTH joins are
    # broadcast (map-side probe + broadcast verify). The count trips
    # only because AQE's toString prints initial+final plans, doubling
    # every exchange line.
    "bloom_admission_verdicts",
    # ~4 real shuffles (idf groupBy(term), tf groupBy(id,term), score
    # groupBy(id), top-k), every one on the query-term sliver; doubled
    # in the adaptive plan text as above
    "tfidf_search_topk",
    # tfidf's shuffles + the doc-length join grain (dl groupBy + join +
    # final agg) — all on the term sliver or the 1-row stats broadcast
    "bm25_search_topk",
    # bm25's shuffles + the cosine leg's top-k + two rank windows +
    # the full-outer fusion join — every grain ≤ k rows per list
    "hybrid_search_rrf",
    # bigram LM build: c12 groupBy(w1,w2) → c1 fold groupBy(w1) → cu
    # groupBy(t) → two LM-build joins → score join + per-doc agg; all
    # count-grain (no text in any exchange), doubled by AQE plan print
    "bigram_xentropy_scores",
    # the ngram-jaccard posting-list pipeline (shingle join + size join
    # + pair agg) feeding two more bounded-grain groupBys (per-doc
    # degree, then degree histogram); doubled in the adaptive plan text
    "neardup_degree_distribution",
    # PPJoin-family pipeline: exact-group collapse + token-df groupBy +
    # per-rep rank window + prefix equi-join + pair distinct + verify
    # join + member fan-out — the multi-stage shape IS the algorithm
    # (each stage strictly shrinks the candidate bound); no BNLJ
    "dedup_jaccard_prefix_pairs",
    # DSIR: doc-grain (id,bucket) agg + 1024-bucket model agg + 1-row
    # totals + final id-grain sum = 4 real shuffles (one corpus-sized,
    # the rest on aggregates), doubled in the adaptive plan text
    "dsir_importance_weights",
    # exact nested medians are inherently three passes over the fact
    # (median -> MAD -> outlier count), each pass = one count-grain
    # agg + one window sort on the (keys, value)-distinct table
    # (bounded memory, r7 rewrite) + a broadcast of group-grain stats;
    # ~5 real shuffles, printed as 8 by the adaptive doubling
    "lineitem_mad_outliers",
    # r7 RFM: customer-grain agg + two 1-row scalar aggs (max date,
    # medians) + final segment groupBy = 4 real shuffles, every one on
    # the customer grain or a single row; the scalar subtrees re-print
    # under both broadcast references and AQE doubles the text
    "customer_rfm_segments",
    # r8 pareto: the decile boundaries now run through the
    # counts-grain straddle (counts agg + window + straddle agg)
    # instead of one holistic percentile buffer holding the whole
    # customer grain — 3 extra exchanges on the tiny distinct-revenue
    # table, all customer-grain or smaller, doubled by AQE plan text
    "customer_pareto_deciles",
    # triangle closing references the PERSISTED edge set three times
    # (e1 ⋈ e2 ⋈ e3) + degree; the plan text re-prints the whole
    # upstream prefix-join subtree under each InMemoryRelation
    # reference (240+ exchange LINES), but execution fills the cache
    # once — the real shuffle count is the prefix join's + 4
    "neardup_triangle_stats",
}
# the one sanctioned row-at-a-time Python site: UDTF API coverage whose
# JVM twin (text_top_bigrams) carries the hot path
EXPECT_PYTHON_UDTF = {"text_udtf_bigrams", "udtf_split_priority"}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="plan-audit")
    flags = 0
    for name, fn in registry.queries().items():
        try:
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001
            print(f"ERROR {name}: {str(e)[:120]}")
            flags += 1
            continue
        issues = []
        if "CartesianProduct" in plan and name not in EXPECT_NESTED_LOOP:
            issues.append("CartesianProduct")
        if (
            "BroadcastNestedLoopJoin" in plan
            and name not in EXPECT_NESTED_LOOP
        ):
            issues.append("BroadcastNestedLoopJoin")
        if "BatchEvalPython" in plan and name not in EXPECT_PYTHON_UDTF:
            issues.append("row-at-a-time Python (BatchEvalPython)")
        n_ex = plan.count("Exchange ")
        if n_ex > 6 and name not in EXPECT_MANY_EXCHANGES:
            issues.append(f"{n_ex} exchanges")
        arrow = any(
            k in plan
            for k in ("ArrowEvalPython", "MapInPandas", "FlatMapCoGroupsInPandas")
        )
        if issues:
            print(f"FLAG  {name}: {', '.join(issues)}")
            flags += 1
        else:
            note = " [arrow]" if arrow else ""
            print(f"ok    {name}{note}")
    print(f"\n{flags} flagged")
    spark.stop()
    return 1 if flags else 0


if __name__ == "__main__":
    raise SystemExit(main())
