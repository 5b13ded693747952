"""End-to-end training-corpus curation funnel invariants."""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "examples")
)

from training_corpus_pipeline import NEAR_DUP_JACCARD, curate
from data_lakehouse_project_spark.ext.dedup import minhash_near_duplicates


def test_funnel_monotone_and_self_consistent(spark, testdata):
    stages = curate(testdata["documents"])
    counts = {k: df.count() for k, df in stages.items()}
    order = ["raw", "length_kept", "lang_kept", "quality_kept",
             "ml_quality_kept", "exact_unique", "near_dup_unique",
             "trimmed"]
    for earlier, later in zip(order, order[1:]):
        assert counts[later] <= counts[earlier], (earlier, later, counts)
    # boilerplate trim rewrites text but never drops documents
    assert counts["trimmed"] == counts["near_dup_unique"]

    # the survivors contain no near-duplicate pair at the same threshold
    leftovers = minhash_near_duplicates(
        stages["near_dup_unique"], "text", "doc_id",
        jaccard_threshold=NEAR_DUP_JACCARD,
    )
    assert leftovers.count() == 0

    # curated carries provenance + accounting columns
    cols = set(stages["curated"].columns)
    assert {"doc_id", "text", "detected_lang", "quality_score", "n_bpe_tokens"} <= cols
    # token counts are positive for non-empty docs
    bad = stages["curated"].where(
        (F.length("text") > 0) & (F.col("n_bpe_tokens") <= 0)
    )
    assert bad.count() == 0


def test_funnel_decontamination_removes_benchmark_overlap(spark, testdata):
    """With a held-out benchmark source, no surviving training doc may
    share a 4-gram with it, and the stage only ever removes docs."""
    from data_lakehouse_project_spark.ext.dedup import ngram_contamination

    docs = testdata["documents"]
    bench = docs.where(F.col("source") == "src19")
    train = docs.where(F.col("source") != "src19")
    stages = curate(train, benchmark=bench)
    assert stages["decontaminated"].count() <= stages["near_dup_unique"].count()
    still_hot = ngram_contamination(
        stages["decontaminated"], bench, n=4
    ).count()
    assert still_hot == 0
