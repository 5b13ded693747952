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
    order = ["raw", "lang_kept", "quality_kept", "exact_unique", "near_dup_unique"]
    for earlier, later in zip(order, order[1:]):
        assert counts[later] <= counts[earlier], (earlier, later, counts)

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
