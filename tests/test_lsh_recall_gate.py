"""CI recall gate for the reduced MinHash-LSH banding config.

``doc_pagerank_lsh`` (registry.py) generates edges with 32 hashes /
8 bands at threshold 0.9 — 2.2× cheaper than the dedup pipeline's
64/16, justified by a measured-identical edge set at sf0.1. The
round-5 advice: that equivalence was validated at ONE scale factor
and the entry is rows-only, so recall drift elsewhere would go
unnoticed. This gate re-validates per CI run at the test SF against
the exact PPJoin baseline (deterministic hashes ⇒ a stable outcome,
not a flaky statistical one). ``tools/quality_probe.py`` remains the
multi-SF / multi-threshold measurement tool; this is the always-on
tripwire for the exact config the registry ships.
"""

from __future__ import annotations

import pytest

from data_lakehouse_project_spark.ext import dedup as X_dedup


@pytest.fixture(scope="module")
def docs(testdata):
    return testdata["documents"]


def test_pagerank_banding_config_keeps_full_recall(spark, docs):
    """32/8 at t=0.9 (the doc_pagerank_lsh config) must reproduce the
    exact Jaccard>=0.9 pair set: every true pair collides in some band
    (S-curve 0.9998/pair; the seeded hashes make this deterministic)
    and verification guarantees no extras."""
    exact = (
        X_dedup.jaccard_pairs_prefix(docs, "text", "doc_id", 0.9)
        .select("id_a", "id_b")
        .localCheckpoint(eager=True)
    )
    n_true = exact.count()
    assert n_true > 0, "test corpus lost its near-dup pairs"
    got = X_dedup.minhash_near_duplicates(
        docs,
        "text",
        "doc_id",
        num_hashes=32,
        bands=8,
        jaccard_threshold=0.9,
    ).select("id_a", "id_b")
    missed = exact.join(got, ["id_a", "id_b"], "left_anti").count()
    extra = got.join(exact, ["id_a", "id_b"], "left_anti").count()
    assert missed == 0, f"LSH 32/8 missed {missed}/{n_true} true pairs"
    assert extra == 0, f"verification leaked {extra} false pairs"
