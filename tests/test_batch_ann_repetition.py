"""Unit ground-truth for ann_batch_topk (vs numpy brute force) and
repetition_signals (hand-checked)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from data_lakehouse_project_spark.ext.similarity import ann_batch_topk
from data_lakehouse_project_spark.ext.text import repetition_signals


def test_ann_batch_topk_matches_numpy(spark):
    rng = np.random.default_rng(7)
    vecs = rng.standard_normal((200, 16))
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(200)],
        "vec_id long, embedding array<double>",
    )
    queries = [(0, list(map(float, vecs[0]))), (5, list(map(float, vecs[5])))]
    got = {
        (r.query_id, r.rank): r.vec_id
        for r in ann_batch_topk(df, "embedding", "vec_id", queries, k=5).collect()
    }
    norms = np.linalg.norm(vecs, axis=1)
    for qid in (0, 5):
        s = (vecs @ vecs[qid]) / (norms * norms[qid])
        s = np.floor(s * 1e6 + 0.5) / 1e6
        s[qid] = -np.inf  # self-match excluded
        order = sorted(range(200), key=lambda i: (-s[i], i))[:5]
        for rank, vid in enumerate(order, start=1):
            assert got[(qid, rank)] == vid


def test_ann_batch_per_batch_pruning_consistent(spark):
    """Same result regardless of Arrow batch/partition boundaries."""
    rng = np.random.default_rng(11)
    vecs = rng.standard_normal((300, 8))
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(300)]
    queries = [(3, list(map(float, vecs[3])))]
    out = []
    for parts in (1, 17):
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        ).repartition(parts)
        out.append(
            sorted(
                map(
                    tuple,
                    ann_batch_topk(df, "embedding", "vec_id", queries, k=7)
                    .select("query_id", "vec_id", "rank")
                    .collect(),
                )
            )
        )
    assert out[0] == out[1]


def test_repetition_signals_hand_checked(spark):
    df = spark.createDataFrame(
        [
            # 8 tokens: "a b a b a b a b" — 4 5-grams, 3 distinct
            # ("a b a b a", "b a b a b", "a b a b a", "b a b a b" → 2 distinct);
            # bigrams: 7 total, "a b" ×4 → top2 = 4/7
            (1, "a b a b a b a b"),
            (2, "unique words only here now"),  # 1 五gram, all distinct
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in repetition_signals(df, "text", "doc_id").collect()}
    # doc 1: 4 5-grams, 2 distinct -> dup frac 0.5 ; top bigram 4/7
    assert abs(got[1].dup5_frac - 0.5) < 1e-9
    assert abs(got[1].top2_frac - np.floor(4 / 7 * 1e6 + 0.5) / 1e6) < 1e-12
    # doc 2: single 5-gram, no repeats
    assert got[2].dup5_frac == 0.0


def test_redact_pii_typed_placeholders(spark):
    from data_lakehouse_project_spark.ext.text import redact_documents

    df = spark.createDataFrame(
        [
            (1, "mail me at jane.doe+x@corp.io or call +1 (555) 123-4567"),
            (2, "server at 192.168.0.1 went down"),
            (3, "nothing sensitive here"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in redact_documents(df, "text", "doc_id").collect()}
    assert "<EMAIL>" in got[1].text_redacted
    assert "<PHONE>" in got[1].text_redacted
    assert "jane" not in got[1].text_redacted
    assert got[1].n_redactions == 2
    assert got[2].text_redacted == "server at <IP> went down"
    assert got[3].n_redactions == 0 and got[3].text_redacted == got[3].text_redacted
