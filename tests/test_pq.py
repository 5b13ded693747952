"""Product-quantization ANN (ext/pq.py): codebook shape, encoding
domain, ADC accuracy, and recall against the exact top-k."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from data_lakehouse_project_spark.ext import pq
from data_lakehouse_project_spark.ext.similarity import cosine_topk


M, KSUB = 16, 16


@pytest.fixture(scope="module")
def emb(testdata):
    return testdata["embeddings"]


@pytest.fixture(scope="module")
def codebooks(emb):
    return pq.train_codebooks(emb, "embedding", m=M, ksub=KSUB)


def test_codebook_shape_and_determinism(emb, codebooks):
    assert codebooks.shape == (M, KSUB, 64 // M)
    again = pq.train_codebooks(emb, "embedding", m=M, ksub=KSUB)
    assert np.allclose(codebooks, again)


def test_encode_codes_in_domain(emb, codebooks):
    codes = pq.encode(emb, "embedding", "vec_id", codebooks)
    assert codes.columns == ["vec_id"] + [f"code_{i}" for i in range(M)]
    stats = codes.select(
        *[F.min(f"code_{i}").alias(f"lo{i}") for i in range(M)],
        *[F.max(f"code_{i}").alias(f"hi{i}") for i in range(M)],
        F.count("*").alias("n"),
    ).first()
    assert stats["n"] == emb.count()
    for i in range(M):
        assert 0 <= stats[f"lo{i}"] and stats[f"hi{i}"] < KSUB


def test_adc_score_tracks_exact_cosine(emb, codebooks):
    """ADC reconstructs cosine from codes; on clustered data the top-1
    self-ish match should score near its true cosine (within quantization
    error, generously bounded)."""
    row = emb.where(F.col("vec_id") == 0).select("embedding").first()
    q = [float(x) for x in row[0]]
    approx = pq.adc_topk(
        pq.encode(emb, "embedding", "vec_id", codebooks), codebooks, q, "vec_id", k=5
    ).collect()
    exact = {
        r.vec_id: r.score
        for r in cosine_topk(emb, "embedding", "vec_id", q, k=50).collect()
    }
    for r in approx:
        if r.vec_id in exact:
            assert abs(r.score - exact[r.vec_id]) < 0.25


def test_recall_vs_exact_topk(emb, codebooks):
    """Recall@10 of PQ-ADC against exact cosine on the labeled clustered
    corpus — the acceptance gate for the approximation."""
    row = emb.where(F.col("vec_id") == 0).select("embedding").first()
    q = [float(x) for x in row[0]]
    base = emb.where(F.col("vec_id") != 0)
    exact_ids = {
        r.vec_id
        for r in cosine_topk(base, "embedding", "vec_id", q, k=10).collect()
    }
    pq_ids = {
        r.vec_id
        for r in pq.pq_topk(
            base, "embedding", "vec_id", q, k=10, m=M, ksub=KSUB,
            codebooks=codebooks,
        ).collect()
    }
    recall = len(exact_ids & pq_ids) / 10
    assert recall >= 0.8, f"PQ recall@10 too low: {recall}"


def test_encode_preserves_string_id_type(emb, codebooks):
    """encode must pass the id column through with its actual type —
    a hardcoded long schema breaks string/decimal ids (ADVICE r2)."""
    sdf = emb.select(
        F.concat(F.lit("doc-"), F.col("vec_id").cast("string")).alias("sid"),
        "embedding",
    )
    codes = pq.encode(sdf, "embedding", "sid", codebooks)
    assert codes.schema["sid"].dataType.simpleString() == "string"
    row = codes.orderBy("sid").first()
    assert row.sid.startswith("doc-")


def test_train_codebooks_empty_input_raises(emb):
    with pytest.raises(ValueError, match="empty training sample"):
        pq.train_codebooks(
            emb.where(F.col("vec_id") < 0), "embedding", m=M, ksub=KSUB
        )
