"""RAG ingestion composition (examples/rag_ingestion_pipeline.py):
chunking → chunk-grain exact dedup → BM25 retrieval, each step already
oracle-checked individually; this pins the composition's invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from examples.rag_ingestion_pipeline import build_chunk_corpus, retrieve


def _docs(spark):
    boiler = "all rights reserved " * 16  # 64 tokens of boilerplate
    return spark.createDataFrame(
        [
            (1, "spark shuffle join " * 30),  # 90 tokens → 2 chunks
            (2, "broadcast hash join beats shuffle join on small dims"),
            (3, boiler),  # exact boilerplate
            (4, boiler),  # duplicated boilerplate doc
            (5, "unrelated text about nothing in particular at all"),
        ],
        "doc_id long, text string",
    )


def test_chunking_dedup_and_counts(spark):
    corpus = build_chunk_corpus(_docs(spark))
    rows = corpus.collect()
    # every chunk id is doc#idx and ≥ one chunk per doc survives for
    # non-duplicate docs
    assert all("#" in r.chunk_id for r in rows)
    docs_present = {r.doc_id for r in rows}
    assert {1, 2, 5} <= docs_present
    # the boilerplate chunk survives exactly ONCE (docs 3/4 collapse)
    boiler_rows = [r for r in rows if "rights" in r.chunk_text]
    assert len(boiler_rows) == 1
    assert boiler_rows[0].doc_id == 3  # smallest chunk_id wins
    # no duplicate chunk text anywhere
    texts = [r.chunk_text for r in rows]
    assert len(texts) == len(set(texts))


def test_retrieval_ranks_relevant_chunk_first(spark):
    corpus = build_chunk_corpus(_docs(spark))
    hits = retrieve(corpus, ["broadcast"], k=3).collect()
    assert hits, "query term present in corpus must hit"
    top = hits[0]
    text = {
        r.chunk_id: r.chunk_text for r in corpus.collect()
    }[top.chunk_id]
    assert "broadcast" in text
    # absent-term query returns nothing rather than noise
    assert retrieve(corpus, ["zzz_nothing"], k=3).count() == 0
