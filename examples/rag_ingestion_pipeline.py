"""RAG ingestion pipeline: documents → sliding-window chunks → exact
chunk dedup → BM25 retrieval — the retrieval-corpus preparation flow,
composed entirely from oracle-checked operators:

1. ``chunk_with_overlap`` (ext/packing.py): 64-token windows, 16-token
   overlap, map-only JVM chunking.
2. exact dedup on the chunk text (md5 fingerprint groupBy — boilerplate
   chunks repeated across documents collapse to one representative).
3. ``bm25_topk`` (ext/text.py) over the deduped chunk corpus: the
   lexical retriever (per-chunk length normalization is exactly what
   BM25's b-term exists for).

    python examples/rag_ingestion_pipeline.py [sf_dir]

An embedding retriever slots in at step 3 unchanged (ext/similarity.py
brute/LSH/IVF/PQ paths run on any (id, vector) table — the chunk grain
just becomes the id). Pytest form: tests/test_rag_pipeline.py.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from data_lakehouse_project_spark import get_spark
from data_lakehouse_project_spark.ext.packing import chunk_with_overlap
from data_lakehouse_project_spark.ext.text import bm25_topk
from data_lakehouse_project_spark.sources.readers import load_testdata


def build_chunk_corpus(documents, chunk_tokens=64, overlap=16):
    """documents(doc_id, text) → deduped chunk corpus
    (chunk_id, doc_id, chunk_idx, n_tokens, chunk_text)."""
    chunks = chunk_with_overlap(
        documents, "text", "doc_id", chunk_tokens, overlap
    ).withColumn(
        "chunk_id",
        F.concat(F.col("doc_id"), F.lit("#"), F.col("chunk_idx")),
    )
    # exact dedup at the CHUNK grain: one representative (smallest
    # chunk_id) per distinct text — one shuffle on the 32-byte md5
    w_rep = (
        chunks.groupBy(F.md5("chunk_text").alias("fp"))
        .agg(F.min("chunk_id").alias("chunk_id"))
        .select("chunk_id")
    )
    return chunks.join(w_rep, "chunk_id")  # semi-like inner on reps


def retrieve(chunk_corpus, query_terms, k=5):
    """Top-k chunks for the query — BM25 over the chunk corpus."""
    return bm25_topk(chunk_corpus, "chunk_text", "chunk_id", query_terms, k)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="rag-ingestion")
    documents = load_testdata(spark, sf_dir)["documents"]

    corpus = build_chunk_corpus(documents).cache()
    n_docs = documents.count()
    n_chunks = corpus.count()
    print(f"{n_docs} docs → {n_chunks} deduped chunks")

    hits = retrieve(corpus, ["broadcast", "shuffle", "join"], k=5)
    print("top chunks for 'broadcast shuffle join':")
    for r in hits.join(corpus, "chunk_id").select(
        "chunk_id", "score", "chunk_text"
    ).orderBy(F.desc("score")).collect():
        print(f"  {r.chunk_id}  {r.score:8.4f}  {r.chunk_text[:60]}...")
    spark.stop()


if __name__ == "__main__":
    main()
