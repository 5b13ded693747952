"""Hybrid retrieval: fuse lexical (BM25) and vector (cosine) rankings
with Reciprocal Rank Fusion — the standard RAG-stack composition
(Cormack/Clarke/Buettcher 2009: RRF score = Σ_lists 1/(k + rank), k≈60
damps the head so no single ranker dominates).

RRF needs only RANKS, never comparable scores, which is exactly why it
is the production default for fusing rankers with incommensurable
score scales (BM25 ∈ [0, ∞) vs cosine ∈ [-1, 1]).

Scale shape: each input ranking is already a top-k DataFrame (bounded
rows — the expensive retrieval happened upstream under its own
TakeOrdered / bucket-pruned plan); fusion is a union of tiny frames, a
window rank per list, one groupBy. Driver never sees the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window


def rrf_fuse(
    rankings: list[tuple[DataFrame, str, str]],
    k: int = 60,
    top: int | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Fuse ``[(df, id_col, score_col), ...]`` into (id, rrf_score).

    Ranks are dense per input list: ``row_number`` over (score DESC,
    id ASC) — the id tiebreak keeps fusion deterministic across engines
    and runs. Items missing from a list simply contribute nothing for
    it (standard RRF). ``top`` limits the fused output.
    """
    if not rankings:
        raise ValueError("rankings must be non-empty")
    pieces = []
    for i, (df, id_col, score_col) in enumerate(rankings):
        w = Window.orderBy(F.desc(score_col), F.col(id_col))
        pieces.append(
            df.select(
                F.col(id_col).alias("item_id"),
                F.row_number().over(w).alias("rank"),
            ).withColumn("list_id", F.lit(i))
        )
    unioned = pieces[0]
    for p in pieces[1:]:
        unioned = unioned.unionByName(p)
    scale = float(10**round_to)
    fused = (
        unioned.groupBy("item_id")
        .agg(
            F.sum(F.lit(1.0) / (F.lit(float(k)) + F.col("rank"))).alias(
                "_s"
            ),
            F.count(F.lit(1)).alias("n_lists"),
        )
        .select(
            "item_id",
            (F.floor(F.col("_s") * scale + F.lit(0.5)).cast("double") / scale)
            .alias("rrf_score"),
            "n_lists",
        )
        .orderBy(F.desc("rrf_score"), "item_id")
    )
    if top is not None:
        fused = fused.limit(top)
    return fused


def hybrid_search(
    documents: DataFrame,
    embeddings: DataFrame,
    query_terms: list[str],
    query_vector: list[float],
    doc_id: str = "doc_id",
    vec_id: str = "vec_id",
    text_col: str = "text",
    vec_col: str = "embedding",
    k_each: int = 20,
    k_rrf: int = 60,
    top: int = 10,
) -> DataFrame:
    """BM25 top-k + cosine top-k → RRF — one call, both modalities.

    The document and embedding tables join implicitly through
    ``doc_id == vec_id`` (the testdata contract); each leg runs its own
    pruned plan before fusion ever sees a row.
    """
    from data_lakehouse_project_spark.ext.similarity import cosine_topk
    from data_lakehouse_project_spark.ext.text import bm25_topk

    lexical = bm25_topk(
        documents, text_col, doc_id, query_terms, k=k_each
    )
    dense = cosine_topk(
        embeddings, vec_col, vec_id, query_vector, k=k_each
    )
    return rrf_fuse(
        [(lexical, doc_id, "score"), (dense, vec_id, "score")],
        k=k_rrf,
        top=top,
    )
