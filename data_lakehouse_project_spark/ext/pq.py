"""Product-quantization (PQ) ANN: the memory-bound scale path.

The third ANN family alongside sign-LSH (ext/similarity.py) and IVF
(ext/ivf.py). Split each dim-D vector into M contiguous subvectors of
D/M dims; per subspace, learn K centroids on a driver-side sample
(codebook = M*K*(D/M) floats — kilobytes, broadcast); encode every
vector as M small codes (Arrow mapInPandas, one argmin per subspace per
batch); answer queries with ADC (asymmetric distance computation): per
query, precompute an M×K table of partial dot products and partial
squared norms, then score = table lookups summed over M — the original
vectors are never touched at query time.

Scale posture: at D=1024 float32 a vector is 4 KiB; its PQ code at
M=32, K=256 is 32 bytes — a 128× scan-bandwidth reduction. Encoding is
map-only; scoring is map-only + TakeOrderedAndProject top-k; the only
driver-side state is the sampled training matrix (bounded by
``train_rows``) and the codebook. No shuffle anywhere in the query path.

No reference analog (the reference has no vector ops at all); this is
north-star surface per SURVEY §2.8.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_lakehouse_project_spark.functions.scalar import lit_double_array


def _lloyd(x: np.ndarray, k: int, iters: int, seed: int) -> np.ndarray:
    """Seeded Lloyd k-means on a small in-memory matrix (training runs on
    a bounded driver-side sample, so plain numpy beats a distributed fit).
    Empty clusters are re-seeded from the farthest points, keeping the
    codebook full rank even on degenerate samples."""
    rng = np.random.RandomState(seed)
    cents = x[rng.choice(len(x), size=min(k, len(x)), replace=False)].copy()
    if len(cents) < k:  # fewer samples than codes: pad with jitter
        pad = cents[rng.choice(len(cents), size=k - len(cents))]
        cents = np.vstack([cents, pad + rng.normal(0, 1e-6, pad.shape)])
    for _ in range(iters):
        d2 = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for j in range(k):
            members = x[assign == j]
            if len(members):
                cents[j] = members.mean(axis=0)
            else:
                cents[j] = x[d2.min(axis=1).argmax()]
    return cents


def train_codebooks(
    df: DataFrame,
    vec_col: str,
    m: int = 8,
    ksub: int = 16,
    train_rows: int = 10_000,
    iters: int = 10,
    seed: int = 42,
) -> np.ndarray:
    """Learn per-subspace codebooks, shape (m, ksub, d/m).

    ``train_rows`` bounds the driver-side sample — codebook quality needs
    a representative sample, never the corpus, so training cost is flat
    in table size (same posture as ivf.train_centroids).
    """
    sample = np.array(
        df.select(vec_col).limit(train_rows).toPandas()[vec_col].tolist(),
        dtype=np.float64,
    )
    if sample.size == 0:
        raise ValueError(
            "train_codebooks: empty training sample "
            f"(no rows in {vec_col!r}) — cannot learn codebooks"
        )
    d = sample.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    sub = d // m
    return np.stack(
        [
            _lloyd(sample[:, i * sub : (i + 1) * sub], ksub, iters, seed + i)
            for i in range(m)
        ]
    )


def encode(
    df: DataFrame, vec_col: str, id_col: str, codebooks: np.ndarray
) -> DataFrame:
    """(id, code_0..code_{m-1}) — map-only Arrow encoding pass.

    Codes are int (argmin index into each subspace codebook); at scale
    this is the table you persist instead of the raw vectors.
    """
    m, ksub, sub = codebooks.shape
    # id passes through with its ACTUAL type — hardcoding `long` breaks
    # string/decimal ids at runtime (Arrow schema mismatch)
    id_type = df.schema[id_col].dataType.simpleString()
    out_schema = f"{id_col} {id_type}, " + ", ".join(
        f"code_{i} int" for i in range(m)
    )

    def _enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:  # empty Arrow batches reach the UDF on skewed splits
                continue
            vecs = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            out = {id_col: pdf[id_col]}
            for i in range(m):
                part = vecs[:, i * sub : (i + 1) * sub]
                # (N, ksub) distances against this subspace's codebook
                d2 = ((part[:, None, :] - codebooks[i][None, :, :]) ** 2).sum(
                    axis=2
                )
                out[f"code_{i}"] = d2.argmin(axis=1).astype("int32")
            yield pd.DataFrame(out)

    return df.select(id_col, vec_col).mapInPandas(_enc, schema=out_schema)


def adc_topk(
    codes: DataFrame,
    codebooks: np.ndarray,
    query: list[float],
    id_col: str,
    k: int = 10,
    round_to: int = 6,
) -> DataFrame:
    """Approximate cosine top-k from PQ codes only (ADC).

    dot(q, x) ≈ Σ_m dot(q_m, c_m[code_m]);  |x|² ≈ Σ_m |c_m[code_m]|².
    Both are M-term sums of per-subspace lookup tables, expressed as JVM
    CASE chains over the code columns — whole-stage codegen, no Python in
    the query path, global result via TakeOrderedAndProject.
    """
    m, ksub, sub = codebooks.shape
    q = np.asarray(query, dtype=np.float64)
    qnorm = float(np.sqrt((q**2).sum()))

    dot_terms = []
    nrm_terms = []
    for i in range(m):
        qi = q[i * sub : (i + 1) * sub]
        dots = codebooks[i] @ qi  # (ksub,)
        nrms = (codebooks[i] ** 2).sum(axis=1)  # (ksub,)
        code = F.col(f"code_{i}")
        # element_at over a literal array = O(1) lookup table in codegen
        dot_terms.append(
            F.element_at(
                lit_double_array(dots), code + 1
            )
        )
        nrm_terms.append(
            F.element_at(
                lit_double_array(nrms), code + 1
            )
        )
    approx_dot = sum(dot_terms[1:], dot_terms[0])
    approx_nrm = F.sqrt(sum(nrm_terms[1:], nrm_terms[0]))
    score = approx_dot / (approx_nrm * F.lit(qnorm))
    return (
        codes.select(F.col(id_col), F.round(score, round_to).alias("score"))
        .orderBy(F.desc("score"), F.col(id_col))
        .limit(k)
    )


def pq_topk(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    query: list[float],
    k: int = 10,
    m: int = 16,
    ksub: int = 16,
    seed: int = 42,
    codebooks: np.ndarray | None = None,
    rerank: int | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Train → encode → ADC shortlist → exact rerank, in one call.

    ``rerank`` (default 5k) is the ADC shortlist size: the codes-only
    scan ranks every vector approximately, then only the shortlist's
    original vectors are fetched and exactly re-scored — the standard
    two-stage PQ serving shape. The rerank join touches ``rerank`` ids
    against the corpus (broadcast hash join on the tiny shortlist side),
    so the full-precision vectors are read for a constant number of rows
    regardless of corpus size. Set ``rerank=0`` for pure-ADC results.

    A real deployment trains once, persists the codes table, and serves
    adc_topk + rerank per query; this wrapper is the test/demo shape.
    """
    from pyspark.sql import functions as SF

    if codebooks is None:
        codebooks = train_codebooks(df, vec_col, m=m, ksub=ksub, seed=seed)
    codes = encode(df, vec_col, id_col, codebooks)
    if rerank is None:
        rerank = 5 * k
    if rerank <= 0:
        return adc_topk(codes, codebooks, query, id_col, k=k)
    shortlist = adc_topk(codes, codebooks, query, id_col, k=rerank)

    from data_lakehouse_project_spark.ext.similarity import (
        _as_double,
        cosine,
    )

    qcol = lit_double_array(query)
    exact = cosine(_as_double(SF.col(vec_col)), qcol)
    return (
        df.join(SF.broadcast(shortlist.select(id_col)), id_col)
        .select(SF.col(id_col), SF.round(exact, round_to).alias("score"))
        .orderBy(SF.desc("score"), SF.col(id_col))
        .limit(k)
    )
