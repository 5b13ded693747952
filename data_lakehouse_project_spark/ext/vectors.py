"""Vector-column analytics: normalization, elementwise aggregation,
per-label centroids.

Elementwise array aggregation has no Spark built-in; the scalable shape
is posexplode → (group, position) aggregate → re-assemble sorted. The
shuffle carries (label, pos, partial) — dim × |labels| × partitions rows,
independent of corpus size after partial aggregation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_lakehouse_project_spark.ext.similarity import _as_double, _norm


def l2_normalize(vec: Column) -> Column:
    """Unit-norm an array<float|double> column (JVM expressions)."""
    v = _as_double(vec)
    n = _norm(v)
    return F.transform(v, lambda x: x / n)


def label_centroid_components(
    df: DataFrame, vec_col: str, label_col: str, round_to: int = 6
) -> DataFrame:
    """Per-label centroid components at (label, i, v) grain, i 1-based.

    posexplode → partial avg per (label, position). The shuffle carries
    dim × |labels| × partitions rows after partial aggregation,
    independent of corpus size. Scalar grain (no array columns) so the
    result is hashable by any downstream canonicalizer.
    """
    scale = float(10**round_to)
    exploded = df.select(
        F.col(label_col), F.posexplode(_as_double(F.col(vec_col)))
    )
    return exploded.groupBy(label_col, (F.col("pos") + 1).alias("i")).agg(
        (F.floor(F.avg("col") * scale + F.lit(0.5)).cast("double") / scale).alias(
            "v"
        )
    )


def label_centroids(
    df: DataFrame, vec_col: str, label_col: str, round_to: int = 6
) -> DataFrame:
    """Per-label centroid (elementwise mean) of an embedding column,
    re-assembled into an ordered array<double> per label.

    Array-typed output: for oracle-checked queries prefer
    :func:`label_centroid_components` (scalar grain).
    """
    per_pos = label_centroid_components(df, vec_col, label_col, round_to)
    return per_pos.groupBy(label_col).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("i", "v"))), lambda s: s["v"]
        ).alias("centroid")
    )


def quantize_int8(vec: Column) -> tuple[Column, Column]:
    """Symmetric per-vector int8 quantization: scale = max|x|/127,
    q_i = floor(x_i/scale + 0.5). Returns (scale, quantized array).

    Explicit floor-rounding (not engine round()) so external engines
    reproduce the codes bit-for-bit. 4× memory vs float32 — the storage
    posture for 100 TB embedding tables; dequantized x̂ = q·scale.
    """
    v = _as_double(vec)
    scale = F.array_max(F.transform(v, F.abs)) / F.lit(127.0)
    q = F.transform(v, lambda x: F.floor(x / scale + F.lit(0.5)))
    return scale, q


def quantization_report(
    df: DataFrame, vec_col: str, id_col: str
) -> DataFrame:
    """Per-vector int8 quantization error report at scalar grain:
    (id, scale, mse, max_abs_err) — the acceptance gate you'd run
    before switching an ANN index to quantized storage."""
    scale, q = quantize_int8(F.col(vec_col))
    # raw scale must NOT share a name with the rounded output column:
    # Spark 4 resolves lateral column aliases inside one select, so a
    # same-named F.col("scale") in the error expression would silently
    # bind to the ROUNDED alias and shift every error by q·Δscale
    df2 = df.select(F.col(id_col), _as_double(F.col(vec_col)).alias("v"),
                    scale.alias("scale_raw"), q.alias("q"))
    err = F.zip_with("v", "q", lambda x, qq: x - qq * F.col("scale_raw"))
    sq = F.transform(err, lambda e: e * e)
    mse = F.aggregate(sq, F.lit(0.0), lambda a, b: a + b) / F.size("v")
    mx = F.array_max(F.transform(err, F.abs))

    def _r9(c):
        return (F.floor(c * 1e9 + F.lit(0.5)).cast("double") / 1e9)

    return df2.select(
        id_col,
        _r9(F.col("scale_raw")).alias("scale"),
        _r9(mse).alias("mse"),
        _r9(mx).alias("max_abs_err"),
    )


def hashed_tf_components(
    df: DataFrame,
    text_col: str,
    id_col: str,
    dim: int = 64,
    normalize: bool = True,
    round_to: int = 6,
) -> DataFrame:
    """Feature-hashing document vectorizer at scalar (id, i, v) grain —
    the no-model bridge from the text table to every vector operator
    (cosine pairs, ANN, k-means/SemDeDup) when no learned embeddings
    exist yet.

    Each token hashes to one of ``dim`` buckets via the engine-portable
    md5 bucket (ext/sampling.py::hash_bucket — any engine, and the SQL
    oracle, reproduces the mapping); ``v`` is the bucket's token count,
    L2-normalized per document by default so cosine is a dot product.
    Only non-zero components are emitted (sparse grain — exactly what a
    pair-join or an inverted index wants; densify with a
    sequence+map_from_entries transform when an array is required).

    Scale: explode → ONE (id, bucket) aggregation → per-doc norm via a
    second small aggregation joined back. No Python, no driver state.
    """
    from data_lakehouse_project_spark.ext.sampling import hash_bucket
    from data_lakehouse_project_spark.ext.text import ws_tokens

    scale = float(10**round_to)

    counts = (
        df.select(
            F.col(id_col),
            F.explode(ws_tokens(F.col(text_col))).alias("_tok"),
        )
        .select(id_col, hash_bucket(F.col("_tok"), dim).alias("i"))
        .groupBy(id_col, "i")
        .agg(F.count(F.lit(1)).cast("double").alias("_cnt"))
    )
    if not normalize:
        return counts.select(
            id_col, "i", F.col("_cnt").cast("double").alias("v")
        )
    norms = counts.groupBy(id_col).agg(
        F.sqrt(F.sum(F.col("_cnt") * F.col("_cnt"))).alias("_n")
    )
    return counts.join(norms, id_col).select(
        id_col,
        "i",
        (F.floor(F.col("_cnt") / F.col("_n") * scale + F.lit(0.5)).cast(
            "double"
        ) / scale).alias("v"),
    )


def sparse_cosine_pairs(
    components: DataFrame,
    id_col: str,
    threshold: float,
    round_to: int = 6,
) -> DataFrame:
    """All pairs with cosine >= threshold from SPARSE (id, i, v) unit
    vectors (e.g. hashed_tf_components output): inverted-index join on
    the component index, one pair-grain aggregation of the partial
    products. cosine = Σ v_a·v_b because inputs are unit-norm.

    Scale: cost is Σ_i |postings(i)|² — the classic sparse-vector bound,
    tiny for high-dim sparse vectors; for LOW-dim dense components this
    degenerates toward the dense pair matmul, where the LSH family
    (ext/similarity.py) is the right tool instead. No crossJoin: pairs
    exist only where a component index collides.

    Determinism: the dot is accumulated in INTEGER micro-units
    (components × 10^round_to as BIGINT), not as a float sum — float
    addition is non-associative, so Spark's partial-aggregation order
    vs any other engine's (or a rerun's) can flip the last rounded
    digit on boundary pairs. Integer sums are exact and order-free;
    the threshold compares in the same scaled-integer domain.
    Assumes components are already rounded to ``round_to`` digits
    (hashed_tf_components' contract), |v| ≤ 1.
    """
    scale = float(10**round_to)
    # dot in micro²-units is exact: |vi| ≤ 10^r ⇒ products ≤ 10^2r,
    # summed over ≤ dim terms — far below int64.
    thr_scaled = int(round(threshold * 10 ** (2 * round_to)))
    half = 10**round_to // 2
    vi = F.floor(F.col("v") * scale + F.lit(0.5)).cast("long")
    a = components.select(
        F.col(id_col).alias("_ida"), "i", vi.alias("_va")
    )
    b = components.select(
        F.col(id_col).alias("_idb"), "i", vi.alias("_vb")
    )
    return (
        a.join(b, "i")
        .where(F.col("_ida") < F.col("_idb"))
        .groupBy("_ida", "_idb")
        .agg(F.sum(F.col("_va") * F.col("_vb")).alias("_dot"))
        .where(F.col("_dot") >= thr_scaled)
        .select(
            F.col("_ida").alias("id_a"),
            F.col("_idb").alias("id_b"),
            (
                F.floor((F.col("_dot") + F.lit(half)) / F.lit(scale)).cast(
                    "double"
                )
                / scale
            ).alias("cosine"),
        )
    )
