"""Deterministic sampling & dataset splitting for training-data
pipelines.

Random sampling (``df.sample``/``sampleBy``) is seed- and
partitioning-dependent — rerun the pipeline after a repartition and the
sample changes, which poisons experiment reproducibility and makes
train/eval splits leak. The training-pipeline-grade alternative is
**hash sampling**: bucket every row by a stable content hash of its key
and keep buckets below the rate cutoff. Properties that matter at
100 TB:

- **Deterministic & engine-independent**: same keys → same sample, on
  any cluster size, partitioning, or engine (md5 is standardized, so
  external systems — and the SQL oracle — reproduce the exact rows).
- **Map-only**: a filter on a hash expression; no shuffle, no state,
  fully pushdown-compatible with column pruning.
- **Stable under growth**: a key keeps its bucket forever, so
  yesterday's 1% sample is a subset of today's 2% sample (rate changes
  are monotone), and train/eval membership never flips.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BUCKETS = 10_000  # rate resolution: 0.01%


def hash_bucket(key: Column, buckets: int = BUCKETS) -> Column:
    """Stable [0, buckets) bucket from the md5 of the key's string form.

    First 8 hex chars → 32-bit int → mod. md5 (not xxhash64/crc32)
    because every engine renders identical hex for identical bytes —
    the sample is reproducible outside Spark.
    """
    return (
        F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10)
        .cast("long")
        % buckets
    )


def hash_sample(
    df: DataFrame, key_col: str, fraction: float, buckets: int = BUCKETS
) -> DataFrame:
    """Keep ~``fraction`` of rows, deterministically by key hash."""
    return df.where(hash_bucket(F.col(key_col), buckets) < int(fraction * buckets))


def split_column(
    key: Column, eval_fraction: float, buckets: int = BUCKETS
) -> Column:
    """'eval' for the held-out slice, 'train' otherwise — membership is a
    pure function of the key, so no leakage across reruns/repartitions."""
    return F.when(
        hash_bucket(key, buckets) < int(eval_fraction * buckets), F.lit("eval")
    ).otherwise(F.lit("train"))


def cluster_safe_split(
    clusters: DataFrame,
    eval_fraction: float,
    cluster_col: str = "cluster_id",
    buckets: int = BUCKETS,
) -> DataFrame:
    """Leakage-safe train/eval split: the hash bucket is computed on the
    near-dup CLUSTER id, not the document id, so every member of a
    duplicate cluster lands in the same split — a doc-id split leaks
    whenever two near-copies straddle the boundary (the eval set then
    "tests" memorized training text). Singleton docs are their own
    cluster, so the split degrades to the plain doc-id split exactly
    when there is nothing to leak.

    Input is the (id, cluster_id) assignment from
    :func:`~data_lakehouse_project_spark.ext.graph.dedup_clusters`;
    output adds a ``split`` column. Map-only (the clustering already
    paid its shuffles); membership is a pure function of the cluster
    id, so reruns and engine ports agree row-for-row.
    """
    return clusters.withColumn(
        "split", split_column(F.col(cluster_col), eval_fraction, buckets)
    )


def stratified_hash_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    buckets: int = BUCKETS,
) -> DataFrame:
    """Per-stratum deterministic sampling — the 'data mixing weights'
    primitive (e.g. keep 100% of wiki, 10% of web crawl). The rate map
    becomes a CASE expression: still a map-only filter, no shuffle, and
    the per-stratum keep decision stays independent of every other row.
    """
    cutoff = F.lit(int(default_rate * buckets))
    for stratum, rate in sorted(rates.items()):
        cutoff = F.when(
            F.col(strata_col) == stratum, F.lit(int(rate * buckets))
        ).otherwise(cutoff)
    return df.where(hash_bucket(F.col(key_col), buckets) < cutoff)


def temperature_mix_report(
    df: DataFrame,
    strata_col: str,
    alpha: float = 0.5,
    target_total: int | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Temperature-scaled mixture weights per stratum — the standard
    multi-source/multilingual rebalancing rule (weight_i ∝ n_i^alpha):
    alpha=1 keeps natural proportions, alpha=0 is uniform, 0<alpha<1
    up-samples small sources. Returns one row per stratum:
    (stratum, n_docs, weight, sample_rate) where sample_rate =
    min(1, target_total·weight / n_i) is directly feedable to
    ``stratified_hash_sample``.

    Shape: one partial+final aggregation over the strata column, then a
    1-row broadcast scalar (denominator/total) crossed back — no window
    over an empty partitioning, no second scan. Rounding uses the
    explicit floor form so external engines reproduce it bit-for-bit.
    """
    scale = float(10**round_to)

    def _rnd(c: Column) -> Column:
        return F.floor(c * scale + F.lit(0.5)).cast("double") / scale

    counts = df.groupBy(F.col(strata_col).alias("stratum")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    powed = counts.withColumn("n_pow", F.pow(F.col("n_docs"), F.lit(alpha)))
    denom = powed.agg(
        F.sum("n_pow").alias("_denom"), F.sum("n_docs").alias("_total")
    )
    target = (
        F.lit(float(target_total))
        if target_total is not None
        else F.col("_total").cast("double")
    )
    weight = F.col("n_pow") / F.col("_denom")
    return (
        powed.crossJoin(F.broadcast(denom))
        .select(
            "stratum",
            "n_docs",
            _rnd(weight).alias("weight"),
            _rnd(
                F.least(F.lit(1.0), target * weight / F.col("n_docs"))
            ).alias("sample_rate"),
        )
    )


def cap_per_group(
    df: DataFrame, group_col: str, id_col: str, cap: int
) -> DataFrame:
    """Deterministic per-group row cap — the "domain quota" curation
    primitive (keep at most ``cap`` documents per source/domain so one
    crawl host can't dominate the training mix).

    Membership is a pure function of the data: rows rank by
    (md5(id), id) inside their group, so reruns, repartitions and
    engine changes keep the same rows, and a LOWER cap keeps a subset
    of a higher cap's selection.

    Scale: one shuffle on ``group_col``; each group sorts only its own
    rows. A pathologically hot group makes that sort the straggler —
    for those use :func:`cap_per_group_hash`, which never sorts.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy(group_col).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= cap)
        .drop("_rn")
    )


def cap_per_group_hash(
    df: DataFrame, group_col: str, id_col: str, cap: int
) -> DataFrame:
    """Approximate per-group cap without any per-group sort — the
    100 TB shape for skewed domains: per-group counts (small aggregate,
    broadcast back) set a keep-fraction, applied as a map-only
    md5-bucket filter. Keeps ~``cap`` rows per group (binomial jitter
    around the target); deterministic and rate-monotone like every
    hash-sampling op here.

    The cutoff is ``ceil(cap * BUCKETS / n)`` clamped to [1, BUCKETS]:
    a group hotter than ``cap * BUCKETS`` rows keeps one bucket
    (~n/BUCKETS rows — overshooting ``cap`` rather than silently
    dropping the whole group, which a floor would do). Callers needing
    a hard ceiling on pathological groups should chain
    :func:`cap_per_group` on this op's (much smaller) output.
    """
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("_n"))
    cutoff = F.least(
        F.lit(BUCKETS),
        F.greatest(
            F.lit(1),
            F.ceil(F.lit(cap) * BUCKETS / F.col("_n")).cast("int"),
        ),
    )
    return (
        df.join(F.broadcast(counts), group_col)
        .where(hash_bucket(F.col(id_col)) < cutoff)
        .drop("_n")
    )


def token_budget_selection(
    df: DataFrame,
    text_col: str,
    id_col: str,
    group_col: str,
    budget_tokens: int,
) -> DataFrame:
    """Greedy per-group selection under a token budget: documents are
    taken in deterministic priority order (longest first — the common
    "prefer long documents" curation heuristic — ties broken by id)
    until the group's cumulative token count would exceed
    ``budget_tokens``. Returns the per-group accounting
    (group, docs_kept, tokens_kept).

    Scale: one shuffle on ``group_col`` + a running-sum window inside
    each group — the same cost envelope as any per-domain rollup; no
    driver-side iteration.
    """
    from pyspark.sql.window import Window

    from data_lakehouse_project_spark.ext.text import token_count

    w = (
        Window.partitionBy(group_col)
        .orderBy(F.desc("_n_tok"), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        df.select(
            F.col(group_col), F.col(id_col), token_count(F.col(text_col)).alias("_n_tok")
        )
        .withColumn("_cum", F.sum("_n_tok").over(w))
        .where(F.col("_cum") <= budget_tokens)
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("docs_kept"),
            F.sum("_n_tok").alias("tokens_kept"),
        )
    )


def token_budget_skip_selection(
    df: DataFrame,
    text_col: str,
    id_col: str,
    group_col: str,
    budget_tokens: int,
) -> DataFrame:
    """Greedy SKIP-OVER selection under a per-group token budget — the
    knapsack-style refinement of ``token_budget_selection``: documents
    are visited in the same priority order (longest first, ties by id),
    but a document that would overflow the remaining budget is SKIPPED
    and the walk continues, so a group whose longest doc exceeds the
    budget still fills it with shorter ones (strict prefix-truncation
    keeps nothing in that case). Returns (group, doc_id, n_tokens) for
    every selected document — the selection itself, joinable back to
    content; the (group, docs_kept, tokens_kept) accounting is one
    groupBy away.

    The taken-set depends on which earlier docs were taken — a
    sequential recurrence no window frame expresses — so each group
    runs one Arrow-batched pass (``applyInPandas``; state is two ints).
    Scale: one shuffle on ``group_col``, groups stream through pandas
    at Arrow batch granularity; the walk is O(group size). Same cost
    envelope as the window variant plus the Python hop — use it when
    budget fill matters more than pure JVM residency.
    """
    import pandas as pd

    from data_lakehouse_project_spark.ext.text import token_count

    # a doc longer than the whole budget can NEVER be taken — drop it
    # map-side so it doesn't shuffle or sit in the pandas group (the
    # pathological giant-doc group shrinks before the Python hop)
    sized = df.select(
        F.col(group_col),
        F.col(id_col),
        token_count(F.col(text_col)).alias("n_tokens"),
    ).where(F.col("n_tokens") <= budget_tokens)

    def _walk(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["n_tokens", id_col], ascending=[False, True]
        )
        taken = 0
        keep = []
        for n in pdf["n_tokens"]:
            ok = taken + n <= budget_tokens
            keep.append(ok)
            if ok:
                taken += n
        return pdf[keep]

    return sized.groupBy(group_col).applyInPandas(_walk, sized.schema)


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int,
    group_cols: list[str] | None = None,
    buckets: int = BUCKETS,
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (per group):
    the Efraimidis–Spirakis A-ES scheme — each row gets key =
    ln(u) / w with u uniform and w its weight; the k LARGEST keys are a
    weighted sample without replacement. Rows with non-positive weight
    are ineligible.

    Determinism + portability: u derives from the md5 hash bucket
    (u = (bucket + 0.5) / buckets), so the same rows are chosen on any
    engine and on every run — the reproducibility contract the rest of
    ext/sampling.py keeps. The key is ROUNDED to 9 decimals and ties
    break on ascending id, so the top-k boundary is identical across
    engines' libm implementations.

    Scale shape: one window rank per group (single shuffle on
    group_cols); no global sort, no driver iteration. This is the
    quality-weighted corpus subset selector ("sample 1M docs ∝ quality
    score") the uniform hash_sample can't express.
    """
    from pyspark.sql.window import Window

    u = (hash_bucket(F.col(id_col), buckets) + F.lit(0.5)) / F.lit(
        float(buckets)
    )
    w = F.col(weight_col).cast("double")
    scale = float(10**9)
    key = F.floor(F.log(u) / w * scale + F.lit(0.5)).cast(
        "double"
    ) / F.lit(scale)
    parts = [F.col(c) for c in (group_cols or [])]
    rank_w = Window.partitionBy(*parts).orderBy(
        F.desc("es_key"), F.col(id_col)
    )
    return (
        df.where(w > 0)
        .withColumn("es_key", key)
        .withColumn("rn", F.row_number().over(rank_w))
        .where(F.col("rn") <= k)
        .drop("rn")
    )
