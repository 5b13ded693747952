"""Runnable end-to-end LLM training-corpus curation pipeline.

Composes the engine's text-analysis and dedup operators into the
standard pretraining-data shape (the north-star capability BASELINE.json
adds on top of the reference, which itself stops at a constant
``data_quality_check = lit('passed')`` — mysql_silver_transformation.py:67):

    documents
      → length-outlier gate (p5-p95 band)        ext/text.py::length_outlier_filter
      → language ID (keep target langs)          ext/text.py::language_id
      → Gopher rule gate (named thresholds)      ext/curation.py::gopher_quality_flags (r5)
      → quality score (keep >= threshold)        ext/text.py::quality_score
      → ML quality filter (hashed BoW + LR)      ext/classifier.py (r5)
      → exact dedup (md5 keep-first)             ext/dedup.py::exact_dedup_groups
      → near-dup collapse (MinHash LSH →         ext/dedup.py::minhash_near_duplicates,
        clusters → best-quality survivor)        ext/graph.py::canonical_representatives
      → boilerplate span trim (ExactSubstr cut)  ext/dedup.py::trim_duplicated_spans (r5)
      → benchmark decontamination (4-gram hit)   ext/dedup.py::ngram_contamination
      → domain quota (cap docs per source)       ext/sampling.py::cap_per_group
      → token accounting                         ext/text.py::bpe_token_count
      → DSIR sampling weights (target tilt)      ext/curation.py::dsir_log_weights (r5)
      → sharded delivery + verifiable manifest   ext/shards.py::write_training_shards

Every stage is a declarative DataFrame transform: filters/scores are JVM
expression trees, dedup joins are bucket-shaped (no crossJoin), and the
near-dup pass drops the LOWER-quality member of each verified pair —
the drop set is built with a groupBy max, not a driver-side loop, so the
plan is identical at 5k docs and 5B docs.

    python examples/training_corpus_pipeline.py [sf_dir] [output_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from data_lakehouse_project_spark import get_spark
from data_lakehouse_project_spark.ext.classifier import (
    score_documents,
    train_quality_classifier,
)
from data_lakehouse_project_spark.ext.dedup import (
    exact_dedup_groups,
    minhash_near_duplicates,
    ngram_contamination,
    trim_duplicated_spans,
)
from data_lakehouse_project_spark.ext.graph import (
    canonical_representatives,
    dedup_clusters,
)
from data_lakehouse_project_spark.ext.curation import (
    dsir_log_weights,
    gopher_quality_flags,
)
from data_lakehouse_project_spark.ext.sampling import cap_per_group
from data_lakehouse_project_spark.ext.shards import (
    verify_shards,
    write_training_shards,
)
from data_lakehouse_project_spark.ext.text import (
    bpe_token_count,
    language_id,
    length_outlier_filter,
    quality_score,
)
from data_lakehouse_project_spark.sources.readers import load_testdata

KEEP_LANGS = ["en", "fr", "de", "es"]
MIN_QUALITY = 0.35
NEAR_DUP_JACCARD = 0.8
MAX_PER_SOURCE = 20  # domain quota: max surviving docs per source


def curate(docs: DataFrame, *, min_quality: float = MIN_QUALITY,
           near_dup_jaccard: float = NEAR_DUP_JACCARD,
           benchmark: DataFrame | None = None,
           contamination_ngram: int = 4) -> dict[str, DataFrame]:
    """Run the full curation funnel; returns every intermediate stage so
    callers (and tests) can audit per-stage attrition."""
    stages: dict[str, DataFrame] = {"raw": docs}

    # 0. length-outlier gate: drop docs outside their source's [p5, p95]
    # token-length band (truncated/concatenated pages) BEFORE spending
    # any scoring work on them — broadcast bounds, map-side filter
    in_band = length_outlier_filter(
        docs, "text", "doc_id", group_col="source"
    ).select("doc_id")
    stages["length_kept"] = docs.join(in_band, "doc_id", "left_semi")

    # 1. language filter — broadcast-free: the heuristic is a projection
    lang = language_id(stages["length_kept"], "text", "doc_id")
    stages["lang_kept"] = (
        stages["length_kept"].join(lang, "doc_id")
        .where(F.col("detected_lang").isin(KEEP_LANGS))
        .drop("stopword_hits")
    )

    # 2. quality floor — first the Gopher rule table (r5 session 4:
    # named per-rule booleans, map-only projection), then the scalar
    # heuristic score. The word-count rule is reported but NOT gated
    # here: its published 50-word floor is tuned for web pages, and on
    # this ~45-word synthetic corpus it selects exactly the long
    # mutually-similar docs, collapsing the demo funnel to a handful of
    # near-dup survivors. A real deployment gates on passes_gopher.
    gopher_ok = (
        gopher_quality_flags(stages["lang_kept"], "text", "doc_id")
        .where(
            F.col("flag_mean_len")
            & F.col("flag_alpha")
            & F.col("flag_stopwords")
        )
        .select("doc_id")
    )
    stages["gopher_kept"] = stages["lang_kept"].join(
        gopher_ok, "doc_id", "left_semi"
    )
    q = quality_score(stages["gopher_kept"], "text", "doc_id")
    stages["quality_kept"] = (
        stages["gopher_kept"].join(q, "doc_id")
        .where(F.col("quality_score") >= min_quality)
    )

    # 2b. model-based quality filter (r5): a fasttext-shape classifier
    # trained on the RAW corpus's weak-label tails (both tails present
    # there; the floored slice has lost its bad tail) re-judges the
    # heuristic survivors — the CCNet-style second opinion. Scoring is
    # a map-only pass (broadcast LR coefficients).
    model = train_quality_classifier(docs, "text", "doc_id")
    ml_keep = (
        score_documents(model, stages["quality_kept"], "text", "doc_id")
        .where(F.col("keep"))
        .select("doc_id")
    )
    # persist: every downstream stage (and the funnel report's per-stage
    # counts) re-reads this frame; without the cache each one re-trains
    # and re-applies the classifier. A production pipeline writes stage
    # boundaries to the lakehouse instead (plans/pipeline.py) — the
    # cache plays that role in an in-memory walkthrough.
    stages["ml_quality_kept"] = stages["quality_kept"].join(
        ml_keep, "doc_id", "left_semi"
    ).persist()

    # 3. exact dedup: keep the min doc_id of each md5 group
    groups = exact_dedup_groups(stages["ml_quality_kept"], "text", "doc_id")
    stages["exact_unique"] = stages["ml_quality_kept"].join(
        groups.select(F.col("keep_id").alias("doc_id")), "doc_id", "left_semi"
    )

    # 4. near-dup collapse: for each verified pair drop the lower-quality
    # side. Pairs alone are not enough: near-duplication is transitive
    # (A~B, B~C must collapse to ONE survivor even if A~C was never
    # emitted), so pairs feed connected components and the best-quality
    # member of each cluster survives (ext/graph.py::
    # canonical_representatives) — no collect, no loop.
    pairs = minhash_near_duplicates(
        stages["exact_unique"], "text", "doc_id",
        jaccard_threshold=near_dup_jaccard,
    )
    clusters = dedup_clusters(stages["exact_unique"], pairs, "doc_id")
    qcols = stages["exact_unique"].select("doc_id", "quality_score")
    keep = canonical_representatives(clusters, qcols).select(
        F.col("keep_id").alias("doc_id")
    )
    # persist for the same reason: the LSH + connected-components chain
    # above is the funnel's most expensive segment
    stages["near_dup_unique"] = stages["exact_unique"].join(
        keep, "doc_id", "left_semi"
    ).persist()

    # 4b. boilerplate span trim (r5, ExactSubstr "cut" step): any
    # 8-token window still repeating across the near-dup-unique
    # survivors is chrome (headers/footers), not content — remove every
    # occurrence, keep the documents. Doc count is unchanged; token
    # count drops.
    stages["trimmed"] = trim_duplicated_spans(
        stages["near_dup_unique"], "text", "doc_id", window=8
    )

    # 5. benchmark decontamination: drop any survivor sharing a word
    # n-gram with the held-out eval set (bench grams broadcast — the
    # check is map-side over the corpus scan)
    clean = stages["trimmed"]
    if benchmark is not None:
        contaminated = ngram_contamination(
            clean, benchmark, n=contamination_ngram
        ).select("doc_id")
        clean = clean.join(contaminated, "doc_id", "left_anti")
    stages["decontaminated"] = clean

    # 6. domain quota: no source may contribute more than max_per_source
    # survivors (deterministic md5-rank membership — reruns keep the
    # same docs)
    stages["quota_kept"] = cap_per_group(
        stages["decontaminated"], "source", "doc_id", cap=MAX_PER_SOURCE
    )

    # 7. token accounting + DSIR sampling weight on the survivors (r5
    # session 4): the trainer's sampler draws proportional to
    # exp(dsir_logw) to tilt the mix toward the target domain without
    # another filtering pass
    dsir = dsir_log_weights(
        stages["quota_kept"], "text", "doc_id",
        F.col("source") == "src0", dim=1024,
    ).withColumnRenamed("log_weight", "dsir_logw")
    stages["curated"] = (
        stages["quota_kept"]
        .withColumn("n_bpe_tokens", bpe_token_count(F.col("text")))
        .join(dsir, "doc_id")
    )
    return stages


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(
        prefix="curated_corpus_"
    )
    spark = get_spark(app_name="training-corpus-pipeline")
    docs = load_testdata(spark, sf_dir)["documents"]

    # hold out one source as the "benchmark" to decontaminate against
    bench = docs.where(F.col("source") == "src19")
    train = docs.where(F.col("source") != "src19")
    stages = curate(train, benchmark=bench)
    funnel = {name: df.count() for name, df in stages.items()}
    total_tokens = stages["curated"].agg(
        F.sum("n_bpe_tokens").alias("t")
    ).collect()[0]["t"]

    # deliver as deterministic training shards + verifiable manifest,
    # then verify the delivered bytes like a trainer would
    shards_path = os.path.join(out_dir, "shards")
    write_training_shards(
        stages["curated"], "text", "doc_id", shards_path, n_shards=8
    )
    bad = verify_shards(spark, shards_path).where("NOT ok").count()

    print("curation funnel (docs surviving each stage):")
    for name in ["raw", "length_kept", "lang_kept", "gopher_kept",
                 "quality_kept", "ml_quality_kept", "exact_unique",
                 "near_dup_unique", "trimmed", "decontaminated",
                 "quota_kept"]:
        print(f"  {name:16s} {funnel[name]:>8d}")
    print(f"curated corpus: {funnel['curated']} docs, "
          f"{total_tokens} BPE-ish tokens → {shards_path} "
          f"(8 shards, manifest verified, {bad} bad)")
    spark.stop()


if __name__ == "__main__":
    main()
