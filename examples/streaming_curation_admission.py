"""Streaming training-corpus admission: the online counterpart of
examples/training_corpus_pipeline.py.

A document stream (files landing in a directory — swap for Kafka by
changing one ``readStream`` line) is admitted into a living corpus via
``foreachBatch``, composing the engine's incremental operators:

    micro-batch of raw docs
      → quality gate (JVM expression filter)   ext/text.py::quality_score
      → within-batch exact dedup (keep-first)  ext/dedup.py::exact_dedup_groups
      → batch-vs-CORPUS dedup verdicts         ext/dedup.py::incremental_dedup_report_indexed
        probing a PERSISTED index (fingerprints + shingle postings,
        two delta-lite tables APPENDED per admitted batch) — corpus
        text is never re-scanned per batch, old×old pairs are never
        generated, and only 'unique' docs survive; the exact branch is
        gated by a PERSISTED Bloom filter (ext/bloom.py, ≤1 MiB,
        bit_or-merged per batch), so definite-new fingerprints never
        enter the fp-index join at all
      → ACID append to the corpus table        operators/txnlog.py::TxnTable
        (one commit per micro-batch: readers see whole batches or
        nothing, and every batch is a time-travelable version)
      → IVF index admission under frozen       ext/ivf.py::append_to_ivf_index
        centroids (dynamic-partition append, no rebuild)
      → training-shard delivery + verifiable   ext/shards.py::write_training_shards,
        manifest, re-verified after each batch ext/shards.py::verify_shards

Exactly-once posture: the streaming checkpoint makes batch delivery
at-least-once; the corpus-level dedup makes re-delivered docs no-ops, so
the pipeline is idempotent end to end. At scale the per-batch shard
rewrite becomes an incremental delta-shard append; the corpus re-read
stays cheap because incremental_dedup probes fingerprints/postings, a
persisted index in a real deployment.

    python examples/streaming_curation_admission.py [src_dir] [table_root]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_lakehouse_project_spark.ext.bloom import bloom_build, bloom_merge
from data_lakehouse_project_spark.ext.dedup import (
    build_dedup_index,
    exact_dedup_groups,
    incremental_dedup_report_indexed,
)
from data_lakehouse_project_spark.ext.ivf import append_to_ivf_index
from data_lakehouse_project_spark.ext.shards import (
    verify_shards,
    write_training_shards,
)
from data_lakehouse_project_spark.ext.text import quality_score
from data_lakehouse_project_spark.operators.txnlog import TxnTable

MIN_QUALITY = 0.2
DOC_SCHEMA = "doc_id long, source string, text string"
BLOOM_BITS = 1 << 20
BLOOM_HASHES = 5


def pseudo_embedding(dim: int = 8):
    """Deterministic per-doc vector (hash projection of doc_id) — stands
    in for a model embedding so the IVF admission plumbing is real while
    the example stays model-free."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: (
            F.pmod(F.xxhash64(F.col("doc_id"), i), F.lit(1000)) / 1000.0
        ),
    )


def admit_batch(
    batch_df: DataFrame,
    corpus_path: str,
    ivf_path: str,
    shards_path: str,
    centroids: np.ndarray,
    jaccard_threshold: float = 0.8,
    batch_id: int | None = None,
) -> dict[str, int]:
    """One micro-batch through the admission funnel. Returns stage
    counts (arrived/gated/novel) for observability.

    ``batch_id`` arms Delta-style ``txn`` exactly-once on the corpus
    and dedup-index appends: a checkpoint replay of an already-admitted
    micro-batch no-ops those commits instead of re-appending. (The
    dedup gate ALSO self-heals replays — replayed docs read as
    duplicates once the index write landed — but the txn action closes
    the crash window between the corpus commit and the index commit.)
    """
    spark = batch_df.sparkSession
    arrived = batch_df.count()

    ok_ids = quality_score(batch_df, "text", "doc_id").where(
        F.col("quality_score") >= MIN_QUALITY
    )
    gated = batch_df.join(ok_ids.select("doc_id"), "doc_id")
    # within-batch exact dedup: keep each fingerprint group's min id
    keeps = exact_dedup_groups(gated, "text", "doc_id").select(
        F.col("keep_id").alias("doc_id")
    )
    gated = gated.join(keeps, "doc_id")
    n_gated = gated.count()

    table = TxnTable(corpus_path)
    fp_table = TxnTable(corpus_path + "_fp_index")
    sh_table = TxnTable(corpus_path + "_postings")
    bloom_table = TxnTable(corpus_path + "_bloom")
    if table.latest_version() >= 0:
        verdicts = incremental_dedup_report_indexed(
            fp_table.read(spark),
            sh_table.read(spark),
            gated,
            "text",
            "doc_id",
            jaccard_threshold=jaccard_threshold,
            # persisted Bloom gate: definite-new fingerprints skip the
            # exact fp-index join entirely (ext/bloom.py, ≤1 MiB bitset)
            bloom=bloom_table.read(spark),
            bloom_bits=BLOOM_BITS,
            bloom_hashes=BLOOM_HASHES,
        )
        novel = gated.join(
            verdicts.where(F.col("kind") == "unique").select("doc_id"),
            "doc_id",
        )
    else:
        novel = gated
    # stabilize: everything downstream (corpus append, IVF, shards)
    # must see the SAME novel set even though parquet reads re-plan
    novel = novel.localCheckpoint(eager=True)
    n_novel = novel.count()

    txn = (
        lambda name: (name, batch_id) if batch_id is not None else None
    )
    if n_novel:
        # one atomic commit per batch, replay-proof via the txn action
        table.write(novel, mode="append", txn=txn("corpus"))
        # grow the persisted dedup index by exactly the admitted docs
        new_fp, new_sh = build_dedup_index(novel, "text", "doc_id")
        fp_table.write(new_fp, mode="append", txn=txn("fp"))
        sh_table.write(new_sh, mode="append", txn=txn("sh"))
        # fold the admitted fingerprints into the persisted Bloom gate
        # (lossless bit_or merge; the table stays <= BLOOM_BITS/64 rows)
        batch_bloom = bloom_build(
            new_fp.select("fp"), "fp", BLOOM_BITS, BLOOM_HASHES
        )
        if bloom_table.latest_version() >= 0:
            batch_bloom = bloom_merge(bloom_table.read(spark), batch_bloom)
        bloom_table.write(batch_bloom, mode="overwrite")
        append_to_ivf_index(
            novel.withColumn("embedding", pseudo_embedding()),
            "embedding",
            ivf_path,
            centroids,
        )
        write_training_shards(
            table.read(spark), "text", "doc_id", shards_path, n_shards=4
        )
        bad = verify_shards(spark, shards_path).where(~F.col("ok")).count()
        if bad:
            raise RuntimeError(f"{bad} shard(s) failed verification")
    return {"arrived": arrived, "gated": n_gated, "novel": n_novel}


def run_admission_stream(
    spark: SparkSession,
    src_dir: str,
    root: str,
    centroids: np.ndarray,
    jaccard_threshold: float = 0.8,
) -> list[dict[str, int]]:
    """Drain everything currently in ``src_dir`` (availableNow trigger)
    through the admission funnel; returns per-batch stage counts."""
    stats: list[dict[str, int]] = []
    paths = {
        "corpus": os.path.join(root, "corpus"),
        "ivf": os.path.join(root, "ivf_index"),
        "shards": os.path.join(root, "shards"),
    }

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        stats.append(
            admit_batch(
                batch_df,
                paths["corpus"],
                paths["ivf"],
                paths["shards"],
                centroids,
                jaccard_threshold=jaccard_threshold,
                batch_id=int(batch_id),
            )
        )

    q = (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", 1)  # one landed file = one batch
        .parquet(src_dir)
        .writeStream.foreachBatch(_apply)
        .trigger(availableNow=True)
        .option("checkpointLocation", os.path.join(root, "_checkpoint"))
        .start()
    )
    q.awaitTermination(300)
    return stats


def seed_landing_dir(spark: SparkSession, src_dir: str, n_files: int = 3) -> None:
    """Standalone-demo seeding: land ``n_files`` parquet files of
    synthetic docs, with deliberate cross-file duplicates (each file
    repeats ids from the previous one) so the corpus-level dedup gate
    visibly rejects re-deliveries batch over batch."""
    for f in range(n_files):
        lo = f * 40  # 20-doc overlap with the previous file
        docs = spark.range(lo, lo + 60).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("src"), (F.col("id") % 3)).alias("source"),
            # per-doc distinct body: md5(id) chopped into pseudo-words
            # (so char-shingle similarity between different ids stays
            # far below the dedup threshold), plus a shared preamble
            F.concat(
                F.lit("document body number "),
                F.col("id"),
                F.lit(" "),
                F.regexp_replace(
                    F.md5(F.col("id").cast("string")), "(.{4})", "$1 "
                ),
                F.regexp_replace(
                    F.sha2(F.col("id").cast("string"), 256), "(.{5})", "$1 "
                ),
            ).alias("text"),
        )
        docs.coalesce(1).write.mode("append").parquet(src_dir)


def main() -> None:
    from data_lakehouse_project_spark import get_spark

    src = sys.argv[1] if len(sys.argv) > 1 else "/tmp/curation_stream_src"
    root = sys.argv[2] if len(sys.argv) > 2 else "/tmp/curation_stream_out"
    spark = get_spark(app_name="streaming-curation")
    if not os.path.isdir(src):
        seed_landing_dir(spark, src)
    rng = np.random.RandomState(0)
    centroids = rng.rand(4, 8)
    for s in run_admission_stream(spark, src, root, centroids):
        print(s)
    t = TxnTable(os.path.join(root, "corpus"))
    print("corpus rows:", t.read(spark).count(), "versions:", t.history())
    spark.stop()


if __name__ == "__main__":
    main()
