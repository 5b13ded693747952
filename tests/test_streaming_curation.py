"""End-to-end streaming curation admission (verdict r3 item 5):
foreachBatch incremental dedup + delta-lite corpus append + IVF
admission + verified shard delivery, across two micro-batches."""

from __future__ import annotations

import os
import sys

import numpy as np
from pyspark.sql import functions as F

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "examples")
)

DOCS_B1 = [
    # quality gate needs some length + stopwords; these pass
    (1, "web", "the quick brown fox jumps over the lazy dog and then "
               "the fox runs away into the deep green forest tonight"),
    (2, "web", "a completely different document about the weather in "
               "the mountains where the snow falls on the quiet peaks"),
    (3, "wiki", "an article that describes the history of the old town "
                "and the people who lived there for many long years"),
    # exact in-batch duplicate of doc 1 → collapsed before admission
    (4, "web", "the quick brown fox jumps over the lazy dog and then "
               "the fox runs away into the deep green forest tonight"),
    # junk: too short + no stopwords → quality-gated out
    (5, "spam", "zzzz!!!"),
]

DOCS_B2 = [
    # exact duplicate of admitted doc 1 → rejected by corpus dedup
    (10, "mirror", "the quick brown fox jumps over the lazy dog and then "
                   "the fox runs away into the deep green forest tonight"),
    # near duplicate of doc 2 (one word changed) → rejected as 'near'
    (11, "mirror", "a completely different document about the weather in "
                   "the mountains where the rain falls on the quiet peaks"),
    # genuinely novel → admitted
    (12, "web", "this final story tells about a ship that sails across "
                "the wide blue sea while the wind sings in the sails"),
]


def _land(spark, src, rows, name):
    """Land one flat parquet file in src (the stream source doesn't
    recurse into nested dataset directories)."""
    import glob
    import shutil
    import tempfile

    tmp = tempfile.mkdtemp()
    spark.createDataFrame(rows, "doc_id long, source string, text string") \
        .coalesce(1).write.mode("overwrite").parquet(tmp)
    (part,) = glob.glob(os.path.join(tmp, "part-*.parquet"))
    shutil.move(part, os.path.join(src, name))
    shutil.rmtree(tmp, ignore_errors=True)


def test_two_batch_admission_end_to_end(spark, tmp_path):
    from streaming_curation_admission import (
        TxnTable,
        run_admission_stream,
        verify_shards,
    )

    src = str(tmp_path / "src")
    root = str(tmp_path / "out")
    os.makedirs(src)
    centroids = np.random.RandomState(0).rand(4, 8)

    _land(spark, src, DOCS_B1, "batch1.parquet")
    stats1 = run_admission_stream(spark, src, root, centroids)
    # maxFilesPerTrigger=1 but the landed dir is one parquet "file set";
    # at least one batch must have run and admitted exactly docs 1,2,3
    assert sum(s["novel"] for s in stats1) == 3
    t = TxnTable(os.path.join(root, "corpus"))
    admitted1 = {r.doc_id for r in t.read(spark).collect()}
    assert admitted1 == {1, 2, 3}  # 4 = in-batch dup, 5 = quality-gated

    _land(spark, src, DOCS_B2, "batch2.parquet")
    stats2 = run_admission_stream(spark, src, root, centroids)
    assert sum(s["novel"] for s in stats2) == 1  # only doc 12
    admitted2 = {r.doc_id for r in t.read(spark).collect()}
    assert admitted2 == {1, 2, 3, 12}

    # ACID: each admitting batch is one append version; batch 1's state
    # is still time-travelable
    ops = [h["operation"] for h in t.history()]
    assert ops == ["append", "append"]
    assert {r.doc_id for r in t.read(spark, version=0).collect()} == {1, 2, 3}

    # IVF admission: the index holds exactly the admitted vectors
    ivf = spark.read.parquet(os.path.join(root, "ivf_index"))
    assert {r.vec_id for r in ivf.select(
        F.col("doc_id").alias("vec_id")).collect()} == {1, 2, 3, 12}

    # shard manifest verifies after the final batch
    ver = verify_shards(spark, os.path.join(root, "shards"))
    rows = ver.collect()
    assert rows and all(r.ok for r in rows)
    # and the shards contain the full corpus
    shard_ids = {r.doc_id for r in spark.read.parquet(
        os.path.join(root, "shards")).select("doc_id").collect()}
    assert shard_ids == {1, 2, 3, 12}


def test_redelivery_is_idempotent(spark, tmp_path):
    """At-least-once delivery: replaying an already-admitted batch (new
    checkpoint, same files) admits nothing and changes no state."""
    from streaming_curation_admission import TxnTable, run_admission_stream

    src = str(tmp_path / "src")
    root = str(tmp_path / "out")
    os.makedirs(src)
    centroids = np.random.RandomState(0).rand(4, 8)

    _land(spark, src, DOCS_B1, "batch1.parquet")
    run_admission_stream(spark, src, root, centroids)
    t = TxnTable(os.path.join(root, "corpus"))
    v_before = t.latest_version()

    # wipe the checkpoint → the stream re-reads the same source files
    import shutil

    shutil.rmtree(os.path.join(root, "_checkpoint"))
    stats = run_admission_stream(spark, src, root, centroids)
    assert sum(s["novel"] for s in stats) == 0
    assert t.latest_version() == v_before  # no new commit, no new shards
    assert {r.doc_id for r in t.read(spark).collect()} == {1, 2, 3}


def test_indexed_report_equals_recompute(spark):
    """The persisted-index probe is semantics-identical to the
    recompute-from-text wrapper (same verdicts row for row)."""
    from data_lakehouse_project_spark.ext.dedup import (
        build_dedup_index,
        incremental_dedup_report,
        incremental_dedup_report_indexed,
    )

    old = spark.createDataFrame(
        [(i, s) for i, s in enumerate([
            "the quick brown fox jumps over the lazy dog tonight",
            "a completely different story about mountain weather",
            "yet another corpus document with plenty of words here",
        ])],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            (10, "the quick brown fox jumps over the lazy dog tonight"),
            (11, "the quick brown fox jumps over the lazy cat tonight"),
            (12, "something entirely novel that matches no corpus doc"),
        ],
        "doc_id long, text string",
    )
    direct = incremental_dedup_report(
        old, new, "text", "doc_id", jaccard_threshold=0.6
    )
    fp, sh = build_dedup_index(old, "text", "doc_id")
    probed = incremental_dedup_report_indexed(
        fp, sh, new, "text", "doc_id", jaccard_threshold=0.6
    )
    as_rows = lambda df: sorted(map(tuple, df.collect()))
    assert as_rows(direct) == as_rows(probed)
    kinds = {r.doc_id: r.kind for r in probed.collect()}
    assert kinds == {10: "exact", 11: "near", 12: "unique"}


def test_indexed_report_with_bloom_gate_identical(spark):
    """The Bloom-gated exact branch must give the SAME verdicts as the
    ungated probe (no false negatives ⇒ no lost exact matches), while a
    definitively-new batch sends zero rows into the fp-index join."""
    from data_lakehouse_project_spark.ext.bloom import bloom_build
    from data_lakehouse_project_spark.ext.dedup import (
        build_dedup_index,
        incremental_dedup_report_indexed,
        normalize_text,
    )

    bits, k = 1 << 16, 5
    old = spark.createDataFrame(
        [(i, s) for i, s in enumerate([
            "the quick brown fox jumps over the lazy dog tonight",
            "a completely different story about mountain weather",
            "yet another corpus document with plenty of words here",
        ])],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            (10, "the quick brown fox jumps over the lazy dog tonight"),
            (11, "the quick brown fox jumps over the lazy cat tonight"),
            (12, "something entirely novel that matches no corpus doc"),
        ],
        "doc_id long, text string",
    )
    fp, sh = build_dedup_index(old, "text", "doc_id")
    bloom = bloom_build(fp.select("fp"), "fp", bits, k)

    ungated = incremental_dedup_report_indexed(
        fp, sh, new, "text", "doc_id", jaccard_threshold=0.6
    )
    gated = incremental_dedup_report_indexed(
        fp, sh, new, "text", "doc_id", jaccard_threshold=0.6,
        bloom=bloom, bloom_bits=bits, bloom_hashes=k,
    )
    as_rows = lambda df: sorted(map(tuple, df.collect()))
    assert as_rows(ungated) == as_rows(gated)
