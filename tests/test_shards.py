"""Training-shard delivery (ext/shards.py): deterministic membership,
one file per shard, manifest accounting, checksum verification."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from data_lakehouse_project_spark.ext.shards import (
    verify_shards,
    with_shard_id,
    write_training_shards,
)


def _docs(spark, n=400):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("doc text number "), F.col("id").cast("string")).alias(
            "text"
        ),
    )


def test_shard_assignment_deterministic_and_total(spark):
    df = _docs(spark)
    a = {r.doc_id: r.shard_id for r in with_shard_id(df, "doc_id", 8).collect()}
    b = {
        r.doc_id: r.shard_id
        for r in with_shard_id(df.repartition(13), "doc_id", 8).collect()
    }
    assert a == b  # partitioning-independent
    assert set(a.values()) <= set(range(8))


def test_write_shards_one_file_each_and_manifest(spark, tmp_path):
    df = _docs(spark)
    path = str(tmp_path / "shards")
    manifest = write_training_shards(df, "text", "doc_id", path, n_shards=4)
    rows = {r.shard_id: r for r in manifest.collect()}
    assert set(rows) == set(range(4))
    assert sum(r.n_docs for r in rows.values()) == 400
    assert all(r.n_tokens >= r.n_docs for r in rows.values())
    for k in range(4):
        files = glob.glob(os.path.join(path, f"shard_id={k}", "*.parquet"))
        assert len(files) == 1, f"shard {k}: {files}"
    # round trip: shards reconstruct the corpus exactly
    back = spark.read.parquet(path)
    assert back.count() == 400
    assert back.select("doc_id").exceptAll(df.select("doc_id")).count() == 0


def test_verify_shards_catches_tampering(spark, tmp_path):
    df = _docs(spark, 200)
    path = str(tmp_path / "shards_v")
    write_training_shards(df, "text", "doc_id", path, n_shards=3)
    ok = verify_shards(spark, path)
    assert all(r.ok for r in ok.collect())

    # tamper: drop one shard's data files entirely
    victim = glob.glob(os.path.join(path, "shard_id=0", "*.parquet"))
    for f in victim:
        os.remove(f)
    after = {r.shard_id: r.ok for r in verify_shards(spark, path).collect()}
    assert after[0] is False  # missing shard verifies as FAILED, not NULL
    assert after[1] and after[2]  # untouched shards still verify
