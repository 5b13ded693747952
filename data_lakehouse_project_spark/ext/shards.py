"""Training-shard delivery: write a curated corpus as N deterministic
shards plus a manifest the training job can trust.

The last step of a curation pipeline is handing the corpus to a trainer
that wants (a) a fixed number of roughly equal shards it can map to
data-loader workers, (b) per-shard document/token accounting, and (c) a
content checksum so a re-run (or a resumed pipeline) can be verified
byte-for-byte without re-reading the text.

Sharding is a pure function of the document id (same md5-bucket family
as ext/sampling.py): reruns, repartitions, and cluster-size changes all
produce identical shard membership — never `repartition(n)` round-robin,
which reshuffles membership on every run. One file per shard: data is
hash-repartitioned on the shard id BEFORE partitionBy, so each shard
directory receives exactly one writer task's output.

At 100 TB: the write is one shuffle on (shard_id) — the same cost as
any partitioned write — and the manifest is a second aggregation over
ids and token counts only (never text).
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from data_lakehouse_project_spark.ext.sampling import hash_bucket
from data_lakehouse_project_spark.ext.text import token_count


def id_hash60(key: Column) -> Column:
    """Engine-independent 60-bit id hash (first 15 hex chars of md5 →
    int; fits BIGINT with sign headroom). Used for manifest checksums
    so a NON-Spark verifier recomputes the identical value — the same
    portability argument as sampling.hash_bucket, never xxhash64."""
    return F.conv(F.substring(F.md5(key.cast("string")), 1, 15), 16, 10).cast(
        "long"
    )


def with_shard_id(
    df: DataFrame, id_col: str, n_shards: int
) -> DataFrame:
    """Deterministic shard assignment: md5-bucket of the id mod shards
    (engine-independent — an external reader computes the same mapping).
    """
    return df.withColumn(
        "shard_id", (hash_bucket(F.col(id_col)) % n_shards).cast("int")
    )


def write_training_shards(
    df: DataFrame,
    text_col: str,
    id_col: str,
    path: str,
    n_shards: int = 8,
) -> DataFrame:
    """Write ``path/shard_id=K/`` (one parquet file per shard) plus
    ``path/_manifest`` (parquet): per-shard docs, tokens, byte size of
    text, and an order-independent id checksum (xor of xxhash64(id) —
    commutative, so any engine reading any shard order reproduces it).

    Returns the manifest DataFrame (read back from disk, so callers see
    exactly what a verifier would).
    """
    sharded = with_shard_id(df, id_col, n_shards)
    # one shuffle on shard_id → each partitionBy directory is written by
    # exactly one task → one file per shard
    (
        sharded.repartition(n_shards, "shard_id")
        .write.mode("overwrite")
        .partitionBy("shard_id")
        .parquet(path)
    )
    # the manifest is computed from the WRITTEN files, not the input
    # lineage: with any nondeterministic upstream a lineage re-scan could
    # describe different rows than the shards it certifies, and the read
    # also avoids evaluating the input pipeline twice. (`_manifest`
    # starts with `_`, so Spark's data-file listing ignores it.)
    written = df.sparkSession.read.parquet(path)
    manifest = (
        written.select(
            "shard_id",
            id_hash60(F.col(id_col)).alias("_idh"),
            token_count(F.col(text_col)).alias("_tok"),
            F.length(F.col(text_col)).alias("_len"),
        )
        .groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_tok").alias("n_tokens"),
            F.sum("_len").alias("n_chars"),
            # bit_xor aggregate: order-independent id fingerprint with
            # true partial aggregation (no per-group list materializes)
            F.expr("bit_xor(_idh)").alias("id_checksum"),
        )
    )
    manifest.repartition(1).write.mode("overwrite").parquet(
        os.path.join(path, "_manifest")
    )
    return df.sparkSession.read.parquet(os.path.join(path, "_manifest"))


def verify_shards(
    spark: SparkSession, path: str, id_col: str = "doc_id"
) -> DataFrame:
    """Recompute per-shard doc counts + id checksums from the shard data
    and join against the manifest: one row per shard with ok = counts
    AND checksum match. The verification never touches text columns
    (column pruning keeps the scan to ids)."""
    data = spark.read.parquet(path)
    actual = (
        data.select(
            "shard_id",
            id_hash60(F.col(id_col)).alias("_idh"),
        )
        .groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("actual_docs"),
            F.expr("bit_xor(_idh)").alias("actual_checksum"),
        )
    )
    manifest = spark.read.parquet(os.path.join(path, "_manifest"))
    return (
        manifest.join(actual, "shard_id", "full")
        .select(
            "shard_id",
            "n_docs",
            "actual_docs",
            # coalesce(False): a shard present on only one side of the
            # full-outer join would otherwise null-propagate to ok=NULL,
            # silently passing callers that filter WHERE NOT ok
            F.coalesce(
                (F.col("n_docs") == F.col("actual_docs"))
                & (F.col("id_checksum") == F.col("actual_checksum")),
                F.lit(False),
            ).alias("ok"),
        )
    )
