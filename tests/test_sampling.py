"""Deterministic hash sampling invariants (ext/sampling.py) — the
properties that make it training-pipeline-grade, none of which hold for
seed-based random sampling:

- determinism across reruns AND partitionings
- rate monotonicity: the 1% sample is a subset of the 2% sample
- train/eval split partitions the data with no overlap
- stratified rates land near their targets per stratum
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_lakehouse_project_spark.ext.sampling import (
    hash_bucket,
    hash_sample,
    split_column,
    stratified_hash_sample,
)


def _docs(spark, n=2000):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("src"), (F.col("id") % 4)).alias("source"),
    )


def test_sample_deterministic_and_partition_independent(spark):
    df = _docs(spark)
    a = {r.doc_id for r in hash_sample(df.repartition(1), "doc_id", 0.3).collect()}
    b = {r.doc_id for r in hash_sample(df.repartition(13), "doc_id", 0.3).collect()}
    assert a == b and 0.2 < len(a) / 2000 < 0.4


def test_rate_monotone_subset(spark):
    df = _docs(spark)
    s1 = {r.doc_id for r in hash_sample(df, "doc_id", 0.1).collect()}
    s2 = {r.doc_id for r in hash_sample(df, "doc_id", 0.2).collect()}
    assert s1 < s2  # strictly grows, never swaps members


def test_train_eval_split_is_a_partition(spark):
    df = _docs(spark).withColumn("split", split_column(F.col("doc_id"), 0.25))
    counts = dict(df.groupBy("split").count().collect())
    assert set(counts) == {"train", "eval"}
    assert counts["train"] + counts["eval"] == 2000
    assert 0.15 < counts["eval"] / 2000 < 0.35


def test_stratified_rates_apply_per_stratum(spark):
    df = _docs(spark)
    out = stratified_hash_sample(
        df, "doc_id", "source", rates={"src0": 1.0, "src1": 0.0}, default_rate=0.5
    )
    got = dict(out.groupBy("source").count().collect())
    assert got["src0"] == 500  # 100% kept
    assert "src1" not in got  # 0% kept
    for s in ("src2", "src3"):
        assert 0.3 < got[s] / 500 < 0.7


def test_bucket_range(spark):
    df = _docs(spark, 500).select(hash_bucket(F.col("doc_id")).alias("b"))
    mn, mx = df.agg(F.min("b"), F.max("b")).first()
    assert 0 <= mn and mx < 10_000
