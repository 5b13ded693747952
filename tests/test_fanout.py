"""fan_out_input (ext/skew.py): the guide-§2.5 input-skew fix applied
ahead of per-row-heavy operators (r12 optimization round).

Pins the three properties the optimization relies on:
- single-split inputs fan out to the session's parallelism;
- already-parallel inputs are untouched (the at-scale no-op);
- results of the operators that adopted it are bit-identical and
  deterministic across repeated runs (the hash repartition has one
  upstream map task, so per-partition row order is stable).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_lakehouse_project_spark.ext.skew import fan_out_input


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_fans_out_single_partition(spark):
    df = spark.range(1000).coalesce(1).withColumn("k", F.col("id") % 7)
    assert df.rdd.getNumPartitions() == 1
    out = fan_out_input(df, "id")
    assert out.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    assert _rows(out) == _rows(df)


def test_noop_when_already_parallel(spark):
    par = spark.sparkContext.defaultParallelism
    df = spark.range(1000).repartition(par)
    out = fan_out_input(df, "id")
    # gate: n * 4 > par means no extra exchange is added
    assert out is df


def test_operator_results_unchanged_and_deterministic(spark):
    from data_lakehouse_project_spark.ext.text import text_stats

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma doc {i} the and of word{i % 5}")
         for i in range(200)],
        "doc_id long, text string",
    ).coalesce(1)
    fanned = text_stats(docs, "text", "doc_id")
    run1, run2 = _rows(fanned), _rows(fanned)
    assert run1 == run2
    # compare against the operator applied to an already-parallel input
    # (fan-out gated off) — identical rows either way
    par = spark.sparkContext.defaultParallelism
    plain = text_stats(docs.repartition(par, "doc_id"), "text", "doc_id")
    assert run1 == _rows(plain)


def test_load_testdata_reader_cache(spark, tmp_path):
    """r12: load_testdata caches the ANALYZED reader per (session, path,
    mtime, size) — plan objects only, never data — and a rewrite of the
    file invalidates the entry."""
    import os
    import shutil

    from data_lakehouse_project_spark.sources.readers import load_testdata

    d = str(tmp_path / "sf")
    os.makedirs(d)
    spark.range(5).selectExpr("id AS n_nationkey").toPandas().to_parquet(
        os.path.join(d, "nation.parquet")
    )
    a = load_testdata(spark, d, names=("nation",))["nation"]
    b = load_testdata(spark, d, names=("nation",))["nation"]
    assert a is b  # cache hit: same analyzed plan object
    assert a.count() == 5
    # rewrite -> different (mtime, size) -> fresh reader sees new data
    spark.range(7).selectExpr("id AS n_nationkey").toPandas().to_parquet(
        os.path.join(d, "nation.parquet")
    )
    c = load_testdata(spark, d, names=("nation",))["nation"]
    assert c is not a
    assert c.count() == 7
    shutil.rmtree(d)


def test_lit_double_array_bit_identical(spark):
    """r12: lit_double_array (one parsed expr instead of one py4j round
    trip per element) must produce bit-identical doubles to the F.lit
    path, including subnormals/extremes — plan-build time is the only
    thing allowed to change."""
    import random
    import struct

    from data_lakehouse_project_spark.functions.scalar import (
        lit_double_array,
    )

    rng = random.Random(7)
    vals = (
        [rng.gauss(0, 1) for _ in range(64)]
        + [rng.uniform(-1e308, 1e308) for _ in range(16)]
        + [5e-324, -5e-324, 1.7976931348623157e308, 0.0, -0.0, 1e-309]
    )
    df = spark.range(1).select(
        lit_double_array(vals).alias("a"),
        F.array(*[F.lit(float(v)) for v in vals]).alias("b"),
    )
    row = df.first()
    got = [struct.pack("<d", v) for v in row["a"]]
    want = [struct.pack("<d", v) for v in row["b"]]
    assert got == want


def test_dup_window_spans_unchanged(spark):
    from data_lakehouse_project_spark.ext.dedup import (
        duplicated_window_spans,
    )

    boiler = "one two three four five six seven eight"
    docs = spark.createDataFrame(
        [(i, f"{boiler} unique tail {i} word{i}") for i in range(40)],
        "doc_id long, text string",
    ).coalesce(1)
    got = duplicated_window_spans(docs, "text", "doc_id", window=8)
    par = spark.sparkContext.defaultParallelism
    ref = duplicated_window_spans(
        docs.repartition(par, "doc_id"), "text", "doc_id", window=8
    )
    assert _rows(got) == _rows(ref)
    assert got.count() == 40  # every doc shares the 8-token boilerplate
