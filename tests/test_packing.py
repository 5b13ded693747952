"""Sequence-packing invariants (ext/packing.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_lakehouse_project_spark.ext.packing import (
    pack_greedy,
    pack_sequential_chunks,
)

BUDGET = 100


def _docs(spark, n=500):
    # lengths 1..120: some docs exceed the pack budget of 100
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        ((F.col("id") * 37) % 120 + 1).alias("n_tok"),
    )


def test_greedy_packs_respect_budget(spark):
    out = pack_greedy(_docs(spark), "doc_id", "n_tok", BUDGET).cache()
    per_pack = out.groupBy("pack_id").agg(
        F.sum("length").alias("total"), F.count("*").alias("n")
    )
    # any pack over budget must be a singleton holding one oversize doc
    bad = per_pack.where(
        (F.col("total") > BUDGET) & (F.col("n") > 1)
    ).count()
    assert bad == 0
    assert out.count() == 500  # every doc packed exactly once
    assert out.select("doc_id").distinct().count() == 500


def test_greedy_deterministic_across_partitionings(spark):
    df = _docs(spark)
    a = sorted(
        map(tuple, pack_greedy(df.repartition(1), "doc_id", "n_tok", BUDGET)
            .select("doc_id", "pack_id").collect())
    )
    b = sorted(
        map(tuple, pack_greedy(df.repartition(11), "doc_id", "n_tok", BUDGET)
            .select("doc_id", "pack_id").collect())
    )
    assert a == b


def test_chunks_match_offset_recompute(spark):
    out = pack_sequential_chunks(
        _docs(spark), "doc_id", "n_tok", budget=BUDGET
    ).collect()
    # full recompute of the packing in plain python: each doc's chunk is
    # floor(start offset / budget) over the doc_id-ordered concat stream
    # (chunk ids may legitimately skip a value when an oversize doc
    # spans a whole budget window)
    start = 0
    for r in sorted(out, key=lambda r: r.doc_id):
        assert r.chunk_id == start // BUDGET, r
        start += max(r.length, 1)


def test_chunk_straddle_flag_matches_offsets(spark):
    out = pack_sequential_chunks(
        _docs(spark, 50), "doc_id", "n_tok", budget=BUDGET
    ).collect()
    # recompute straddles in plain python
    start = 0
    by_id = sorted(out, key=lambda r: r.doc_id)
    for r in by_id:
        expect = (start // BUDGET) != ((start + max(r.length, 1) - 1) // BUDGET)
        assert r.straddles == expect, r
        start += max(r.length, 1)


def test_chunk_with_overlap_windows_and_edges(spark):
    from data_lakehouse_project_spark.ext.packing import chunk_with_overlap

    df = spark.createDataFrame(
        [
            (1, " ".join(f"t{i}" for i in range(10))),  # 10 tokens
            (2, "a b c"),  # under one chunk
            (3, " ".join(f"x{i}" for i in range(8))),  # exactly 2 strides
        ],
        "doc_id long, text string",
    )
    out = chunk_with_overlap(df, "text", "doc_id", 4, overlap_tokens=2)
    got = {
        (r.doc_id, r.chunk_idx): (r.n_tokens, r.chunk_text)
        for r in out.collect()
    }
    # doc 1: stride 2 → windows at 0,2,4,6 cover all 10 tokens
    assert got[(1, 0)] == (4, "t0 t1 t2 t3")
    assert got[(1, 1)] == (4, "t2 t3 t4 t5")
    assert got[(1, 3)] == (4, "t6 t7 t8 t9")
    assert (1, 4) not in got  # no empty trailing window
    # doc 2: single chunk, remainder length
    assert got[(2, 0)] == (3, "a b c")
    assert (2, 1) not in got
    # doc 3 (8 tokens): windows 0,2,4 — last is full, no phantom
    assert got[(3, 2)] == (4, "x4 x5 x6 x7")
    assert (3, 3) not in got

    # overlap reconstruction: dropping each chunk's first `overlap`
    # tokens (except chunk 0) re-concatenates to the original doc
    parts = [got[(1, i)][1].split() for i in range(4)]
    rebuilt = parts[0] + [t for p in parts[1:] for t in p[2:]]
    assert rebuilt == [f"t{i}" for i in range(10)]

    # map-only plan: no shuffle anywhere
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_chunk_with_overlap_rejects_bad_overlap(spark):
    import pytest

    from data_lakehouse_project_spark.ext.packing import chunk_with_overlap

    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_with_overlap(df, "text", "doc_id", 4, overlap_tokens=4)
