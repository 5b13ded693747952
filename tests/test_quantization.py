"""Int8 embedding quantization (ext/vectors.py): error bounds and
ANN recall on dequantized vectors."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from data_lakehouse_project_spark.ext.similarity import ann_batch_topk
from data_lakehouse_project_spark.ext.vectors import (
    quantization_report,
    quantize_int8,
)


def _emb(spark, testdata):
    return testdata["embeddings"]


def test_quantization_error_bounded_by_half_scale(spark, testdata):
    rep = quantization_report(_emb(spark, testdata), "embedding", "vec_id")
    # symmetric rounding: |err| <= scale/2 (+1e-9 rounding slack)
    bad = rep.where(
        F.col("max_abs_err") > F.col("scale") / 2 + 1e-9
    ).count()
    assert bad == 0


def test_quantized_ann_recall(spark, testdata):
    emb = _emb(spark, testdata)
    scale, q = quantize_int8(F.col("embedding"))
    deq = emb.select(
        "vec_id",
        F.zip_with(
            q, F.array_repeat(scale, F.size("embedding")), lambda a, s: a * s
        ).alias("embedding"),
    )
    queries = [
        (int(r.vec_id), [float(x) for x in r.embedding])
        for r in emb.where(F.col("vec_id") < 4)
        .select("vec_id", "embedding")
        .collect()
    ]
    exact = {
        (r.query_id, r.vec_id)
        for r in ann_batch_topk(emb, "embedding", "vec_id", queries, k=10).collect()
    }
    quant = {
        (r.query_id, r.vec_id)
        for r in ann_batch_topk(deq, "embedding", "vec_id", queries, k=10).collect()
    }
    recall = len(exact & quant) / len(exact)
    assert recall >= 0.9, recall


def test_quantize_codes_fit_int8(spark, testdata):
    _, q = quantize_int8(F.col("embedding"))
    mn, mx = (
        _emb(spark, testdata)
        .select(F.explode(q).alias("c"))
        .agg(F.min("c"), F.max("c"))
        .first()
    )
    assert -127 <= mn and mx <= 127
