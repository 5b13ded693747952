"""Vector-column analytics (ext/vectors.py)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from data_lakehouse_project_spark.ext.vectors import l2_normalize, label_centroids


def test_l2_normalize(spark):
    df = spark.createDataFrame([(1, [3.0, 4.0])], "id long, v array<float>")
    out = df.select(l2_normalize(F.col("v")).alias("n")).collect()[0].n
    assert out == [0.6, 0.8]


def test_label_centroids_match_numpy(spark):
    rows = [
        (0, [1.0, 2.0, 3.0]),
        (0, [3.0, 2.0, 1.0]),
        (1, [10.0, 0.0, -10.0]),
    ]
    df = spark.createDataFrame(rows, "label int, embedding array<float>")
    got = {r.label: r.centroid for r in label_centroids(df, "embedding", "label").collect()}
    assert got[0] == [2.0, 2.0, 2.0]
    assert got[1] == [10.0, 0.0, -10.0]


def test_label_centroids_on_testdata(spark, testdata):
    emb = testdata["embeddings"]
    out = label_centroids(emb, "embedding", "label")
    rows = out.collect()
    labels = {r.label for r in rows}
    assert labels == {r.label for r in emb.select("label").distinct().collect()}
    assert all(len(r.centroid) == 64 for r in rows)
    # spot-check one label against numpy
    lab = rows[0].label
    vecs = np.array(
        [r.embedding for r in emb.where(F.col("label") == lab).collect()],
        dtype=np.float64,
    )
    want = vecs.mean(axis=0)
    got = np.array(rows[0].centroid)
    assert np.allclose(got, want, atol=1e-6)


def test_hashed_tf_components_unit_norm_and_dup_detection(spark):
    """The text→vector bridge: per-doc norms are 1; exact-duplicate
    texts produce identical sparse vectors (cosine 1 via the sparse
    inverted-index dot product), unrelated texts don't collide."""
    from pyspark.sql import functions as F

    from data_lakehouse_project_spark.ext.vectors import hashed_tf_components

    df = spark.createDataFrame(
        [
            (1, "spark engines process data fast"),
            (2, "spark engines process data fast"),      # exact dup of 1
            (3, "completely unrelated words entirely"),
        ],
        "doc_id long, text string",
    )
    comp = hashed_tf_components(df, "text", "doc_id", dim=32)
    norms = {
        r.doc_id: r.n
        for r in comp.groupBy("doc_id")
        .agg(F.sqrt(F.sum(F.col("v") * F.col("v"))).alias("n"))
        .collect()
    }
    assert all(abs(n - 1.0) < 1e-5 for n in norms.values())
    # sparse cosine via self-join on the component index
    a = comp.select(F.col("doc_id").alias("ia"), "i", F.col("v").alias("va"))
    b = comp.select(F.col("doc_id").alias("ib"), "i", F.col("v").alias("vb"))
    cos = {
        (r.ia, r.ib): r.c
        for r in a.join(b, "i")
        .where(F.col("ia") < F.col("ib"))
        .groupBy("ia", "ib")
        .agg(F.sum(F.col("va") * F.col("vb")).alias("c"))
        .collect()
    }
    assert abs(cos[(1, 2)] - 1.0) < 1e-5
    assert cos.get((1, 3), 0.0) < 0.3
