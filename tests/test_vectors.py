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
