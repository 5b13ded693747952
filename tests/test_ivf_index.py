"""Persisted IVF index: partition-pruned probes (ext/ivf.py)."""



def test_ivf_index_persists_and_prunes(spark, testdata, tmp_path):
    """The persisted-index deployment shape: write partitioned by
    list_id, probe with partition pruning (PartitionFilters reaches the
    FileScan; only nprobe/k of the partitions are read), results match
    the in-memory ivf_topk exactly."""
    from pyspark.sql import functions as F

    from data_lakehouse_project_spark.ext.ivf import (
        ivf_topk,
        probe_ivf_index,
        write_ivf_index,
    )

    emb = testdata["embeddings"].where(F.col("vec_id") != 0)
    row = testdata["embeddings"].where(F.col("vec_id") == 0).first()
    q = [float(x) for x in row.embedding]
    path = str(tmp_path / "ivf_index")

    cents = write_ivf_index(emb, "embedding", path, n_clusters=8)
    probed = probe_ivf_index(
        spark, path, "embedding", "vec_id", q, cents, k=10, nprobe=4
    )
    plan = probed._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    assert "list_id" in plan.split("PartitionFilters")[1][:200]

    in_memory = ivf_topk(
        emb, "embedding", "vec_id", q, k=10, n_clusters=8, nprobe=4,
        centroids=cents,
    )
    assert [(r.vec_id, r.score) for r in probed.collect()] == [
        (r.vec_id, r.score) for r in in_memory.collect()
    ]


def test_append_to_ivf_index_probe_finds_new_vectors(spark, testdata, tmp_path):
    """Appended vectors are probe-visible without a rebuild, old rows
    survive, and membership stays governed by the frozen centroids."""
    import numpy as np
    from pyspark.sql import functions as F

    from data_lakehouse_project_spark.ext import ivf

    emb = testdata["embeddings"]
    base = emb.where(F.col("vec_id") < 400)
    late = emb.where(F.col("vec_id") >= 400)
    path = str(tmp_path / "ivf_grow")
    cents = ivf.write_ivf_index(base, "embedding", path, n_clusters=8)
    n_before = spark.read.parquet(path).count()

    ivf.append_to_ivf_index(late, "embedding", path, cents)
    after = spark.read.parquet(path)
    assert after.count() == n_before + late.count() == emb.count()

    # a late vector must be its own top-1 at full probe (exact regime)
    row = emb.where(F.col("vec_id") == 450).first()
    q = [float(x) for x in row.embedding]
    top = ivf.probe_ivf_index(
        spark, path, "embedding", "vec_id", q, cents, k=1, nprobe=8
    ).first()
    assert top.vec_id == 450
    # appended rows landed in centroid-consistent partitions
    got = {r.list_id for r in after.select("list_id").distinct().collect()}
    assert got <= set(range(8))
