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
