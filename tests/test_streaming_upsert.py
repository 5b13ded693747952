"""Incremental-lakehouse streaming patterns: foreachBatch upsert and
streaming dedup within watermark."""

from __future__ import annotations

import datetime


def test_foreachbatch_incremental_upsert(spark, tmp_path):
    """The canonical incremental pipeline: stream → foreachBatch →
    MERGE into the serving table. Late re-sends of the same key update
    in place instead of duplicating."""
    from data_lakehouse_project_spark.operators.upsert import merge_into_path

    schema = "id long, v string, updated_at timestamp"
    src = str(tmp_path / "upsert_src")
    out = str(tmp_path / "serving_table")
    t0 = datetime.datetime(2024, 1, 1)

    spark.createDataFrame(
        [(1, "a", t0), (2, "b", t0)], schema
    ).write.mode("overwrite").parquet(src)

    def apply_batch(batch_df, _batch_id):
        merge_into_path(
            batch_df.sparkSession, out, batch_df, ["id"], fmt="parquet"
        )

    def run_once():
        q = (
            spark.readStream.schema(
                spark.read.parquet(src).schema
            )
            .parquet(src)
            .writeStream.foreachBatch(apply_batch)
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        q.awaitTermination(120)

    run_once()
    assert {r.id: r.v for r in spark.read.parquet(out).collect()} == {
        1: "a",
        2: "b",
    }

    # second micro-batch: id 2 updated, id 3 new
    t1 = t0 + datetime.timedelta(hours=1)
    spark.createDataFrame([(2, "B", t1), (3, "c", t1)], schema).write.mode(
        "append"
    ).parquet(src)
    run_once()
    got = {r.id: r.v for r in spark.read.parquet(out).collect()}
    assert got == {1: "a", 2: "B", 3: "c"}


def test_streaming_dedup_within_watermark(spark, tmp_path):
    """dropDuplicatesWithinWatermark: replayed event_ids inside the
    watermark horizon are emitted once."""
    schema = "event_id long, ts timestamp, value double"
    src = str(tmp_path / "dedup_src")
    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (1, t0, 1.0),
        (1, t0 + datetime.timedelta(minutes=1), 1.0),  # replay of id 1
        (2, t0 + datetime.timedelta(minutes=2), 2.0),
        (2, t0 + datetime.timedelta(minutes=2), 2.0),  # exact dup
        (3, t0 + datetime.timedelta(minutes=3), 3.0),
    ]
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(
        spark.read.parquet(src).schema
    ).parquet(src)
    deduped = stream.withWatermark("ts", "1 hour").dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "dedup_ckpt"))
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT event_id FROM dedup_stream").collect()
    assert sorted(r.event_id for r in got) == [1, 2, 3]


def test_foreachbatch_incremental_dedup_admission(spark, tmp_path):
    """Streaming corpus admission: each arriving micro-batch of documents
    is adjudicated against the accumulated corpus with
    incremental_dedup_report inside foreachBatch; only 'unique' docs are
    admitted, so the corpus never accumulates duplicates and a doc
    re-sent in a later batch is rejected against the earlier copy."""
    from data_lakehouse_project_spark.ext.dedup import (
        incremental_dedup_report,
    )

    schema = "doc_id long, text string"
    src = str(tmp_path / "docs_src")
    corpus = str(tmp_path / "corpus")

    spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "epsilon zeta eta theta")], schema
    ).write.mode("overwrite").parquet(corpus)

    def admit(batch_df, _bid):
        s = batch_df.sparkSession
        old = s.read.parquet(corpus)
        verdicts = incremental_dedup_report(
            old, batch_df, "text", "doc_id", jaccard_threshold=0.8
        )
        unique_ids = [
            r.doc_id for r in verdicts.where("kind = 'unique'").collect()
        ]
        batch_df.where(
            batch_df.doc_id.isin(unique_ids) if unique_ids else "false"
        ).write.mode("append").parquet(corpus)

    def run_once():
        q = (
            spark.readStream.schema(spark.read.parquet(src).schema)
            .parquet(src)
            .writeStream.foreachBatch(admit)
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "adm_ckpt"))
            .start()
        )
        q.awaitTermination(120)

    # batch 1: one exact dup of corpus doc 1, one novel doc
    spark.createDataFrame(
        [(10, "ALPHA beta gamma delta"), (11, "iota kappa lambda mu")],
        schema,
    ).write.mode("overwrite").parquet(src)
    run_once()
    ids = {r.doc_id for r in spark.read.parquet(corpus).collect()}
    assert ids == {1, 2, 11}

    # batch 2: re-send of 11 (now in corpus) + novel doc
    spark.createDataFrame(
        [(20, "iota kappa lambda mu"), (21, "nu xi omicron pi")], schema
    ).write.mode("append").parquet(src)
    run_once()
    ids = {r.doc_id for r in spark.read.parquet(corpus).collect()}
    assert ids == {1, 2, 11, 21}


def test_foreachbatch_streaming_ivf_admission(spark, tmp_path, testdata):
    """Growing-corpus ANN in streaming form: arriving embedding
    micro-batches are admitted into the persisted IVF index via
    foreachBatch + append_to_ivf_index (frozen centroids, no rebuild);
    after the stream drains, a probe finds a streamed-in vector."""
    from pyspark.sql import functions as F

    from data_lakehouse_project_spark.ext import ivf

    emb = testdata["embeddings"]
    base = emb.where(F.col("vec_id") < 400)
    late = emb.where(F.col("vec_id") >= 400)

    index_path = str(tmp_path / "ivf_stream")
    cents = ivf.write_ivf_index(base, "embedding", index_path, n_clusters=8)

    src = str(tmp_path / "arrivals")
    late.write.mode("overwrite").parquet(src)

    def admit(batch_df, _batch_id):
        ivf.append_to_ivf_index(batch_df, "embedding", index_path, cents)

    q = (
        spark.readStream.schema(late.schema)
        .parquet(src)
        .writeStream.foreachBatch(admit)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ivf_ckpt"))
        .start()
    )
    q.awaitTermination(120)

    idx = spark.read.parquet(index_path)
    assert idx.count() == emb.count()
    probe_vec = [float(x) for x in emb.where(F.col("vec_id") == 470).first().embedding]
    top = ivf.probe_ivf_index(
        spark, index_path, "embedding", "vec_id", probe_vec, cents,
        k=1, nprobe=8,
    ).first()
    assert top.vec_id == 470


def test_streaming_append_exactly_once_through_crash_replay(
    spark, tmp_path
):
    """REAL crash-replay: the foreachBatch sink commits to the
    delta-lite table, then the stream dies BEFORE the checkpoint marks
    the batch complete (injected failure). The restarted stream replays
    that micro-batch from the checkpoint — the txn action makes the
    replay a no-op, so the table holds each row exactly once."""
    import os

    from pyspark.sql import functions as F

    from data_lakehouse_project_spark.operators.txnlog import TxnTable

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    t = TxnTable(str(tmp_path / "tbl"))
    crash_flag = str(tmp_path / "crash_once")
    open(crash_flag, "w").write("1")

    spark.range(0, 50).select(
        F.col("id"), (F.col("id") * 2).alias("v")
    ).write.mode("overwrite").parquet(src)

    inner = t.streaming_append("crash-test")

    def apply_batch(batch_df, batch_id):
        inner(batch_df, batch_id)  # commit lands in the table...
        if os.path.exists(crash_flag):
            os.remove(crash_flag)
            raise RuntimeError("injected crash AFTER table commit")

    def run_once():
        q = (
            spark.readStream.schema(spark.read.parquet(src).schema)
            .parquet(src)
            .writeStream.foreachBatch(apply_batch)
            .trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.awaitTermination(120)
        except Exception:
            pass  # the injected crash surfaces here on run 1

    run_once()  # commits batch 0, then dies pre-checkpoint
    assert t.read(spark).count() == 50

    run_once()  # restart: batch 0 REPLAYED from the checkpoint
    assert t.read(spark).count() == 50  # exactly once, no duplicates
    assert t.snapshot().txns == {"crash-test": 0}

    # new data still flows after recovery
    spark.range(50, 60).select(
        F.col("id"), (F.col("id") * 2).alias("v")
    ).write.mode("append").parquet(src)
    run_once()
    assert t.read(spark).count() == 60
