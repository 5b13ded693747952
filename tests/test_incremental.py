"""Incremental materialized-view maintenance (operators/incremental.py):
delta application ≡ full recompute, idempotence at head, group
disappearance, crash-consistent source_version bookkeeping."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_lakehouse_project_spark.operators.incremental import (
    read_aggregate_view,
    refresh_aggregate_view,
)
from data_lakehouse_project_spark.operators.txnlog import TxnTable


def _df(spark, lo, hi, tag_mod=3):
    return spark.range(lo, hi).select(
        F.col("id"),
        (F.col("id") % tag_mod).cast("string").alias("tag"),
        (F.col("id") * 2.0).alias("v"),
    )


def _expected(base, spark):
    return {
        r.tag: (r.cnt, r.v_sum)
        for r in base.read(spark)
        .groupBy("tag")
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("v").alias("v_sum"))
        .collect()
    }


def _got(view, spark):
    return {
        r.tag: (r.cnt, r.v_sum) for r in view.read(spark).collect()
    }


def test_incremental_refresh_matches_full_recompute(spark, tmp_path):
    base = TxnTable(str(tmp_path / "base"))
    view = TxnTable(str(tmp_path / "view"))
    base.write(_df(spark, 0, 50), mode="overwrite")

    v = refresh_aggregate_view(
        spark, base, view, ["tag"], {"v_sum": "v"}
    )
    assert v == 0
    assert _got(view, spark) == _expected(base, spark)

    # churn: append new rows, merge-update some, delete others
    base.write(_df(spark, 50, 70), mode="append")
    src = spark.createDataFrame(
        [(5, "2", 999.0), (100, "0", 1.5)], "id long, tag string, v double"
    )
    base.merge(src, keys=["id"])
    base.delete_where(spark, "id >= 60 AND id < 65")

    v2 = refresh_aggregate_view(
        spark, base, view, ["tag"], {"v_sum": "v"}
    )
    assert v2 == base.latest_version()
    assert _got(view, spark) == _expected(base, spark)

    # the view commit records which base version it reflects
    assert view.history()[-1]["source_version"] == v2

    # idempotent at head: no base churn -> no new view commit
    before = view.latest_version()
    assert refresh_aggregate_view(
        spark, base, view, ["tag"], {"v_sum": "v"}
    ) == v2
    assert view.latest_version() == before


def test_group_disappears_when_last_member_deleted(spark, tmp_path):
    base = TxnTable(str(tmp_path / "base"))
    view = TxnTable(str(tmp_path / "view"))
    base.write(_df(spark, 0, 9, tag_mod=3), mode="overwrite")
    refresh_aggregate_view(spark, base, view, ["tag"], {"v_sum": "v"})
    assert set(_got(view, spark)) == {"0", "1", "2"}

    base.delete_where(spark, "tag = '1'")
    refresh_aggregate_view(spark, base, view, ["tag"], {"v_sum": "v"})
    got = _got(view, spark)
    assert set(got) == {"0", "2"}
    assert got == _expected(base, spark)


def test_derived_average_at_read_time(spark, tmp_path):
    base = TxnTable(str(tmp_path / "base"))
    view = TxnTable(str(tmp_path / "view"))
    base.write(_df(spark, 0, 12, tag_mod=2), mode="overwrite")
    refresh_aggregate_view(spark, base, view, ["tag"], {"v_sum": "v"})

    got = {
        r.tag: r.v_avg
        for r in read_aggregate_view(
            spark, view, avg_of={"v_avg": "v_sum"}
        ).collect()
    }
    want = {
        r.tag: r.a
        for r in base.read(spark)
        .groupBy("tag")
        .agg(F.avg("v").alias("a"))
        .collect()
    }
    assert got == want


def test_streaming_ingest_keeps_view_current(spark, tmp_path):
    """Streaming composition: each micro-batch appends to the delta-lite
    base (one atomic commit) and then refreshes the aggregate view from
    the CDF — after the stream drains, the view equals a full recompute
    and reflects the base's latest version."""
    src = str(tmp_path / "stream_src")
    base = TxnTable(str(tmp_path / "base"))
    view = TxnTable(str(tmp_path / "view"))

    _df(spark, 0, 30).write.mode("overwrite").parquet(src)
    _df(spark, 30, 55).write.mode("append").parquet(src)

    def _apply(batch_df, _batch_id):
        base.write(batch_df, mode="append")
        refresh_aggregate_view(
            spark, base, view, ["tag"], {"v_sum": "v"}
        )

    q = (
        spark.readStream.schema("id long, tag string, v double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(_apply)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(180)

    assert base.latest_version() >= 1  # several micro-batch commits
    assert view.history()[-1]["source_version"] == base.latest_version()
    assert _got(view, spark) == _expected(base, spark)


def test_min_max_maintenance_append_fast_path_and_fallback(spark, tmp_path):
    """min/max views: appends merge via greatest/least (delta path);
    a delete that retires the current maximum forces the documented
    full-recompute fallback and still lands the right answer."""
    base = TxnTable(str(tmp_path / "base"))
    view = TxnTable(str(tmp_path / "view"))
    base.write(_df(spark, 0, 20, tag_mod=2), mode="overwrite")

    kw = dict(
        group_cols=["tag"],
        sum_cols={"v_sum": "v"},
        max_cols={"v_max": "v"},
        min_cols={"v_min": "v"},
    )
    refresh_aggregate_view(spark, base, view, **kw)

    def want():
        return {
            r.tag: (r.cnt, r.v_sum, r.v_max, r.v_min)
            for r in base.read(spark)
            .groupBy("tag")
            .agg(
                F.count(F.lit(1)).alias("cnt"),
                F.sum("v").alias("v_sum"),
                F.max("v").alias("v_max"),
                F.min("v").alias("v_min"),
            )
            .collect()
        }

    def got():
        return {
            r.tag: (r.cnt, r.v_sum, r.v_max, r.v_min)
            for r in view.read(spark).collect()
        }

    # append-only churn: new global max arrives -> delta path suffices
    base.write(_df(spark, 20, 30, tag_mod=2), mode="append")
    refresh_aggregate_view(spark, base, view, **kw)
    assert got() == want()

    # delete the current maxima -> runner-up must surface (full path)
    base.delete_where(spark, "id >= 24")
    refresh_aggregate_view(spark, base, view, **kw)
    assert got() == want()

    # and sums stay correct through both paths
    base.write(_df(spark, 100, 105, tag_mod=2), mode="append")
    refresh_aggregate_view(spark, base, view, **kw)
    assert got() == want()
