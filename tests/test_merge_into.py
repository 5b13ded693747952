"""Full-clause MERGE INTO on delta-lite (operators/txnlog.py::
TxnTable.merge_into): Delta clause semantics, file granularity,
ambiguity detection, CDF/time-travel composition."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from data_lakehouse_project_spark.operators.txnlog import TxnTable


def _mk(spark, tmp_path, partition_by=None):
    t = TxnTable(str(tmp_path / "t"))
    df = spark.createDataFrame(
        [
            (1, "a", 10.0, "p0"),
            (2, "b", 20.0, "p0"),
            (3, "c", 30.0, "p1"),
            (4, "d", 40.0, "p1"),
        ],
        "id LONG, name STRING, qty DOUBLE, part STRING",
    )
    t.write(df, mode="overwrite", partition_by=partition_by)
    return t


def _rows(t, spark):
    return {
        r["id"]: (r["name"], r["qty"], r["part"])
        for r in t.read(spark).collect()
    }


def test_all_four_clauses(spark, tmp_path):
    t = _mk(spark, tmp_path)
    src = spark.createDataFrame(
        [
            (1, "a2", 5.0, "p0"),   # matched, qty<=15 → update (add qty)
            (2, "b2", 99.0, "p0"),  # matched, qty 20 → delete clause
            (9, "new", 1.0, "p9"),  # not matched → insert
        ],
        "id LONG, name STRING, qty DOUBLE, part STRING",
    )
    v = t.merge_into(
        spark,
        src,
        ["id"],
        matched_update={"qty": "t.qty + s.qty", "name": "s.name"},
        matched_delete_condition="t.qty >= 20 AND s.qty >= 50",
        insert=True,
        not_matched_by_source_delete="t.id = 4",
    )
    assert v == 1
    got = _rows(t, spark)
    assert got[1] == ("a2", 15.0, "p0")       # updated from s
    assert 2 not in got                       # matched-delete
    assert got[3] == ("c", 30.0, "p1")        # untouched
    assert 4 not in got                       # not-matched-by-source
    assert got[9] == ("new", 1.0, "p9")       # inserted


def test_update_all_and_conditions(spark, tmp_path):
    t = _mk(spark, tmp_path)
    src = spark.createDataFrame(
        [(1, "A", 11.0, "px"), (3, "C", 33.0, "px")],
        "id LONG, name STRING, qty DOUBLE, part STRING",
    )
    t.merge_into(
        spark,
        src,
        ["id"],
        matched_update="all",
        matched_update_condition="s.qty > 20",  # only id=3 qualifies
        insert=False,
    )
    got = _rows(t, spark)
    assert got[1] == ("a", 10.0, "p0")  # condition false → untouched
    assert got[3] == ("C", 33.0, "px")  # SET * from source
    assert set(got) == {1, 2, 3, 4}


def test_file_granularity_skips_untouched_files(spark, tmp_path):
    t = _mk(spark, tmp_path, partition_by=["part"])
    before = {f["path"] for f in t.snapshot().files}
    src = spark.createDataFrame(
        [(1, "a2", 1.0, "p0")],
        "id LONG, name STRING, qty DOUBLE, part STRING",
    )
    t.merge_into(
        spark, src, ["id"], matched_update={"qty": "s.qty"}, insert=False
    )
    after = {f["path"] for f in t.snapshot().files}
    # every p1 file survives verbatim; exactly ONE file (the p0 file
    # holding id=1) was rewritten
    p1_before = {p for p in before if "part=p1" in p}
    assert p1_before and p1_before <= after
    assert len(before & after) == len(before) - 1
    assert (before - after).pop().find("part=p0") >= 0
    info = t.history()[-1]
    assert info["operation"] == "merge"
    assert info["files_rewritten"] == 1
    assert info["files_skipped"] == len(before) - 1


def test_ambiguous_source_match_raises(spark, tmp_path):
    t = _mk(spark, tmp_path)
    src = spark.createDataFrame(
        [(1, "x", 1.0, "p0"), (1, "y", 2.0, "p0")],
        "id LONG, name STRING, qty DOUBLE, part STRING",
    )
    with pytest.raises(ValueError, match="more than once"):
        t.merge_into(
            spark, src, ["id"],
            matched_update={"qty": "s.qty"}, insert=False,
        )


def test_noop_merge_commits_nothing(spark, tmp_path):
    t = _mk(spark, tmp_path)
    src = spark.createDataFrame(
        [(1, "a2", 5.0, "p0")],
        "id LONG, name STRING, qty DOUBLE, part STRING",
    )
    v0 = t.latest_version()
    v = t.merge_into(
        spark,
        src,
        ["id"],
        matched_update={"qty": "s.qty"},
        matched_update_condition="s.qty > 100",  # never true
        insert=True,
        insert_condition="s.id > 100",  # never true
    )
    assert v == v0
    assert t.latest_version() == v0


def test_merge_into_cdf_and_time_travel(spark, tmp_path):
    t = _mk(spark, tmp_path)
    src = spark.createDataFrame(
        [(1, "a2", 99.0, "p0"), (9, "new", 1.0, "p9")],
        "id LONG, name STRING, qty DOUBLE, part STRING",
    )
    t.merge_into(
        spark, src, ["id"], matched_update="all", insert=True
    )
    # pre-merge version intact
    old = {
        r["id"]: r["qty"]
        for r in t.read(spark, version=0).collect()
    }
    assert old[1] == 10.0 and 9 not in old
    # CDF: update surfaces as delete(pre) + insert(post); insert as insert
    ch = t.read_changes(spark, starting_version=1).collect()
    by = {(r["id"], r["_change_type"]) for r in ch}
    assert (1, "delete") in by and (1, "insert") in by
    assert (9, "insert") in by
    assert not any(i == 2 for i, _ in by)  # untouched rows absent


def test_multi_match_bystander_not_duplicated(spark, tmp_path):
    """A target row matched by TWO source rows, sitting in a file that
    gets rewritten only because of ANOTHER row's clause, must come out
    exactly once (regression: the join fan-out doubled it). No matched
    clause exists, so the ambiguity check does not fire — kept-row
    dedup must handle it."""
    t = TxnTable(str(tmp_path / "t"))
    t.write(
        spark.createDataFrame(
            [(1, "a"), (2, "b")], "id LONG, name STRING"
        ).coalesce(1),
        mode="overwrite",
    )
    src = spark.createDataFrame(
        [(1, "x"), (1, "y")], "id LONG, name STRING"
    )
    t.merge_into(
        spark, src, ["id"], insert=False,
        not_matched_by_source_delete=True,  # deletes id=2, hits the file
    )
    rows = sorted((r["id"], r["name"]) for r in t.read(spark).collect())
    assert rows == [(1, "a")]


def test_insert_requires_target_columns(spark, tmp_path):
    t = _mk(spark, tmp_path)
    src = spark.createDataFrame([(9, "x")], "id LONG, name STRING")
    with pytest.raises(ValueError, match="INSERT needs source columns"):
        t.merge_into(spark, src, ["id"], insert=True)


def test_streaming_merge_replay_is_noop(spark, tmp_path):
    """The foreachBatch merge sink is exactly-once: re-applying the
    same (app_id, batch_id) — the crash-replay case — changes nothing;
    the next batch_id applies."""
    t = _mk(spark, tmp_path)
    apply_batch = t.streaming_merge("cdc-app", ["id"])
    b0 = spark.createDataFrame(
        [(1, "v1", 0.0, "p0")], "id LONG, name STRING, qty DOUBLE, part STRING"
    )
    apply_batch(b0, 0)
    v_after = t.latest_version()
    assert _rows(t, spark)[1] == ("v1", 0.0, "p0")

    # replay batch 0 with DIFFERENT payload: must be ignored entirely
    b0_replay = spark.createDataFrame(
        [(1, "evil", 9.9, "p0")],
        "id LONG, name STRING, qty DOUBLE, part STRING",
    )
    apply_batch(b0_replay, 0)
    assert t.latest_version() == v_after
    assert _rows(t, spark)[1] == ("v1", 0.0, "p0")

    # the next batch applies (update + insert)
    b1 = spark.createDataFrame(
        [(1, "v2", 1.0, "p0"), (9, "new", 2.0, "p9")],
        "id LONG, name STRING, qty DOUBLE, part STRING",
    )
    apply_batch(b1, 1)
    got = _rows(t, spark)
    assert got[1] == ("v2", 1.0, "p0") and got[9] == ("new", 2.0, "p9")


def test_streaming_merge_e2e_file_stream(spark, tmp_path):
    """Real Structured Streaming run: file source → availableNow →
    foreachBatch(streaming_merge) → delta-lite serving table. Second
    trigger applies only the new files; upserts update in place."""
    src = str(tmp_path / "cdc_src")
    t = TxnTable(str(tmp_path / "serving"))
    t.write(
        spark.createDataFrame(
            [(1, "a", 10.0, "p0")],
            "id LONG, name STRING, qty DOUBLE, part STRING",
        ),
        mode="overwrite",
    )
    schema = "id LONG, name STRING, qty DOUBLE, part STRING"
    spark.createDataFrame(
        [(1, "a1", 11.0, "p0"), (2, "b", 20.0, "p0")], schema
    ).write.mode("overwrite").parquet(src)

    def run_once():
        q = (
            spark.readStream.schema(spark.read.parquet(src).schema)
            .parquet(src)
            .writeStream.foreachBatch(
                t.streaming_merge("cdc-e2e", ["id"])
            )
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        q.awaitTermination(120)

    run_once()
    assert _rows(t, spark) == {
        1: ("a1", 11.0, "p0"),
        2: ("b", 20.0, "p0"),
    }
    spark.createDataFrame(
        [(2, "B2", 22.0, "p0"), (3, "c", 30.0, "p1")], schema
    ).write.mode("append").parquet(src)
    run_once()
    assert _rows(t, spark) == {
        1: ("a1", 11.0, "p0"),
        2: ("B2", 22.0, "p0"),
        3: ("c", 30.0, "p1"),
    }
    # the txn ledger advanced with the stream's batch ids
    assert t.snapshot().txns.get("cdc-e2e") >= 1


def test_streaming_merge_empty_batch_still_records_txn(spark, tmp_path):
    """A batch that changes nothing still commits its txn action, so a
    replay of it short-circuits instead of re-running the scans."""
    t = _mk(spark, tmp_path)
    noop = spark.createDataFrame(
        [(1, "a", 10.0, "p0")], "id LONG, name STRING, qty DOUBLE, part STRING"
    )
    # matched but update condition never true, insert off → no change
    apply_batch = t.streaming_merge(
        "cdc-app", ["id"],
        matched_update={"qty": "s.qty"},
        matched_update_condition="s.qty > 1e9",
        insert=False,
    )
    v0 = t.latest_version()
    apply_batch(noop, 0)
    assert t.latest_version() == v0 + 1  # empty txn commit recorded
    assert t.snapshot().txns.get("cdc-app") == 0
    assert t.read(spark).count() == 4


def test_nondeterministic_source_is_materialized(spark, tmp_path):
    """A rand()-filtered source must behave as ONE immutable snapshot
    across the merge's internal passes: every inserted row also shows
    up exactly once, and reruns never duplicate — the source is
    checkpointed before clause evaluation (delta-spark does the same)."""
    t = _mk(spark, tmp_path)
    src = (
        spark.range(100, 140)
        .selectExpr(
            "id", "concat('n', id) AS name", "id * 1.0 AS qty",
            "'p9' AS part"
        )
        .where(F.rand(seed=None) < 0.5)  # non-deterministic row set
    )
    t.merge_into(spark, src, ["id"], matched_update="all", insert=True)
    got = t.read(spark)
    new_ids = [r["id"] for r in got.where("id >= 100").collect()]
    # whatever subset the filter picked, each id appears exactly once
    assert len(new_ids) == len(set(new_ids))
    # and the four original rows are untouched
    assert got.where("id < 100").count() == 4


def test_nmbs_falsy_values_disable_cleanly(spark, tmp_path):
    """Empty string / 0 / None for not_matched_by_source_delete mean
    OFF — no unmatched-target deletes, and results identical to
    passing False."""
    for falsy in ("", 0, None, False):
        t = _mk(spark, tmp_path / f"v{falsy!r}")
        src = spark.createDataFrame(
            [(1, "a2", 11.0, "p0")],
            "id LONG, name STRING, qty DOUBLE, part STRING",
        )
        t.merge_into(
            spark, src, ["id"],
            matched_update="all", insert=False,
            not_matched_by_source_delete=falsy,
        )
        rows = _rows(t, spark)
        assert set(rows) == {1, 2, 3, 4}  # nothing deleted
        assert rows[1] == ("a2", 11.0, "p0")
