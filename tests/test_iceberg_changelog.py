"""read_iceberg_changelog: the Iceberg CDF equivalent — delete and
overwrite snapshots emit `delete` rows reconstructed from position-
delete files / whole-file DELETED entries, appends emit `insert`
rows, replace (compaction) snapshots contribute nothing.  The
randomized harness is the Delta CDF one ported: every per-snapshot
slice must equal the snapshot reader's exceptAll diff."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_lakehouse_project_spark.operators.iceberg_export import (
    export_iceberg_metadata,
)
from data_lakehouse_project_spark.operators.iceberg_reader import (
    UnsupportedIcebergFeature,
    iceberg_snapshot_ids,
    read_iceberg_changelog,
    read_iceberg_table,
)
from data_lakehouse_project_spark.operators.iceberg_writer import (
    append_to_iceberg,
    delete_from_iceberg,
    merge_into_iceberg,
    rewrite_data_files,
    update_from_iceberg,
)
from data_lakehouse_project_spark.operators.txnlog import TxnTable


def _df(spark, lo, hi, part="a"):
    return spark.range(lo, hi).selectExpr(
        "id", f"'{part}' AS part", "CAST(id AS DOUBLE) AS v"
    )


def _table(spark, tmp_path, name="t", hi=4):
    path = str(tmp_path / name)
    t = TxnTable(path)
    t.write(_df(spark, 0, hi), mode="overwrite")
    export_iceberg_metadata(t, spark)
    return path


def _slice(spark, path, frm, to):
    return read_iceberg_changelog(
        spark, path, from_snapshot_id=frm, to_snapshot_id=to
    )


def test_changelog_over_delete_and_overwrite(spark, tmp_path):
    path = _table(spark, tmp_path)            # snap 1: ids 0..3
    delete_from_iceberg(spark, path, "id = 1")          # snap 2
    src = spark.createDataFrame(
        [(2, "a", 99.0), (10, "a", 100.0)],
        "id long, part string, v double",
    )
    merge_into_iceberg(                                  # snap 3
        spark, path, src, "t.id = s.id",
        when_matched_update={"v": "s.v"},
    )
    sids = [s for s, _ in iceberg_snapshot_ids(path)]
    assert len(sids) == 3

    # full changelog from table start
    all_ch = read_iceberg_changelog(spark, path)
    rows = sorted(
        (r._snapshot_id, r._change_type, r.id, r.v)
        for r in all_ch.collect()
    )
    assert rows == [
        (sids[0], "insert", 0, 0.0),
        (sids[0], "insert", 1, 1.0),
        (sids[0], "insert", 2, 2.0),
        (sids[0], "insert", 3, 3.0),
        (sids[1], "delete", 1, 1.0),
        (sids[2], "delete", 2, 2.0),
        (sids[2], "insert", 2, 99.0),
        (sids[2], "insert", 10, 100.0),
    ]

    # the (from, to] slice bounds work
    got = sorted(
        (r._change_type, r.id)
        for r in _slice(spark, path, sids[0], sids[1]).collect()
    )
    assert got == [("delete", 1)]


def test_changelog_skips_replace_snapshots(spark, tmp_path):
    path = _table(spark, tmp_path)
    delete_from_iceberg(spark, path, "id = 0")
    append_to_iceberg(spark, _df(spark, 4, 6), path)
    info = rewrite_data_files(spark, path)
    assert info["snapshot_id"] is not None  # compaction committed
    sids = [s for s, _ in iceberg_snapshot_ids(path)]
    ch = _slice(spark, path, sids[-2], sids[-1])
    assert ch.count() == 0  # replace contributes nothing
    # and the full changelog replays to the live state
    all_ch = read_iceberg_changelog(spark, path)
    ins = {
        (r.id, r.v)
        for r in all_ch.where("_change_type = 'insert'").collect()
    }
    dels = {
        (r.id, r.v)
        for r in all_ch.where("_change_type = 'delete'").collect()
    }
    live = {
        (r.id, r.v) for r in read_iceberg_table(spark, path).collect()
    }
    assert ins - dels == live


def test_update_emits_delete_plus_insert(spark, tmp_path):
    path = _table(spark, tmp_path)
    info = update_from_iceberg(spark, path, "id = 3", {"v": "v + 0.5"})
    got = sorted(
        (r._change_type, r.id, r.v)
        for r in _slice(
            spark, path, None, info["snapshot_id"]
        ).where(F.col("_snapshot_id") == info["snapshot_id"]).collect()
    )
    assert got == [("delete", 3, 3.0), ("insert", 3, 3.5)]


@pytest.mark.parametrize("seed", [5, 19])
def test_changelog_equals_snapshot_diff_randomized(
    spark, tmp_path, seed
):
    """Property (the Delta CDF harness ported): over a RANDOM writer
    sequence (append / delete / update / merge / rewrite), every
    per-snapshot changelog slice equals the snapshot exceptAll diff —
    inserts = after∖before, deletes = before∖after, with
    value-identical delete+insert pairs (no-op updates) cancelled."""
    import random
    from collections import Counter

    rng = random.Random(seed)
    path = _table(spark, tmp_path, name=f"r{seed}", hi=6)
    next_id = [6]

    def _fresh(n):
        lo = next_id[0]
        next_id[0] += n
        return _df(spark, lo, lo + n)

    for _ in range(8):
        live = [
            r.id
            for r in read_iceberg_table(spark, path)
            .select("id").collect()
        ]
        op = rng.choice(
            ["append", "delete", "update", "merge", "rewrite"]
            if live else ["append"]
        )
        if op == "append":
            append_to_iceberg(spark, _fresh(rng.randint(1, 3)), path)
        elif op == "delete":
            pick = rng.sample(live, min(len(live), rng.randint(1, 3)))
            delete_from_iceberg(
                spark, path, f"id IN ({','.join(map(str, pick))})"
            )
        elif op == "update":
            pick = rng.sample(live, min(len(live), rng.randint(1, 2)))
            update_from_iceberg(
                spark, path, f"id IN ({','.join(map(str, pick))})",
                {"v": "v + 1000.0"},
            )
        elif op == "merge":
            pick = rng.sample(live, min(len(live), 2))
            lo = next_id[0]
            next_id[0] += 1
            src = _df(spark, lo, lo + 1).union(
                spark.createDataFrame(
                    [(int(i), "a", -1.0) for i in pick],
                    "id long, part string, v double",
                )
            )
            merge_into_iceberg(
                spark, path, src, "t.id = s.id",
                when_matched_update={"v": "s.v"},
            )
        else:
            rewrite_data_files(spark, path)

    sids = [s for s, _ in iceberg_snapshot_ids(path)]
    for prev, cur in zip(sids, sids[1:]):
        before = read_iceberg_table(spark, path, snapshot_id=prev)
        after = read_iceberg_table(spark, path, snapshot_id=cur)
        want_ins = sorted(
            (r.id, r.part, r.v)
            for r in after.exceptAll(before).collect()
        )
        want_del = sorted(
            (r.id, r.part, r.v)
            for r in before.exceptAll(after).collect()
        )
        ch = _slice(spark, path, prev, cur)
        ins_c = Counter(
            (r.id, r.part, r.v)
            for r in ch.where("_change_type = 'insert'").collect()
        )
        del_c = Counter(
            (r.id, r.part, r.v)
            for r in ch.where("_change_type = 'delete'").collect()
        )
        noop = ins_c & del_c
        assert sorted((ins_c - noop).elements()) == want_ins, (
            f"snapshot {cur} inserts"
        )
        assert sorted((del_c - noop).elements()) == want_del, (
            f"snapshot {cur} deletes"
        )


def test_changelog_timestamp_bounds(spark, tmp_path):
    """from/to_timestamp_ms mirror the Delta CDF's timestamp bounds:
    from = changes strictly after that commit time, to = at/before."""
    from data_lakehouse_project_spark.operators.iceberg_reader import (
        load_iceberg_metadata,
    )

    path = _table(spark, tmp_path)                 # snap 1
    delete_from_iceberg(spark, path, "id = 1")     # snap 2
    append_to_iceberg(spark, _df(spark, 4, 5), path)  # snap 3
    md = load_iceberg_metadata(path)
    ts_of = {
        s["snapshot-id"]: s["timestamp-ms"] for s in md["snapshots"]
    }
    sids = sorted(ts_of)

    got = sorted(
        (r._change_type, r.id)
        for r in read_iceberg_changelog(
            spark, path, from_timestamp_ms=ts_of[sids[0]],
            to_timestamp_ms=ts_of[sids[1]],
        ).collect()
    )
    assert got == [("delete", 1)]

    with pytest.raises(ValueError, match="not both"):
        read_iceberg_changelog(
            spark, path, from_snapshot_id=sids[0],
            from_timestamp_ms=ts_of[sids[0]],
        )
    with pytest.raises(ValueError, match="at or before"):
        read_iceberg_changelog(
            spark, path, to_timestamp_ms=ts_of[sids[0]] - 10_000
        )


def test_changelog_fills_identity_partition_consts(spark, tmp_path):
    """Spec: identity partition values replace an absent source
    column — the exported (delta-lite-layout) files lack the column
    physically, yet every change row (insert, position-delete AND
    whole-file delete) surfaces it as the manifest's constant."""
    path = str(tmp_path / "tp")
    t = TxnTable(path)
    t.write(
        spark.range(0, 4).selectExpr(
            "id", "CASE WHEN id < 2 THEN 'a' ELSE 'b' END AS part",
            "CAST(id AS DOUBLE) AS v",
        ),
        mode="overwrite",
        partition_by=["part"],
    )
    export_iceberg_metadata(t, spark)               # snap 1: inserts
    delete_from_iceberg(spark, path, "id = 1")      # snap 2: pos-del
    # snap 3: full-partition delete = whole-file removal rows
    delete_from_iceberg(spark, path, "part = 'b'")

    rows = read_iceberg_changelog(spark, path).collect()
    assert all(r["part"] is not None for r in rows), rows
    got = sorted((r._change_type, r.id, r.part) for r in rows)
    assert got == [
        ("delete", 1, "a"),
        ("delete", 2, "b"),
        ("delete", 3, "b"),
        ("insert", 0, "a"),
        ("insert", 1, "a"),
        ("insert", 2, "b"),
        ("insert", 3, "b"),
    ]


def test_changelog_empty_table_returns_empty(spark, tmp_path):
    """A table whose metadata has no current snapshot (no commits
    yet) yields an EMPTY changelog with the full output schema, not
    a ValueError — only an explicit to_snapshot_id may name a
    missing snapshot."""
    import json
    import os

    path = str(tmp_path / "empty")
    t = TxnTable(path)
    t.write(_df(spark, 0, 2), mode="overwrite")
    export_iceberg_metadata(t, spark)
    # strip the snapshots: the no-commits-yet metadata shape
    mdir = os.path.join(path, "metadata")
    mfile = sorted(
        f for f in os.listdir(mdir) if f.endswith(".metadata.json")
    )[-1]
    md = json.load(open(os.path.join(mdir, mfile)))
    md["snapshots"] = []
    md.pop("current-snapshot-id", None)
    md.pop("snapshot-log", None)
    json.dump(md, open(os.path.join(mdir, mfile), "w"))

    ch = read_iceberg_changelog(spark, path)
    assert ch.count() == 0
    assert "_change_type" in ch.columns and "part" in ch.columns

    with pytest.raises(ValueError, match="not in metadata"):
        read_iceberg_changelog(spark, path, to_snapshot_id=12345)


def test_changelog_over_equality_deletes(spark, tmp_path):
    """Equality-delete snapshots emit exact delete pre-images: the
    spec's strictly-older sequence rule means keys re-inserted AFTER
    the delete survive, and the changelog shows each kill once at the
    snapshot that issued it."""
    from data_lakehouse_project_spark.operators.iceberg_writer import (
        write_equality_deletes,
    )

    path = str(tmp_path / "eq")
    t = TxnTable(path)
    t.write(_df(spark, 0, 5), mode="overwrite")       # no partitioning
    export_iceberg_metadata(t, spark)                 # snap 1: 0..4
    write_equality_deletes(                           # snap 2: kill 1,3
        spark, path,
        spark.createDataFrame([(1,), (3,)], "id long"), ["id"],
    )
    append_to_iceberg(spark, _df(spark, 3, 4), path)  # snap 3: re-add 3
    write_equality_deletes(                           # snap 4: kill 2,3
        spark, path,
        spark.createDataFrame([(2,), (3,)], "id long"), ["id"],
    )

    sids = [s for s, _ in iceberg_snapshot_ids(path)]
    rows = sorted(
        (r._snapshot_id, r._change_type, r.id)
        for r in read_iceberg_changelog(spark, path).collect()
    )
    assert rows == [
        (sids[0], "insert", 0),
        (sids[0], "insert", 1),
        (sids[0], "insert", 2),
        (sids[0], "insert", 3),
        (sids[0], "insert", 4),
        (sids[1], "delete", 1),
        (sids[1], "delete", 3),
        (sids[2], "insert", 3),
        (sids[3], "delete", 2),
        (sids[3], "delete", 3),  # the RE-ADDED 3 (older one already dead)
    ]
    # replay reconciles with the live snapshot
    live = {r.id for r in read_iceberg_table(spark, path).collect()}
    assert live == {0, 3, 4} - {3} | {3} - {3} or live == {0, 4}


def test_upsert_into_iceberg_roundtrip(spark, tmp_path):
    """One-snapshot keyed upsert (equality-delete manifest + data
    manifest sharing a sequence number): matched keys replace, new
    keys insert, the same-snapshot data files survive their own
    deletes, and the changelog replays delete+insert per replaced
    key."""
    from data_lakehouse_project_spark.operators.iceberg_writer import (
        upsert_into_iceberg,
    )

    path = str(tmp_path / "ups")
    t = TxnTable(path)
    t.write(_df(spark, 0, 4), mode="overwrite")
    export_iceberg_metadata(t, spark)                  # snap 1: 0..3
    src = spark.createDataFrame(
        [(2, "a", 222.0), (10, "a", 10.0)],
        "id long, part string, v double",
    )
    info = upsert_into_iceberg(spark, path, src, ["id"])  # snap 2
    assert info["rows_upserted"] == 2 and info["delete_files"] >= 1

    got = sorted(
        (r.id, r.v) for r in read_iceberg_table(spark, path).collect()
    )
    assert got == [(0, 0.0), (1, 1.0), (2, 222.0), (3, 3.0), (10, 10.0)]

    ch = read_iceberg_changelog(
        spark, path, from_snapshot_id=iceberg_snapshot_ids(path)[0][0]
    )
    assert sorted(
        (r._change_type, r.id, r.v) for r in ch.collect()
    ) == [
        ("delete", 2, 2.0),
        ("insert", 2, 222.0),
        ("insert", 10, 10.0),
    ]

    # a second upsert touching the first's keys still sequences right
    src2 = spark.createDataFrame(
        [(10, "a", 1000.0)], "id long, part string, v double"
    )
    upsert_into_iceberg(spark, path, src2, ["id"])     # snap 3
    got = sorted(
        (r.id, r.v) for r in read_iceberg_table(spark, path).collect()
    )
    assert got == [(0, 0.0), (1, 1.0), (2, 222.0), (3, 3.0), (10, 1000.0)]

    # duplicate keys in one batch refuse
    dup = spark.createDataFrame(
        [(7, "a", 1.0), (7, "a", 2.0)], "id long, part string, v double"
    )
    with pytest.raises(ValueError, match="duplicate"):
        upsert_into_iceberg(spark, path, dup, ["id"])


@pytest.mark.parametrize("seed", [7, 31])
def test_changelog_equals_snapshot_diff_eqdelete_randomized(
    spark, tmp_path, seed
):
    """The randomized changelog-equals-snapshot-exceptAll-diff harness
    over the STREAMING-CDC op mix (append / equality-delete / keyed
    upsert) — the shapes a Flink-style upsert pipeline commits."""
    import random
    from collections import Counter

    from data_lakehouse_project_spark.operators.iceberg_writer import (
        upsert_into_iceberg,
        write_equality_deletes,
    )

    rng = random.Random(seed)
    path = str(tmp_path / f"eqr{seed}")
    t = TxnTable(path)
    t.write(_df(spark, 0, 6), mode="overwrite")
    export_iceberg_metadata(t, spark)
    next_id = [6]

    def _fresh(n):
        lo = next_id[0]
        next_id[0] += n
        return _df(spark, lo, lo + n)

    for _ in range(7):
        live = [
            r.id
            for r in read_iceberg_table(spark, path)
            .select("id").collect()
        ]
        op = rng.choice(
            ["append", "eqdelete", "upsert"] if live else ["append"]
        )
        if op == "append":
            append_to_iceberg(spark, _fresh(rng.randint(1, 3)), path)
        elif op == "eqdelete":
            pick = rng.sample(live, min(len(live), rng.randint(1, 3)))
            # mix in a never-present key: deletes matching nothing
            # must emit nothing
            pick.append(99999)
            write_equality_deletes(
                spark, path,
                spark.createDataFrame([(int(i),) for i in pick],
                                      "id long"),
                ["id"],
            )
        else:
            pick = rng.sample(live, min(len(live), rng.randint(1, 2)))
            lo = next_id[0]
            next_id[0] += 1
            rows = [(int(i), "a", float(i) + 500.0) for i in pick] + [
                (lo, "a", float(lo))
            ]
            upsert_into_iceberg(
                spark, path,
                spark.createDataFrame(
                    rows, "id long, part string, v double"
                ),
                ["id"],
            )

    sids = [s for s, _ in iceberg_snapshot_ids(path)]
    for prev, cur in zip(sids, sids[1:]):
        before = read_iceberg_table(spark, path, snapshot_id=prev)
        after = read_iceberg_table(spark, path, snapshot_id=cur)
        want_ins = sorted(
            (r.id, r.part, r.v)
            for r in after.exceptAll(before).collect()
        )
        want_del = sorted(
            (r.id, r.part, r.v)
            for r in before.exceptAll(after).collect()
        )
        ch = _slice(spark, path, prev, cur)
        ins_c = Counter(
            (r.id, r.part, r.v)
            for r in ch.where("_change_type = 'insert'").collect()
        )
        del_c = Counter(
            (r.id, r.part, r.v)
            for r in ch.where("_change_type = 'delete'").collect()
        )
        noop = ins_c & del_c
        assert sorted((ins_c - noop).elements()) == want_ins, (
            f"snapshot {cur} inserts (seed {seed})"
        )
        assert sorted((del_c - noop).elements()) == want_del, (
            f"snapshot {cur} deletes (seed {seed})"
        )
