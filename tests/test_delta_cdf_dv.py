"""CDF over deletion-vector commits (operators/delta_cdf.py +
sources/delta_stream.py readChangeFeed): modern delta-spark deletes
via DVs by default — a commit is `remove(path, dvOld)` +
`add(path, dvNew)` of ONE path, and the row-level delta is the diff of
the two bitmaps.  Fixtures are hand-built to the published Delta
protocol (inline Z85 RoaringBitmapArray DVs, reader version 3 with the
deletionVectors feature), cross-validated against the snapshot
reader's exceptAll diff, so the CDF math is anchored to an independent
implementation of the same log.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from data_lakehouse_project_spark.operators.delta_cdf import (
    read_delta_changes,
)
from data_lakehouse_project_spark.operators.delta_reader import (
    UnsupportedDeltaFeature,
    read_delta_table,
)
from data_lakehouse_project_spark.operators.dv import (
    rbm_array_serialize,
    z85_encode,
)

SCHEMA = json.dumps(
    {
        "type": "struct",
        "fields": [
            {"name": "id", "type": "long", "nullable": True,
             "metadata": {}},
            {"name": "v", "type": "double", "nullable": True,
             "metadata": {}},
        ],
    }
)


def _dv_descriptor(positions: list[int]) -> dict:
    blob = rbm_array_serialize(positions)
    pad = (-len(blob)) % 4
    return {
        "storageType": "i",
        "pathOrInlineDv": z85_encode(blob + b"\x00" * pad),
        "sizeInBytes": len(blob),
        "cardinality": len(positions),
    }


class _Fixture:
    def __init__(self, root: str):
        self.root = root
        self.log = os.path.join(root, "_delta_log")
        os.makedirs(self.log)
        self.next_v = 0

    def data(self, name: str, ids: list[int]) -> int:
        p = os.path.join(self.root, name)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        pq.write_table(
            pa.table(
                {
                    "id": pa.array(ids, pa.int64()),
                    "v": pa.array([float(i) for i in ids], pa.float64()),
                }
            ),
            p,
        )
        return os.path.getsize(p)

    def commit(self, actions: list[dict]) -> int:
        v = self.next_v
        self.next_v += 1
        ts = 1700000000000 + v * 1000
        with open(os.path.join(self.log, f"{v:020d}.json"), "w") as fh:
            fh.write(
                json.dumps({"commitInfo": {"timestamp": ts,
                                           "operation": "TEST"}})
                + "\n"
            )
            for a in actions:
                fh.write(json.dumps(a) + "\n")
        return v

    def init_table(self, first_adds: list[dict]):
        self.commit(
            [
                {"protocol": {
                    "minReaderVersion": 3, "minWriterVersion": 7,
                    "readerFeatures": ["deletionVectors"],
                    "writerFeatures": ["deletionVectors"]}},
                {"metaData": {
                    "id": "dv-cdf", "format": {"provider": "parquet",
                                               "options": {}},
                    "schemaString": SCHEMA, "partitionColumns": [],
                    "configuration": {}, "createdTime": 1700000000000}},
            ]
            + first_adds
        )

    def add(self, name: str, size: int, nrec: int,
            dv: dict | None = None) -> dict:
        a = {
            "path": name, "partitionValues": {}, "size": size,
            "modificationTime": 1700000000000, "dataChange": True,
            "stats": json.dumps({"numRecords": nrec}),
        }
        if dv is not None:
            a["deletionVector"] = dv
        return {"add": a}

    def remove(self, name: str, dv: dict | None = None) -> dict:
        r = {"path": name, "deletionTimestamp": 1700000000000,
             "dataChange": True}
        if dv is not None:
            r["deletionVector"] = dv
        return {"remove": r}


def _changes(spark, table, **kw):
    return sorted(
        (r._commit_version, r._change_type, r.id)
        for r in read_delta_changes(spark, table, **kw).collect()
    )


def test_dv_delete_commits_diff_per_file_state(spark, tmp_path):
    """Two successive DV deletes on one file: each commit's CDF delete
    set is exactly the newly-set positions, never the cumulative DV."""
    f = _Fixture(str(tmp_path / "t"))
    size = f.data("f0.parquet", [10, 11, 12, 13, 14, 15])
    f.init_table([f.add("f0.parquet", size, 6)])                 # v0
    dv1 = _dv_descriptor([1, 3])
    f.commit([f.remove("f0.parquet"),
              f.add("f0.parquet", size, 6, dv=dv1)])             # v1
    dv2 = _dv_descriptor([1, 3, 4])
    f.commit([f.remove("f0.parquet", dv=dv1),
              f.add("f0.parquet", size, 6, dv=dv2)])             # v2

    assert _changes(spark, f.root) == [
        (0, "insert", 10), (0, "insert", 11), (0, "insert", 12),
        (0, "insert", 13), (0, "insert", 14), (0, "insert", 15),
        (1, "delete", 11), (1, "delete", 13),
        (2, "delete", 14),
    ]
    # cross-validate v2's delta against the snapshot reader's diff
    before = read_delta_table(spark, f.root, version=1)
    after = read_delta_table(spark, f.root, version=2)
    gone = sorted(r.id for r in before.exceptAll(after).collect())
    cdf2 = [i for (v, t, i) in _changes(spark, f.root,
                                        starting_version=2)
            if t == "delete"]
    assert gone == cdf2 == [14]


def test_dv_remove_without_descriptor_uses_prior_state(spark, tmp_path):
    """A remove that OMITS the old DV descriptor still diffs correctly:
    the prior DV comes from the running snapshot state."""
    f = _Fixture(str(tmp_path / "t"))
    size = f.data("f0.parquet", [0, 1, 2, 3])
    f.init_table([f.add("f0.parquet", size, 4)])                 # v0
    f.commit([f.remove("f0.parquet"),
              f.add("f0.parquet", size, 4,
                    dv=_dv_descriptor([0]))])                    # v1
    f.commit([f.remove("f0.parquet"),  # no dv on the remove
              f.add("f0.parquet", size, 4,
                    dv=_dv_descriptor([0, 2]))])                 # v2
    assert [c for c in _changes(spark, f.root) if c[0] == 2] == [
        (2, "delete", 2),
    ]


def test_dv_restore_emits_reinserts(spark, tmp_path):
    """dvNew ⊂ dvOld (RESTORE shape): the un-deleted positions come
    back as re-inserts."""
    f = _Fixture(str(tmp_path / "t"))
    size = f.data("f0.parquet", [0, 1, 2, 3])
    f.init_table([f.add("f0.parquet", size, 4)])                 # v0
    f.commit([f.remove("f0.parquet"),
              f.add("f0.parquet", size, 4,
                    dv=_dv_descriptor([1, 2]))])                 # v1
    f.commit([f.remove("f0.parquet", dv=_dv_descriptor([1, 2])),
              f.add("f0.parquet", size, 4,
                    dv=_dv_descriptor([2]))])                    # v2
    got = _changes(spark, f.root, starting_version=1)
    assert got == [
        (1, "delete", 1), (1, "delete", 2),
        (2, "insert", 1),
    ]


def test_full_remove_of_dv_file_emits_live_rows_only(spark, tmp_path):
    """Dropping a DV-bearing file entirely deletes only its LIVE rows —
    the DV'd positions left the table in an earlier commit."""
    f = _Fixture(str(tmp_path / "t"))
    size = f.data("f0.parquet", [0, 1, 2, 3])
    f.init_table([f.add("f0.parquet", size, 4)])                 # v0
    dv = _dv_descriptor([1, 3])
    f.commit([f.remove("f0.parquet"),
              f.add("f0.parquet", size, 4, dv=dv)])              # v1
    f.commit([f.remove("f0.parquet", dv=dv)])                    # v2
    got = _changes(spark, f.root, starting_version=2)
    assert got == [(2, "delete", 0), (2, "delete", 2)]


def test_fresh_add_with_dv_inserts_live_rows_only(spark, tmp_path):
    f = _Fixture(str(tmp_path / "t"))
    size = f.data("f0.parquet", [0, 1, 2])
    f.init_table([f.add("f0.parquet", size, 3,
                        dv=_dv_descriptor([1]))])                # v0
    assert _changes(spark, f.root) == [
        (0, "insert", 0), (0, "insert", 2),
    ]


def test_same_path_overwrite_without_dv_still_refused(spark, tmp_path):
    f = _Fixture(str(tmp_path / "t"))
    size = f.data("f0.parquet", [0, 1])
    f.init_table([f.add("f0.parquet", size, 2)])                 # v0
    f.commit([f.remove("f0.parquet"),
              f.add("f0.parquet", size, 2)])                     # v1
    with pytest.raises(UnsupportedDeltaFeature, match="overwrite"):
        read_delta_changes(spark, f.root)


def test_true_rewrite_still_refused(spark, tmp_path):
    f = _Fixture(str(tmp_path / "t"))
    s0 = f.data("f0.parquet", [0, 1])
    s1 = f.data("f1.parquet", [0, 9])
    f.init_table([f.add("f0.parquet", s0, 2)])                   # v0
    f.commit([f.remove("f0.parquet"),
              f.add("f1.parquet", s1, 2)])                       # v1
    with pytest.raises(UnsupportedDeltaFeature, match="rewrites"):
        read_delta_changes(spark, f.root)


def test_remove_then_readd_attributes_each_commit_once(spark, tmp_path):
    """The same physical file in two specs of one branch (remove at v1,
    re-add at v2): each row is attributed to each commit exactly once —
    the duplicate-path broadcast-join multiplication is gone."""
    f = _Fixture(str(tmp_path / "t"))
    size = f.data("f0.parquet", [7, 8])
    f.init_table([f.add("f0.parquet", size, 2)])                 # v0
    f.commit([f.remove("f0.parquet")])                           # v1
    f.commit([f.add("f0.parquet", size, 2)])                     # v2
    assert _changes(spark, f.root) == [
        (0, "insert", 7), (0, "insert", 8),
        (1, "delete", 7), (1, "delete", 8),
        (2, "insert", 7), (2, "insert", 8),
    ]


def test_cdc_path_url_encoded(spark, tmp_path):
    """cdc action paths are URL-encoded per spec — a _change_data file
    with a space in its name must resolve."""
    f = _Fixture(str(tmp_path / "t"))
    size = f.data("f0.parquet", [0])
    f.init_table([f.add("f0.parquet", size, 1)])                 # v0
    cdc_rel = "_change_data/c d.parquet"
    p = os.path.join(f.root, cdc_rel)
    os.makedirs(os.path.dirname(p))
    pq.write_table(
        pa.table(
            {
                "id": pa.array([0], pa.int64()),
                "v": pa.array([9.0], pa.float64()),
                "_change_type": pa.array(["update_postimage"],
                                         pa.string()),
            }
        ),
        p,
    )
    f.commit([
        {"cdc": {"path": "_change_data/c%20d.parquet",
                 "partitionValues": {}, "size": os.path.getsize(p),
                 "dataChange": False}},
    ])                                                           # v1
    got = _changes(spark, f.root, starting_version=1)
    assert got == [(1, "update_postimage", 0)]


def test_streaming_read_change_feed_over_dv_commits(spark, tmp_path):
    """readChangeFeed mirrors the batch DV-diff semantics."""
    f = _Fixture(str(tmp_path / "t"))
    size = f.data("f0.parquet", [10, 11, 12, 13])
    f.init_table([f.add("f0.parquet", size, 4)])                 # v0
    dv1 = _dv_descriptor([1])
    f.commit([f.remove("f0.parquet"),
              f.add("f0.parquet", size, 4, dv=dv1)])             # v1
    f.commit([f.remove("f0.parquet", dv=dv1),
              f.add("f0.parquet", size, 4,
                    dv=_dv_descriptor([1, 2]))])                 # v2

    from data_lakehouse_project_spark.sources.delta_stream import (
        DeltaStreamDataSource,
    )

    spark.dataSource.register(DeltaStreamDataSource)
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    (
        spark.readStream.format("delta_stream")
        .option("path", f.root)
        .option("readChangeFeed", "true")
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
        .awaitTermination(120)
    )
    rows = sorted(
        (r._commit_version, r._change_type, r.id)
        for r in spark.read.parquet(out).collect()
    )
    assert rows == [
        (0, "insert", 10), (0, "insert", 11), (0, "insert", 12),
        (0, "insert", 13),
        (1, "delete", 11),
        (2, "delete", 12),
    ]


def test_cdf_over_column_mapped_table(spark, tmp_path):
    """CDF over a name-mapped table: data/cdc files and the log's
    partitionValues use PHYSICAL names; the feed restores logical
    names — including through a DV-diff commit."""
    root = str(tmp_path / "m")
    log = os.path.join(root, "_delta_log")
    os.makedirs(log)
    schema = json.dumps(
        {
            "type": "struct",
            "fields": [
                {"name": "id", "type": "long", "nullable": True,
                 "metadata": {
                     "delta.columnMapping.id": 1,
                     "delta.columnMapping.physicalName": "col-i1"}},
                {"name": "grp", "type": "string", "nullable": True,
                 "metadata": {
                     "delta.columnMapping.id": 2,
                     "delta.columnMapping.physicalName": "col-g2"}},
            ],
        }
    )
    fp = os.path.join(root, "f0.parquet")
    pq.write_table(
        pa.table({"col-i1": pa.array([10, 11, 12], pa.int64())}), fp
    )
    ts = 1700000000000

    def _commit(v, actions):
        with open(os.path.join(log, f"{v:020d}.json"), "w") as fh:
            fh.write(json.dumps(
                {"commitInfo": {"timestamp": ts + v,
                                "operation": "T"}}) + "\n")
            for a in actions:
                fh.write(json.dumps(a) + "\n")

    def _add(dv=None):
        a = {"path": "f0.parquet",
             "partitionValues": {"col-g2": "west"},
             "size": os.path.getsize(fp),
             "modificationTime": ts, "dataChange": True,
             "stats": json.dumps({"numRecords": 3})}
        if dv:
            a["deletionVector"] = dv
        return {"add": a}

    _commit(0, [
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
        {"metaData": {
            "id": "m1", "format": {"provider": "parquet",
                                   "options": {}},
            "schemaString": schema, "partitionColumns": ["grp"],
            "configuration": {"delta.columnMapping.mode": "name",
                              "delta.columnMapping.maxColumnId": "2"},
            "createdTime": ts}},
        _add(),
    ])
    _commit(1, [
        {"remove": {"path": "f0.parquet", "deletionTimestamp": ts + 1,
                    "dataChange": True,
                    "partitionValues": {"col-g2": "west"}}},
        _add(dv=_dv_descriptor([1])),
    ])

    got = sorted(
        (r._commit_version, r._change_type, r.id, r.grp)
        for r in read_delta_changes(spark, root).collect()
    )
    assert got == [
        (0, "insert", 10, "west"),
        (0, "insert", 11, "west"),
        (0, "insert", 12, "west"),
        (1, "delete", 11, "west"),
    ]


@pytest.mark.parametrize("seed", [11, 23, 47])
def test_cdf_equals_snapshot_diff_randomized(spark, tmp_path, seed):
    """Property: over a RANDOM commit sequence (appends, incremental
    DV deletes, restores, full file removes), every per-version CDF
    slice must equal the snapshot reader's exceptAll diff — inserts =
    after∖before, deletes = before∖after.  Anchors the DV-diff math
    to an independent implementation of the same log for shapes no
    hand-written case enumerates."""
    import random

    rng = random.Random(seed)
    f = _Fixture(str(tmp_path / f"t{seed}"))
    next_file = [0]
    # live state mirror: name -> (ids tuple, dv frozenset, size)
    live: dict[str, tuple] = {}

    def _new_file():
        n = rng.randint(2, 6)
        base = next_file[0] * 100
        ids = list(range(base, base + n))
        name = f"f{next_file[0]}.parquet"
        next_file[0] += 1
        size = f.data(name, ids)
        return name, ids, size

    name, ids, size = _new_file()
    f.init_table([f.add(name, size, len(ids))])
    live[name] = (ids, frozenset(), size)

    for _ in range(10):
        ops = ["append"]
        if live:
            ops += ["dv_delete", "remove"]
        if any(dv for _, dv, _ in live.values()):
            ops += ["restore"]
        op = rng.choice(ops)
        if op == "append":
            name, ids, size = _new_file()
            f.commit([f.add(name, size, len(ids))])
            live[name] = (ids, frozenset(), size)
        elif op == "dv_delete":
            name = rng.choice(sorted(live))
            ids, dv, size = live[name]
            candidates = [i for i in range(len(ids)) if i not in dv]
            if not candidates:
                continue
            kill = frozenset(
                rng.sample(candidates,
                           rng.randint(1, len(candidates)))
            )
            new_dv = dv | kill
            old_desc = _dv_descriptor(sorted(dv)) if dv else None
            f.commit([
                f.remove(name, dv=old_desc),
                f.add(name, size, len(ids),
                      dv=_dv_descriptor(sorted(new_dv))),
            ])
            live[name] = (ids, new_dv, size)
        elif op == "restore":
            name = rng.choice(
                [n for n, (_, dv, _) in live.items() if dv]
            )
            ids, dv, size = live[name]
            back = frozenset(
                rng.sample(sorted(dv), rng.randint(1, len(dv)))
            )
            new_dv = dv - back
            f.commit([
                f.remove(name, dv=_dv_descriptor(sorted(dv))),
                f.add(name, size, len(ids),
                      dv=_dv_descriptor(sorted(new_dv))
                      if new_dv else None),
            ])
            # paired re-add without DV is refused when old has none;
            # new_dv empty + old dv present is a legal full restore
            live[name] = (ids, new_dv, size)
        else:  # remove
            name = rng.choice(sorted(live))
            ids, dv, size = live.pop(name)
            f.commit([
                f.remove(name,
                         dv=_dv_descriptor(sorted(dv)) if dv else None)
            ])

    latest = f.next_v - 1
    for v in range(1, latest + 1):
        before = read_delta_table(spark, f.root, version=v - 1)
        after = read_delta_table(spark, f.root, version=v)
        want_ins = sorted(
            r.id for r in after.exceptAll(before).collect()
        )
        want_del = sorted(
            r.id for r in before.exceptAll(after).collect()
        )
        got = read_delta_changes(
            spark, f.root, starting_version=v, ending_version=v
        ).collect()
        got_ins = sorted(r.id for r in got
                         if r._change_type == "insert")
        got_del = sorted(r.id for r in got
                         if r._change_type == "delete")
        assert got_ins == want_ins, (seed, v, "insert")
        assert got_del == want_del, (seed, v, "delete")
