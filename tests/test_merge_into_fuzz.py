"""Randomized differential test: merge_into vs a pure-Python reference
model across clause combinations (seeded, deterministic). Catches
clause-interaction bugs a hand-written case matrix misses — the
multi-match bystander duplication fixed this round is exactly the class
this hunts."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from data_lakehouse_project_spark.operators.txnlog import TxnTable


def _reference_merge(
    target: list[tuple],
    source: list[tuple],
    upd_thresh: int | None,
    del_thresh: int | None,
    insert: bool,
    nmbs_thresh: int | None,
):
    """Rows are (id, v). Clause semantics mirrored from the docstring:
    matched DELETE first (s.v >= del_thresh), then matched UPDATE
    (v := t.v + s.v when s.v >= upd_thresh), NOT MATCHED insert, NOT
    MATCHED BY SOURCE delete (t.v >= nmbs_thresh)."""
    src_by_id: dict = {}
    for sid, sv in source:
        src_by_id.setdefault(sid, []).append(sv)
    out = []
    for tid, tv in target:
        if tid in src_by_id:
            (sv,) = src_by_id[tid]  # fuzz keeps source key-unique
            if del_thresh is not None and sv >= del_thresh:
                continue
            if upd_thresh is not None and sv >= upd_thresh:
                out.append((tid, tv + sv))
                continue
            out.append((tid, tv))
        else:
            if nmbs_thresh is not None and tv >= nmbs_thresh:
                continue
            out.append((tid, tv))
    if insert:
        tgt_ids = {t[0] for t in target}
        for sid, svs in src_by_id.items():
            if sid not in tgt_ids:
                out.extend((sid, sv) for sv in svs)
    return sorted(out)


@pytest.mark.parametrize("seed", range(12))
def test_merge_into_matches_reference_model(spark, tmp_path, seed):
    rng = random.Random(seed)
    n_target = rng.randint(0, 30)
    target = [(i, rng.randint(0, 100)) for i in range(n_target)]
    # source: unique keys, half overlapping the target id space
    src_ids = rng.sample(range(max(n_target * 2, 10)), rng.randint(0, 15))
    source = [(i, rng.randint(0, 100)) for i in src_ids]

    upd_thresh = rng.choice([None, 0, 50])
    del_thresh = rng.choice([None, 80])
    insert = rng.choice([True, False])
    nmbs_thresh = rng.choice([None, 90])
    if upd_thresh is None and del_thresh is None and not insert \
            and nmbs_thresh is None:
        upd_thresh = 0  # at least one clause

    t = TxnTable(str(tmp_path / f"t{seed}"))
    if target:
        tdf = spark.createDataFrame(target, "id LONG, v LONG")
    else:
        tdf = spark.createDataFrame([], "id LONG, v LONG")
    t.write(tdf.repartition(3), mode="overwrite")
    sdf = (
        spark.createDataFrame(source, "id LONG, v LONG")
        if source
        else spark.createDataFrame([], "id LONG, v LONG")
    )

    t.merge_into(
        spark,
        sdf,
        ["id"],
        matched_update=(
            {"v": "t.v + s.v"} if upd_thresh is not None else None
        ),
        matched_update_condition=(
            f"s.v >= {upd_thresh}" if upd_thresh else None
        ),
        matched_delete_condition=(
            f"s.v >= {del_thresh}" if del_thresh is not None else None
        ),
        insert=insert,
        not_matched_by_source_delete=(
            f"t.v >= {nmbs_thresh}" if nmbs_thresh is not None else False
        ),
    )
    got = sorted(
        (r["id"], r["v"]) for r in t.read(spark).collect()
    )
    want = _reference_merge(
        target, source, upd_thresh, del_thresh, insert, nmbs_thresh
    )
    assert got == want, (
        f"seed={seed} upd={upd_thresh} del={del_thresh} "
        f"insert={insert} nmbs={nmbs_thresh}"
    )
