"""Heavy hitters: exact anchor + Misra-Gries mergeable summary
(ext/frequent.py). The MG guarantee — no false negatives above
n/(k+1), underestimate bounded by n/(k+1) — is property-tested with
Hypothesis over arbitrary streams and partitionings."""

import collections

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from data_lakehouse_project_spark.ext.frequent import (
    _mg_partial,
    frequent_items_exact,
    misra_gries_topk,
)


def test_frequent_items_exact_hand_checked(spark):
    rows = [("a",)] * 6 + [("b",)] * 3 + [("c",)] * 1
    df = spark.createDataFrame(rows, "tok string")
    got = {
        r.item: (r.cnt, r.share)
        for r in frequent_items_exact(df, "tok", 0.25).collect()
    }
    assert got == {"a": (6, 0.6), "b": (3, 0.3)}


def test_misra_gries_no_false_negatives_simple(spark):
    # 'hot' has 40 of 100 rows; k=4 → threshold n/(k+1)=20 → must survive
    rows = [("hot",)] * 40 + [(f"cold{i}",) for i in range(60)]
    df = spark.createDataFrame(rows, "item string").repartition(8)
    got = {r.item: r.est for r in misra_gries_topk(df, "item", 4).collect()}
    assert "hot" in got
    assert 40 - 100 / 5 <= got["hot"] <= 40


def test_misra_gries_bounded_output_and_estimates(spark):
    rows = [(f"i{i % 17}",) for i in range(500)]
    df = spark.createDataFrame(rows, "item string").repartition(5)
    out = misra_gries_topk(df, "item", 6).collect()
    assert len(out) <= 6
    true = collections.Counter(f"i{i % 17}" for i in range(500))
    for r in out:
        assert 0 < r.est <= true[r.item]
        assert true[r.item] - r.est <= 500 / 7


@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    stream=st.lists(
        st.sampled_from("abcdefghij"), min_size=1, max_size=400
    ),
    k=st.integers(min_value=2, max_value=8),
    cuts=st.lists(st.integers(0, 400), max_size=4),
)
def test_mg_partial_merge_guarantee_pure_python(stream, k, cuts):
    """Driver-side replica of the distributed plan: split the stream at
    arbitrary partition boundaries, run the SAME _mg_partial per chunk,
    merge by summing, trim by the (k+1)-th largest — then check the
    mergeable-summaries guarantee against exact counts."""
    import pandas as pd

    n = len(stream)
    bounds = sorted({min(c, n) for c in cuts} | {0, n})
    merged: dict = {}
    for lo, hi in zip(bounds, bounds[1:]):
        chunk = stream[lo:hi]
        if not chunk:
            continue
        for pdf in _mg_partial(iter([pd.DataFrame({"item": chunk})]), k):
            for item, wt in zip(pdf["item"], pdf["wt"]):
                merged[item] = merged.get(item, 0) + int(wt)
    kth = sorted(merged.values(), reverse=True)[k] if len(merged) > k else 0
    est = {
        i: w - kth
        for i, w in sorted(merged.items(), key=lambda x: (-x[1], x[0]))[:k]
        if w - kth > 0
    }
    true = collections.Counter(stream)
    thresh = n / (k + 1)
    for item, cnt in true.items():
        if cnt > thresh:
            assert item in est, (item, cnt, thresh, est)
    for item, e in est.items():
        assert e <= true[item]
        assert true[item] - e <= thresh + 1e-9


# --- Count-Min sketch -------------------------------------------------------

def _zipf_items(spark, n=4000, seed=3):
    import random

    rng = random.Random(seed)
    rows = [(f"tok{int(rng.paretovariate(1.2)) % 200}",) for _ in range(n)]
    return rows, spark.createDataFrame(rows, "item string")


def test_cms_never_underestimates_and_bounded(spark):
    import collections

    from data_lakehouse_project_spark.ext.frequent import (
        cms_build,
        cms_estimate,
    )

    rows, df = _zipf_items(spark)
    true = collections.Counter(r[0] for r in rows)
    width, depth = 512, 4
    sketch = cms_build(df, "item", width=width, depth=depth)
    est = {
        r.item: r.est
        for r in cms_estimate(
            df.distinct(), sketch, "item", width=width, depth=depth
        ).collect()
    }
    import math

    n = len(rows)
    eps_n = (math.e / width) * n
    assert est.keys() == set(true)
    for item, cnt in true.items():
        assert est[item] >= cnt, (item, est[item], cnt)
        # classic bound holds with prob 1-(1/2)^depth per key; with 200
        # keys allow a small number of excursions
    over = sum(1 for i, c in true.items() if est[i] - c > eps_n)
    assert over <= max(2, len(true) // 20)


def test_cms_merge_equals_direct(spark):
    from data_lakehouse_project_spark.ext.frequent import (
        cms_build,
        cms_merge,
    )

    rows, df = _zipf_items(spark, n=3000, seed=9)
    half = len(rows) // 2
    a = spark.createDataFrame(rows[:half], "item string")
    b = spark.createDataFrame(rows[half:], "item string")
    direct = cms_build(df, "item", width=256, depth=3)
    merged = cms_merge(
        cms_build(a, "item", width=256, depth=3),
        cms_build(b, "item", width=256, depth=3),
    )
    d = sorted(map(tuple, direct.collect()))
    m = sorted(map(tuple, merged.collect()))
    assert d == m
