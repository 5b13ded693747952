"""Property-based spot checks (SURVEY §5 strategy 4) with Hypothesis.

Few examples per property (Spark round-trips are expensive); the point is
algebraic invariants over adversarial small inputs, not volume.
"""

from __future__ import annotations

from decimal import Decimal

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from data_lakehouse_project_spark.ext.skew import salted_aggregate
from data_lakehouse_project_spark.functions.scalar import SCALAR_FUNCTIONS
from data_lakehouse_project_spark.operators.upsert import merge_upsert

_hyp = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

rows_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),  # group key
        st.floats(
            min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
        ),
    ),
    min_size=1,
    max_size=30,
)


@_hyp
@given(rows=rows_strategy)
def test_salted_aggregate_invariant(spark, rows):
    """Salted two-phase agg == plain groupBy for any input."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(rows, "k int, v double")
    salted = {
        r.k: (r.n, round(r.s, 6))
        for r in salted_aggregate(
            df, ["k"], sums={"s": "v"}, count_name="n", salt_buckets=4
        ).collect()
    }
    plain = {
        r.k: (r.n, round(r.s, 6))
        for r in df.groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
        .collect()
    }
    assert salted == plain


@_hyp
@given(
    target=st.dictionaries(
        st.integers(0, 9), st.text("ab", max_size=3), max_size=8
    ),
    source=st.dictionaries(
        st.integers(0, 9), st.text("ab", max_size=3), max_size=8
    ),
)
def test_merge_upsert_semantics(spark, target, source):
    """MERGE result == dict-update semantics for any key overlap."""
    t = spark.createDataFrame(
        list(target.items()) or [(None, None)], "id int, v string"
    ).where("id IS NOT NULL")
    s = spark.createDataFrame(
        list(source.items()) or [(None, None)], "id int, v string"
    ).where("id IS NOT NULL")
    got = {r.id: r.v for r in merge_upsert(t, s, ["id"]).collect()}
    want = {**target, **source}
    assert got == want


@_hyp
@given(
    amounts=st.lists(
        st.decimals(
            min_value=Decimal("-999.99"),
            max_value=Decimal("999.99"),
            places=2,
        ),
        min_size=1,
        max_size=20,
    )
)
def test_groupsum_equals_total(spark, amounts):
    """Σ(per-group sums) == global sum — partial aggregation is lossless
    for exact decimal arithmetic."""
    from pyspark.sql import functions as F

    rows = [(i % 3, a) for i, a in enumerate(amounts)]
    df = spark.createDataFrame(rows, "k int, amount decimal(10,2)")
    per_group = df.groupBy("k").agg(F.sum("amount").alias("s"))
    total_of_groups = per_group.agg(F.sum("s")).first()[0]
    total = df.agg(F.sum("amount")).first()[0]
    assert total_of_groups == total


def test_scalar_function_registry(spark):
    """Every reference scalar function (SURVEY §2.4 F1-F5) is callable
    through the registry and produces the expected type."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("HeLLo", "2025-08-15 13:45:00")], "s string, ts string"
    )
    out = df.select(
        SCALAR_FUNCTIONS["lower"](F.col("s")).alias("lower"),
        SCALAR_FUNCTIONS["to_date"](F.col("ts")).alias("d"),
        SCALAR_FUNCTIONS["to_timestamp"](F.col("ts")).alias("t"),
        SCALAR_FUNCTIONS["date_format"](F.col("ts"), "yyyy-MM").alias("ym"),
        SCALAR_FUNCTIONS["year"](F.col("ts")).alias("y"),
        SCALAR_FUNCTIONS["month"](F.col("ts")).alias("m"),
    ).collect()[0]
    assert out.lower == "hello"
    assert str(out.d) == "2025-08-15"
    assert out.ym == "2025-08"
    assert (out.y, out.m) == (2025, 8)


@pytest.mark.parametrize("n", [0, 1, 7])
def test_dedup_exact_cardinality(spark, n):
    """Exact dedup of k distinct texts duplicated n+1 times → k groups."""
    from data_lakehouse_project_spark.ext.dedup import exact_dedup_groups

    texts = ["alpha beta", "gamma delta", "epsilon"]
    rows = [
        (i * 100 + j, t) for i, t in enumerate(texts) for j in range(n + 1)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = exact_dedup_groups(df, "text", "doc_id").collect()
    assert len(out) == len(texts)
    assert all(r.dup_count == n + 1 for r in out)


cap_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=10_000),  # doc id (may repeat)
        st.integers(min_value=0, max_value=3),       # source key
    ),
    min_size=1,
    max_size=40,
    unique_by=lambda t: t[0],
)


@_hyp
@given(rows=cap_rows, cap=st.integers(min_value=1, max_value=6))
def test_cap_per_group_invariants(spark, rows, cap):
    """For any frame: every group keeps min(cap, |group|) rows, the
    selection is a subset of the input, and it is stable under
    repartitioning."""
    from pyspark.sql import functions as F

    from data_lakehouse_project_spark.ext.sampling import cap_per_group

    df = spark.createDataFrame(
        [(i, f"s{g}") for i, g in rows], "doc_id long, source string"
    )
    kept = cap_per_group(df, "source", "doc_id", cap)
    sizes = {r.source: r.n for r in
             df.groupBy("source").agg(F.count("*").alias("n")).collect()}
    got = {r.source: r.n for r in
           kept.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert got == {s: min(cap, n) for s, n in sizes.items() if min(cap, n)}
    ids = {r.doc_id for r in kept.collect()}
    assert ids <= {i for i, _ in rows}
    again = {r.doc_id for r in
             cap_per_group(df.repartition(5), "source", "doc_id", cap).collect()}
    assert ids == again


@_hyp
@given(rows=cap_rows, budget=st.integers(min_value=1, max_value=40))
def test_token_budget_never_exceeded(spark, rows, budget):
    """tokens_kept <= budget per group, and docs_kept matches the greedy
    longest-first prefix rule, for any inputs."""
    from data_lakehouse_project_spark.ext.sampling import token_budget_selection

    df = spark.createDataFrame(
        [(i, f"s{g}", "w " * ((i % 7) + 1)) for i, g in rows],
        "doc_id long, source string, text string",
    )
    out = token_budget_selection(df, "text", "doc_id", "source", budget)
    for r in out.collect():
        assert 0 < r.tokens_kept <= budget
        assert r.docs_kept >= 1


@_hyp
@given(
    keys=st.lists(
        st.text(
            alphabet="abcdefgh0123456789", min_size=1, max_size=12
        ),
        min_size=1,
        max_size=40,
        unique=True,
    ),
    split=st.integers(min_value=0, max_value=40),
)
def test_bloom_never_false_negative(spark, keys, split):
    """For ANY key set and split, every indexed key probes
    maybe_member=True (the guarantee admission control builds on)."""
    from pyspark.sql import functions as F

    from data_lakehouse_project_spark.ext.bloom import (
        bloom_build,
        bloom_probe,
    )

    indexed = keys[: max(1, min(split, len(keys)))]
    df = spark.createDataFrame([(k,) for k in indexed], "fp string")
    bloom = bloom_build(df, "fp", 1 << 14, 4)
    probed = bloom_probe(df, "fp", bloom, 1 << 14, 4)
    assert probed.where("NOT maybe_member").count() == 0


@_hyp
@given(
    points=st.lists(
        st.floats(min_value=0, max_value=100, allow_nan=False),
        min_size=1,
        max_size=25,
    ),
    intervals=st.lists(
        st.tuples(
            st.floats(min_value=0, max_value=100, allow_nan=False),
            st.floats(min_value=0, max_value=30, allow_nan=False),
        ),
        min_size=1,
        max_size=8,
    ),
    width=st.sampled_from([3.0, 10.0, 50.0]),
)
def test_interval_bin_join_equals_nested_loop(spark, points, intervals, width):
    """Bin-grid rewrite ≡ nested-loop inequality join for arbitrary
    points, interval layouts, and bin widths (incl. empty intervals and
    bin-edge alignment)."""
    from pyspark.sql import functions as F

    from data_lakehouse_project_spark.ext.rangejoin import interval_bin_join

    pts = spark.createDataFrame(
        list(enumerate(points)), "id long, v double"
    )
    ivs = spark.createDataFrame(
        [(i, lo, lo + span) for i, (lo, span) in enumerate(intervals)],
        "iid long, lo double, hi double",
    )
    binned = interval_bin_join(pts, ivs, "v", "lo", "hi", width)
    bnlj = pts.join(
        ivs, (F.col("v") >= F.col("lo")) & (F.col("v") < F.col("hi"))
    )
    key = lambda df: sorted((r.id, r.iid) for r in df.collect())
    assert key(binned) == key(bnlj)


# ------------------------------------------------- exactsubstr property
def _naive_dup_spans(docs: dict[int, list[str]], window: int):
    """Reference implementation of the duplicated-window-span DEFINITION
    (ext/dedup.py::duplicated_window_spans): count every window's corpus
    occurrences, mark covering positions, merge overlaps."""
    from collections import Counter

    freq = Counter()
    for toks in docs.values():
        for i in range(len(toks) - window + 1):
            freq[tuple(toks[i : i + window])] += 1
    out = {}
    for doc_id, toks in docs.items():
        hits = [
            i + 1
            for i in range(len(toks) - window + 1)
            if freq[tuple(toks[i : i + window])] >= 2
        ]
        spans, prev = [], None
        for p in hits:
            if prev is not None and p <= prev + window:  # merge rule
                spans[-1][1] = p + window - 1
            else:
                spans.append([p, p + window - 1])
            prev = p
        if spans:
            total = sum(e - s + 1 for s, e in spans)
            out[doc_id] = (len(spans), total, max(e - s + 1 for s, e in spans))
    return out


token_docs = st.lists(
    st.lists(
        st.sampled_from(["a", "b", "c", "d"]), min_size=0, max_size=24
    ),
    min_size=1,
    max_size=6,
)


@_hyp
@given(docs=token_docs)
def test_duplicated_window_spans_matches_naive(spark, docs):
    """Distributed rolling-hash spans == brute-force definition for any
    small corpus (4-token alphabet makes repeats likely)."""
    from data_lakehouse_project_spark.ext.dedup import (
        duplicated_window_spans,
    )

    window = 3
    doc_map = {i: toks for i, toks in enumerate(docs)}
    rows = [(i, " ".join(toks)) for i, toks in doc_map.items()]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_dup_spans, r.dup_tokens, r.max_span_tokens)
        for r in duplicated_window_spans(
            df, "text", "doc_id", window=window
        ).collect()
    }
    want = _naive_dup_spans(doc_map, window)
    assert got == want


_word = st.text(alphabet="abcxyz", min_size=1, max_size=5)
_doc_words = st.lists(_word, min_size=0, max_size=40)


@_hyp
@given(
    docs=st.lists(_doc_words, min_size=1, max_size=6),
    seg_len=st.integers(min_value=1, max_value=7),
)
def test_segment_table_reconstruction_property(spark, docs, seg_len):
    """For ANY token sequence and window length: segments joined in
    index order reproduce the normalized text, and the window count is
    ceil(n_tokens / seg_len) (one window for the empty-token edge,
    since normalize('') splits to [''])."""
    import math

    from data_lakehouse_project_spark.ext.curation import segment_table

    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    df = spark.createDataFrame(rows, "id LONG, text STRING")
    segs = segment_table(df, "text", "id", seg_len=seg_len).collect()
    by_doc: dict = {}
    for r in segs:
        by_doc.setdefault(r["id"], []).append((r["seg_idx"], r["seg"]))
    for i, ws in enumerate(docs):
        norm_tokens = " ".join(ws).split(" ") if ws else [""]
        want_text = " ".join(norm_tokens)
        got = sorted(by_doc.get(i, []))
        assert [ix for ix, _ in got] == list(range(len(got)))
        assert " ".join(s for _, s in got) == want_text
        assert len(got) == math.ceil(len(norm_tokens) / seg_len)
