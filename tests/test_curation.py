"""Curation batch 5: segment dedup, Gopher rules, soft dedup, DSIR,
MMR. Oracle parity for the four SQL-expressible ops is held by
tools/selfcheck.py / the driver; these tests pin the algorithmic
invariants and the MMR greedy selection against a pure-numpy reference.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from data_lakehouse_project_spark.ext import curation as X_cur


@pytest.fixture(scope="module")
def docs(testdata):
    return testdata["documents"]


@pytest.fixture(scope="module")
def emb(testdata):
    return testdata["embeddings"]


# --- segment dedup ----------------------------------------------------------

def test_segment_table_reconstructs_text(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e f g h i j k l m"), (2, "x y")],
        "id LONG, text STRING",
    )
    segs = X_cur.segment_table(df, "text", "id", seg_len=5).collect()
    by_doc: dict = {}
    for r in segs:
        by_doc.setdefault(r["id"], []).append((r["seg_idx"], r["seg"]))
    joined = {
        k: " ".join(s for _, s in sorted(v)) for k, v in by_doc.items()
    }
    assert joined == {1: "a b c d e f g h i j k l m", 2: "x y"}
    # window arithmetic: 13 tokens at seg_len=5 → 3 segments, last short
    assert sorted(s for _, s in by_doc[1]) == sorted(
        ["a b c d e", "f g h i j", "k l m"]
    )


def test_segment_dedup_flags_shared_segments(spark):
    shared = "one two three four five six seven eight nine ten"
    df = spark.createDataFrame(
        [
            (1, shared + " tailone tailtwo"),
            (2, shared + " other words here"),
            (3, "completely different text with no overlap at all ok"),
        ],
        "id LONG, text STRING",
    )
    out = {
        r["id"]: r
        for r in X_cur.segment_dedup_summary(
            df, "text", "id", seg_len=10
        ).collect()
    }
    # docs 1 and 2 share their first 10-token window exactly
    assert out[1]["dup_segs"] == 1 and out[2]["dup_segs"] == 1
    assert out[3]["dup_segs"] == 0
    assert out[1]["n_segs"] == 2  # 12 tokens → 2 windows
    assert abs(out[1]["frac_dup"] - 0.5) < 1e-9


def test_segment_dedup_summary_totals(docs):
    rows = X_cur.segment_dedup_summary(docs, "text", "doc_id").collect()
    assert len(rows) == docs.count()
    for r in rows:
        assert 0 <= r["dup_segs"] <= r["n_segs"]
        assert 0.0 <= r["frac_dup"] <= 1.0


def test_segment_dedup_plan_reuses_the_doc_grain_shuffle(docs):
    """Executed-plan gate: the (hash, id) aggregate must be written
    once and served to both consumers (ONE Generate + a ReusedExchange)
    — the count branch deliberately reads _occ so Catalyst cannot prune
    it into a non-identical subtree (see segment_dedup_summary)."""
    out = X_cur.segment_dedup_summary(docs, "text", "doc_id")
    out.collect()
    final = (
        out._jdf.queryExecution().executedPlan().toString()
        .split("Initial Plan")[0]
    )
    assert final.count("Generate posexplode") == 1
    assert final.count("ReusedExchange") == 1


# --- Gopher rules -----------------------------------------------------------

def test_gopher_flags_match_recomputed_rules(docs):
    out = X_cur.gopher_quality_flags(docs, "text", "doc_id")
    bad = out.where(
        (
            F.col("flag_word_count")
            != (
                (F.col("n_words") >= X_cur.GOPHER_MIN_WORDS)
                & (F.col("n_words") <= X_cur.GOPHER_MAX_WORDS)
            )
        )
        | (F.col("flag_stopwords") != (F.col("n_stopwords") >= 2))
        | (
            F.col("passes_gopher")
            != (
                F.col("flag_word_count")
                & F.col("flag_mean_len")
                & F.col("flag_alpha")
                & F.col("flag_stopwords")
            )
        )
    ).count()
    assert bad == 0


def test_gopher_rules_discriminate(spark):
    df = spark.createDataFrame(
        [
            (1, " ".join(["the", "table", "row", "value"] * 20)),  # passes
            (2, "too short"),  # fails word count
            (3, " ".join(["12345"] * 80)),  # fails alpha + stopwords
        ],
        "id LONG, text STRING",
    )
    out = {
        r["id"]: r
        for r in X_cur.gopher_quality_flags(df, "text", "id").collect()
    }
    assert out[1]["passes_gopher"]
    assert not out[2]["flag_word_count"]
    assert not out[3]["flag_alpha"] and not out[3]["flag_stopwords"]


# --- soft dedup -------------------------------------------------------------

def test_soft_dedup_weights_sum_to_one_per_group(spark):
    df = spark.createDataFrame(
        [(1, "dup text"), (2, "dup  TEXT"), (3, "unique")],
        "id LONG, text STRING",
    )
    rows = X_cur.soft_dedup_weights(df, "text", "id").collect()
    w = {r["id"]: r for r in rows}
    # 1 and 2 normalize to the same fingerprint
    assert w[1]["group_size"] == 2 and w[2]["group_size"] == 2
    assert abs(w[1]["weight"] - 0.5) < 1e-9
    assert w[3]["group_size"] == 1 and abs(w[3]["weight"] - 1.0) < 1e-9


def test_soft_dedup_total_mass_counts_distinct_texts(docs):
    out = X_cur.soft_dedup_weights(docs, "text", "doc_id")
    total = out.agg(F.sum("weight")).first()[0]
    distinct = docs.select(
        F.md5(F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")))
    ).distinct().count()
    # Σ 1/n over each group of size n = number of distinct texts
    # (rounding at 6 digits contributes ≤ 5e-7 per row)
    assert abs(total - distinct) < 1e-3 * distinct + 1e-3


# --- DSIR -------------------------------------------------------------------

def test_dsir_targets_score_higher_on_average(docs):
    out = X_cur.dsir_log_weights(
        docs, "text", "doc_id", F.col("source") == "src0", dim=1024
    ).join(docs.select("doc_id", "source"), "doc_id")
    means = {
        r["is_t"]: r["m"]
        for r in out.groupBy(
            (F.col("source") == "src0").alias("is_t")
        ).agg(F.avg("log_weight").alias("m")).collect()
    }
    # importance weights must rank the target slice above the rest
    assert means[True] > means[False]


def test_dsir_uniform_target_is_flat(spark):
    # when the target IS the raw distribution the log-ratio is 0
    df = spark.createDataFrame(
        [(i, "alpha beta gamma delta") for i in range(8)],
        "id LONG, text STRING",
    )
    out = X_cur.dsir_log_weights(
        df, "text", "id", F.lit(True), dim=64
    ).collect()
    assert all(abs(r["log_weight"]) < 1e-9 for r in out)


# --- MMR --------------------------------------------------------------------

def _mmr_numpy(ids, vecs, q, k, lam):
    vecs = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    q = np.asarray(q, dtype=np.float64)
    q = q / (np.linalg.norm(q) or 1.0)
    rel = vecs @ q
    selected: list[int] = []
    out = []
    for rank in range(1, k + 1):
        best_i, best_score = None, None
        for i in range(len(ids)):
            if i in selected:
                continue
            score = lam * rel[i]
            if selected:
                score -= (1 - lam) * max(
                    float(vecs[i] @ vecs[j]) for j in selected
                )
            if (
                best_i is None
                or score > best_score + 1e-12
                or (
                    abs(score - best_score) <= 1e-12
                    and ids[i] < ids[best_i]
                )
            ):
                best_i, best_score = i, score
        selected.append(best_i)
        out.append((rank, ids[best_i]))
    return out


def test_mmr_matches_numpy_reference(emb):
    rows = emb.select("vec_id", "embedding").collect()
    ids = [r["vec_id"] for r in rows]
    vecs = np.array([r["embedding"] for r in rows], dtype=np.float64)
    q = list(vecs[0])
    got = X_cur.mmr_select(
        emb, "vec_id", "embedding", q, k=8, lam=0.7
    ).collect()
    want = _mmr_numpy(ids, vecs, q, k=8, lam=0.7)
    assert [(r["rank"], r["vec_id"]) for r in got] == want


def test_mmr_first_pick_is_pure_relevance_and_diverse_after(emb):
    rows = emb.select("vec_id", "embedding").collect()
    vecs = np.array([r["embedding"] for r in rows], dtype=np.float64)
    q = list(vecs[3])
    got = X_cur.mmr_select(
        emb, "vec_id", "embedding", q, k=5, lam=0.7
    ).collect()
    assert len(got) == 5
    assert [r["rank"] for r in got] == [1, 2, 3, 4, 5]
    # rank 1 maximizes raw relevance
    assert got[0]["rel"] == max(r["rel"] for r in got)
    # scores are non-increasing in rank for fixed lam (greedy argmax
    # over a shrinking candidate set with a growing penalty term)
    scores = [r["score"] for r in got]
    assert all(
        scores[i] >= scores[i + 1] - 1e-9 for i in range(len(scores) - 1)
    )


def test_mmr_lambda_one_is_plain_topk(emb):
    rows = emb.select("vec_id", "embedding").collect()
    ids = [r["vec_id"] for r in rows]
    vecs = np.array([r["embedding"] for r in rows], dtype=np.float64)
    q = list(np.ones(vecs.shape[1]))
    got = X_cur.mmr_select(
        emb, "vec_id", "embedding", q, k=5, lam=1.0
    ).collect()
    unit = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    qa = np.asarray(q) / np.linalg.norm(q)
    rel = unit @ qa
    order = sorted(range(len(ids)), key=lambda i: (-rel[i], ids[i]))[:5]
    assert [r["vec_id"] for r in got] == [ids[i] for i in order]


def test_mmr_distributed_path_matches_fast_path(emb):
    """small_pool=0 forces the k-job TakeOrdered loop; it must pick
    exactly what the collect-once numpy path picks."""
    rows = emb.select("vec_id", "embedding").collect()
    q = list(np.array(rows[0]["embedding"], dtype=np.float64))
    fast = X_cur.mmr_select(
        emb, "vec_id", "embedding", q, k=6, lam=0.6
    ).collect()
    slow = X_cur.mmr_select(
        emb, "vec_id", "embedding", q, k=6, lam=0.6, small_pool=0
    ).collect()
    assert [(r["rank"], r["vec_id"]) for r in slow] == [
        (r["rank"], r["vec_id"]) for r in fast
    ]
    for a, b in zip(fast, slow):
        assert abs(a["score"] - b["score"]) < 1e-6


def test_mmr_string_id_column(emb):
    """The output id column carries the INPUT id type (regression:
    schema used to hardcode LONG)."""
    sdf = emb.selectExpr(
        "concat('v-', cast(vec_id as string)) AS sid", "embedding"
    )
    q = list(np.ones(len(emb.first()["embedding"])))
    got = X_cur.mmr_select(sdf, "sid", "embedding", q, k=3)
    assert dict(got.dtypes)["sid"] == "string"
    rows = got.collect()
    assert len(rows) == 3 and all(r["sid"].startswith("v-") for r in rows)
