"""Extension operators: dedup, similarity, text analysis — property-based
spot checks (SURVEY §5 strategy 4) + hand-computed examples."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from data_lakehouse_project_spark.ext import dedup, similarity, text


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy dog"),  # exact dup of 0
        (2, "dog lazy the over jumps fox brown quick the"),  # permuted dup of 0
        (3, "a completely different document about spark engines"),
        (4, "the quick brown fox jumps over the lazy cat"),  # near dup of 0
        (5, "Spark engines process data. Spark engines are fast!"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup_groups(docs):
    out = dedup.exact_dedup_groups(docs, "text", "doc_id")
    groups = {r.keep_id: r.dup_count for r in out.collect()}
    assert groups[0] == 2  # docs 0 and 1
    assert sum(groups.values()) == 6


def test_tokenset_dedup_catches_permutations(docs):
    out = dedup.tokenset_dedup_groups(docs, "text", "doc_id")
    groups = {r.keep_id: r.dup_count for r in out.collect()}
    assert groups[0] == 3  # 0, 1 (exact) and 2 (permuted)


def test_minhash_finds_near_duplicates(docs):
    pairs = dedup.minhash_near_duplicates(
        docs, "text", "doc_id", num_hashes=64, bands=32, jaccard_threshold=0.5
    )
    got = {(r.id_a, r.id_b): r.jaccard for r in pairs.collect()}
    assert got[(0, 1)] == 1.0
    assert got[(0, 2)] == 1.0  # permutation: token-set jaccard 1.0
    assert (0, 4) in got  # 8/10 shared tokens
    assert got[(0, 4)] >= 0.5
    assert (0, 3) not in got


def test_window_spans_cache_released(spark, docs):
    """r12: the ExactSubstr window table is persisted (it feeds both
    the frequency aggregate and the join-back) and must be released
    with the result — same release_on_gc lifecycle as minhash."""
    import gc

    def persistent_ids():
        m = spark.sparkContext._jsc.getPersistentRDDs()
        return {int(k) for k in m.keySet().toArray()}

    before = persistent_ids()
    spans = dedup.duplicated_window_spans(
        docs, "text", "doc_id", window=3
    )
    spans.count()
    assert len(persistent_ids() - before) == 1  # wins cache live
    del spans
    gc.collect()
    leaked = persistent_ids() - before
    assert not leaked, f"cached RDDs leaked by window spans: {leaked}"


def test_minhash_verify_routes_agree(docs):
    """r12: the python-kernel verify (broadcast frozensets, default at
    small rep-table sizes) and the JVM join verify (forced via
    broadcast_bytes_limit=0, the at-scale route) must emit identical
    pairs AND identical raw-double jaccards — the exact-equality
    contract the recall-1 grading config rides on. Also pins the size
    prefilter in the candidate join: it may only drop pairs that can
    never reach the threshold, so route outputs stay equal."""
    kw = dict(num_hashes=64, bands=32, jaccard_threshold=0.5,
              round_digits=None)
    py = dedup.minhash_near_duplicates(docs, "text", "doc_id", **kw)
    jvm = dedup.minhash_near_duplicates(
        docs, "text", "doc_id", broadcast_bytes_limit=0, **kw
    )
    got_py = sorted(tuple(r) for r in py.collect())
    got_jvm = sorted(tuple(r) for r in jvm.collect())
    assert got_py == got_jvm
    assert len(got_py) > 0


def test_minhash_leaves_no_cached_rdds(spark, docs):
    """Regression (r5): minhash persisted two intermediates and never
    unpersisted — every call leaked cached tables for the life of the
    session. release_on_gc now unpersists them the moment the caller
    drops the result (deterministic under CPython refcounting)."""
    import gc

    def persistent_ids():
        m = spark.sparkContext._jsc.getPersistentRDDs()
        return {int(k) for k in m.keySet().toArray()}

    before = persistent_ids()
    pairs = dedup.minhash_near_duplicates(
        docs, "text", "doc_id", num_hashes=64, bands=32
    )
    assert pairs.count() > 0  # materialize the output
    assert len(persistent_ids() - before) == 2  # both caches live
    del pairs
    gc.collect()
    leaked = persistent_ids() - before
    assert not leaked, f"cached RDDs leaked by minhash: {leaked}"


def test_minhash_jaccard_estimate_close_to_exact(docs):
    """Property: signature agreement ≈ true Jaccard (within MC error)."""
    sigs = dedup.minhash_signatures(docs, "text", "doc_id", num_hashes=128)
    s = {r.doc_id: r.signature for r in sigs.collect()}
    est = np.mean([a == b for a, b in zip(s[0], s[4])])
    assert abs(est - 8 / 10) < 0.15


def test_ngram_jaccard_inverted_index(docs):
    pairs = dedup.ngram_jaccard_pairs(
        docs, "text", "doc_id", n=3, jaccard_threshold=0.6
    )
    got = {(r.id_a, r.id_b): r.jaccard for r in pairs.collect()}
    assert got[(0, 1)] == 1.0  # identical text → identical shingle set
    assert (0, 4) in got  # fox/cat near-dup shares most 3-grams
    assert (0, 3) not in got  # unrelated doc below threshold


def test_simhash_identical_and_distinct(docs):
    out = {r.doc_id: r.simhash for r in dedup.simhash(docs, "text", "doc_id").collect()}
    assert out[0] == out[1]  # identical text → identical fingerprint
    assert out[0] == out[2]  # simhash is order-invariant over tokens
    h04 = bin(out[0] ^ out[4]).count("1")
    h03 = bin(out[0] ^ out[3]).count("1")
    assert h04 < h03  # near-dup closer than unrelated doc


def test_simhash_near_duplicate_pairs(docs):
    pairs = dedup.simhash_near_duplicates(docs, "text", "doc_id", max_hamming=8)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert (0, 1) in got and (0, 2) in got


@pytest.fixture(scope="module")
def vectors(spark):
    rng = np.random.default_rng(7)
    base = rng.standard_normal(16)
    rows = []
    for i in range(50):
        if i < 5:  # 5 vectors strongly aligned with base
            v = base + 0.1 * rng.standard_normal(16)
        else:
            v = rng.standard_normal(16)
        rows.append((i, [float(x) for x in v]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>"), base


def test_cosine_topk_matches_numpy(vectors):
    df, base = vectors
    q = [float(x) for x in base]
    got = similarity.cosine_topk(df, "embedding", "vec_id", q, k=5)
    got_ids = [r.vec_id for r in got.collect()]

    rows = df.collect()
    emb = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in rows}
    qv = np.array(q)
    scores = {
        i: float(v @ qv / (np.linalg.norm(v) * np.linalg.norm(qv)))
        for i, v in emb.items()
    }
    want_ids = [i for i, _ in sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))][:5]
    assert got_ids == want_ids
    assert set(got_ids) == {0, 1, 2, 3, 4}  # the planted cluster


def test_ann_lsh_topk_high_recall_on_planted_cluster(vectors):
    df, base = vectors
    q = [float(x) for x in base]
    got = similarity.ann_lsh_topk(
        df, "embedding", "vec_id", q, k=5, num_planes=6, multiprobe_hamming=2
    )
    ids = {r.vec_id for r in got.collect()}
    # planted near-neighbors share the query's halfspaces → found by probe
    assert len(ids & {0, 1, 2, 3, 4}) >= 4


def test_cosine_pairs_lsh_subset_of_exact(vectors):
    df, _ = vectors
    exact = {
        (r.id_a, r.id_b)
        for r in similarity.cosine_pairs_exact(
            df, "embedding", "vec_id", 0.8
        ).collect()
    }
    lsh = {
        (r.id_a, r.id_b)
        for r in similarity.cosine_pairs_lsh(
            df, "embedding", "vec_id", 0.8, num_planes=4, num_tables=8
        ).collect()
    }
    assert lsh <= exact  # LSH verified pairs are never false positives
    # multi-table recall: 1-(1-p^H)^L ≈ 0.98 at t=0.8, H=4, L=8
    assert len(lsh) >= int(0.7 * len(exact))


def test_cosine_pairs_lsh_driver_route_parity(vectors):
    """The driver fast path (driver_pairs_max gate) must emit exactly
    the distributed broadcast route's pairs AND scores — same planes,
    sign rule, unordered-pair dedup, einsum/np.round scoring."""
    df, _ = vectors
    kw = dict(threshold=0.3, num_planes=4, num_tables=8)
    fast = {
        (r.id_a, r.id_b): r.score
        for r in similarity.cosine_pairs_lsh(
            df, "embedding", "vec_id", **kw
        ).collect()
    }
    dist = {
        (r.id_a, r.id_b): r.score
        for r in similarity.cosine_pairs_lsh(
            df, "embedding", "vec_id", driver_pairs_max=0, **kw
        ).collect()
    }
    assert fast == dist  # exact equality incl. float scores
    assert len(fast) > 0


def test_text_stats_hand_checked(spark):
    df = spark.createDataFrame(
        [(1, "The quick fox. It jumps!")], "doc_id long, text string"
    )
    r = text.text_stats(df, "text", "doc_id").collect()[0]
    assert r.n_chars_calc == 24
    assert r.n_tokens == 5
    assert r.n_punct == 2  # '.' and '!'
    assert r.n_stopwords == 2  # 'the', 'it'


def test_bpe_token_count(spark):
    df = spark.createDataFrame([(1, "ab12 cd!")], "doc_id long, text string")
    out = df.select(text.bpe_token_count(F.col("text")).alias("n")).collect()
    assert out[0].n == 4  # ab | 12 | cd | !


def test_language_id_heuristic(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat is on the mat and it is happy"),
            (2, "der hund ist nicht ein katze und das ist gut"),
            (3, "el gato es un animal y la casa es grande"),
            (4, "xyzzy qwerty plugh"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.detected_lang for r in text.language_id(df, "text", "doc_id").collect()}
    assert got[1] == "en"
    assert got[2] == "de"
    assert got[3] == "es"
    assert got[4] == "und"


def test_fingerprint_stable_under_whitespace(spark):
    df = spark.createDataFrame(
        [(1, "hello   world"), (2, "Hello world "), (3, "other")],
        "doc_id long, text string",
    )
    fp = {r.doc_id: r.fp_md5 for r in text.fingerprint(df, "text", "doc_id").collect()}
    assert fp[1] == fp[2]  # normalization collapses case/whitespace
    assert fp[1] != fp[3]


def test_quality_score_ordering(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat sat on the mat and it was a good day for all of us " * 4),
            (2, "x"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.quality_score for r in text.quality_score(df, "text", "doc_id").collect()}
    assert got[1] > got[2]  # long stopword-bearing prose beats one char


def test_ngram_contamination_ground_truth(spark):
    """Hand-built corpus with known 4-gram overlap: exactly the
    contaminated docs surface, with exact shared-gram counts."""
    from data_lakehouse_project_spark.ext.dedup import ngram_contamination

    bench = spark.createDataFrame(
        [("b1", "the quick brown fox jumps over the lazy dog")],
        "doc_id string, text string",
    )
    train = spark.createDataFrame(
        [
            # contains "the quick brown fox" and "quick brown fox jumps"
            ("t1", "watch the quick brown fox jumps far away"),
            # no 4-gram overlap
            ("t2", "a completely different sentence entirely here"),
            # too short for any 4-gram
            ("t3", "quick brown fox"),
        ],
        "doc_id string, text string",
    )
    rows = {
        r.doc_id: r
        for r in ngram_contamination(train, bench, n=4).collect()
    }
    assert set(rows) == {"t1"}
    assert rows["t1"].shared_grams == 2
    assert rows["t1"].bench_docs == 1


def test_incremental_dedup_verdicts(spark):
    """Exact beats near; best near match wins; untouched docs are unique;
    old-old duplicates never appear in the report."""
    old = spark.createDataFrame(
        [
            (10, "the quick brown fox jumps over the lazy dog"),
            (11, "the quick brown fox jumps over the lazy dog"),  # old-old dup
            (12, "entirely unrelated corpus text about databases"),
        ],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            (20, "THE QUICK  brown fox jumps over the lazy dog"),  # exact (normalized)
            (21, "the quick brown fox jumps over the lazy cat"),  # near of 10/11
            (22, "completely novel content never seen before"),  # unique
        ],
        "doc_id long, text string",
    )
    rows = {
        r.doc_id: r
        for r in dedup.incremental_dedup_report(
            old, new, "text", "doc_id", n=3, jaccard_threshold=0.5
        ).collect()
    }
    assert set(rows) == {20, 21, 22}  # one verdict per NEW doc only
    assert rows[20].kind == "exact" and rows[20].match_id == 10
    assert rows[20].jaccard == 1.0
    assert rows[21].kind == "near" and rows[21].match_id in (10, 11)
    assert 0.5 <= rows[21].jaccard < 1.0
    assert rows[22].kind == "unique"
    assert rows[22].match_id is None and rows[22].jaccard is None


def test_minhash_recall1_config_equals_exact_jaccard(spark, testdata):
    """The round-3 grading invariant: at R=1 banding (bands=num_hashes)
    with round_digits=None, minhash_near_duplicates output EQUALS the
    exact O(n^2) Jaccard pair set — LSH only loses candidates (miss
    prob <= (1-j)^64 per true pair) and the exact-verify stage admits
    nothing below threshold, so the sets coincide on real data."""
    docs = testdata["documents"]
    lsh = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup.minhash_near_duplicates(
            docs, "text", "doc_id",
            num_hashes=64, bands=64, jaccard_threshold=0.7, round_digits=None,
        ).collect()
    }
    tok = docs.select(
        "doc_id", F.array_distinct(dedup.tokens(F.col("text"))).alias("u")
    )
    a = tok.select(F.col("doc_id").alias("id_a"), F.col("u").alias("ua"))
    b = tok.select(F.col("doc_id").alias("id_b"), F.col("u").alias("ub"))
    inter = F.size(F.array_intersect("ua", "ub"))
    union = F.size("ua") + F.size("ub") - inter
    exact = {
        (r.id_a, r.id_b): r.jaccard
        for r in a.join(b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", (inter / union).alias("jaccard"))
        .where(F.col("jaccard") >= 0.7)
        .collect()
    }
    assert lsh == exact  # keys AND double values bit-identical


# ---------------------------------------------------------------- exactsubstr
def test_duplicated_window_spans_detects_shared_run(spark):
    # docs 1 and 2 share an 10-token run; doc 3 shares nothing; doc 4
    # repeats a window WITHIN itself (paper semantics: also duplicated)
    shared = "one two three four five six seven eight nine ten"
    rows = [
        (1, f"intro words {shared} tail a"),
        (2, f"{shared} other ending entirely"),
        (3, "completely unrelated text with no repeated window at all here"),
        (4, "p q r s t u v w x p q r s t u v w x"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in dedup.duplicated_window_spans(
            df, "text", "doc_id", window=8
        ).collect()
    }
    assert set(out) == {1, 2, 4}
    # doc 1: shared run covers tokens 3..12 of 14
    assert out[1]["n_dup_spans"] == 1
    assert out[1]["dup_tokens"] == 10
    assert out[2]["dup_tokens"] == 10
    # doc 4: both 9-token halves repeat => one merged span of all 18
    assert out[4]["dup_tokens"] == 18
    assert out[4]["max_span_tokens"] == 18


def test_duplicated_window_spans_span_mode_and_merge(spark):
    shared = " ".join(f"w{i}" for i in range(12))
    rows = [
        (1, f"{shared} g1 g2 g3 g4 g5 g6 g7 g8 g9 {shared}"),
        (2, f"{shared} x"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    spans = dedup.duplicated_window_spans(
        df, "text", "doc_id", window=8, summary=False
    )
    d1 = sorted(
        (r["span_start"], r["span_end"])
        for r in spans.where(F.col("doc_id") == 1).collect()
    )
    # two islands in doc 1 (the gap run appears once => not duplicated)
    assert d1 == [(1, 12), (22, 33)]


def test_duplicated_window_spans_stride_is_content_defined(spark):
    # content-defined sampling (whash % stride == 0) picks the SAME
    # windows in both copies even at different offsets — arithmetic
    # every-k-th-start sampling would see disjoint windows here.
    # 40-token run => 33 windows; P(all miss) = 0.75^33 ~ 8e-5, and the
    # outcome is deterministic for these fixed strings.
    shared = " ".join(f"s{i}" for i in range(40))
    rows = [
        (1, f"a b c {shared}"),
        (2, f"{shared} y z"),
        (3, "nothing shared in this one at all honestly speaking"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = dedup.duplicated_window_spans(
        df, "text", "doc_id", window=8, stride=4
    )
    assert {r["doc_id"] for r in out.collect()} == {1, 2}


def test_trim_duplicated_spans_cuts_boilerplate_everywhere(spark):
    shared = "one two three four five six seven eight nine ten"
    rows = [
        (1, f"keep this {shared} and this"),
        (2, f"{shared} unique tail here"),
        (3, "nothing duplicated in this document at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.doc_id: r
        for r in dedup.trim_duplicated_spans(
            df, "text", "doc_id", window=8
        ).collect()
    }
    assert out[1]["text"] == "keep this and this"
    assert out[2]["text"] == "unique tail here"
    assert out[1]["n_tokens_removed"] == out[2]["n_tokens_removed"] == 10
    # untouched doc: ORIGINAL text verbatim, zero removed
    assert out[3]["text"] == "nothing duplicated in this document at all"
    assert out[3]["n_tokens_removed"] == 0


def test_trim_duplicated_spans_plan_has_no_python(spark):
    """The rewrite must stay in JVM HOFs — no BatchEvalPython stage."""
    df = spark.createDataFrame(
        [(1, "a b c d e f g h i j"), (2, "a b c d e f g h i j")],
        "doc_id long, text string",
    )
    plan = (
        dedup.trim_duplicated_spans(df, "text", "doc_id", window=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "PythonUDF" not in plan


def test_trim_keep_one_preserves_exactly_one_copy(spark):
    shared = "one two three four five six seven eight nine ten"
    rows = [
        (1, f"{shared} alpha beta"),
        (2, f"{shared} gamma delta"),
        (3, "p q r s t u v w x p q r s t u v w x"),
        (4, "totally unique content sits right here unharmed today"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.doc_id: r
        for r in dedup.trim_duplicated_spans_keep_one(
            df, "text", "doc_id", window=8
        ).collect()
    }
    # canonical (lowest doc_id) occurrence keeps the shared run verbatim
    assert out[1]["text"] == f"{shared} alpha beta"
    assert out[1]["n_tokens_removed"] == 0
    # the other copy is cut
    assert out[2]["text"] == "gamma delta"
    assert out[2]["n_tokens_removed"] == 10
    # within-doc repeat: first occurrence survives, second is cut
    assert out[3]["text"] == "p q r s t u v w x"
    assert out[3]["n_tokens_removed"] == 9
    # untouched doc passes through verbatim
    assert out[4]["n_tokens_removed"] == 0
    # corpus-wide: at least one copy of the shared content survives
    alltext = " ".join(out[i]["text"] for i in out)
    assert shared in alltext


# ------------------------------------------------------ hybrid retrieval
def test_rrf_fuse_hand_computed(spark):
    from data_lakehouse_project_spark.ext.retrieval import rrf_fuse

    lex = spark.createDataFrame(
        [(1, 9.0), (2, 5.0), (3, 1.0)], "doc_id long, score double"
    )
    dense = spark.createDataFrame(
        [(2, 0.9), (4, 0.8)], "vec_id long, score double"
    )
    out = {
        r.item_id: r
        for r in rrf_fuse(
            [(lex, "doc_id", "score"), (dense, "vec_id", "score")], k=60
        ).collect()
    }
    # item 2: rank 2 lexically + rank 1 dense -> 1/62 + 1/61
    assert abs(out[2]["rrf_score"] - round(1 / 62 + 1 / 61, 6)) < 1e-9
    assert out[2]["n_lists"] == 2
    # single-list items keep their lone contribution
    assert abs(out[1]["rrf_score"] - round(1 / 61, 6)) < 2e-6
    assert abs(out[4]["rrf_score"] - round(1 / 62, 6)) < 2e-6
    # the doubly-ranked item wins the fusion
    top = sorted(out.values(), key=lambda r: -r["rrf_score"])[0]
    assert top["item_id"] == 2


def test_rrf_fuse_deterministic_tiebreak(spark):
    from data_lakehouse_project_spark.ext.retrieval import rrf_fuse

    # equal scores: rank order must fall back to id (engine-stable)
    df = spark.createDataFrame(
        [(5, 1.0), (3, 1.0), (9, 1.0)], "doc_id long, score double"
    )
    out = rrf_fuse([(df, "doc_id", "score")], k=60).collect()
    by_rankscore = [r.item_id for r in out]
    assert by_rankscore == [3, 5, 9]  # rrf desc == rank asc == id asc


# ------------------------------------------------------ bigram LM filter
def test_bigram_xentropy_hand_computed(spark):
    """Tiny corpus where the interpolated LM is computable by hand:
    docs 'a b a' and 'b a' -> c12={(a,b):1,(b,a):2}, heads={a:1,b:2},
    unigrams={a:3,b:2,solo:1}, N=6 (the singleton doc contributes to
    the backoff LM even though it has no transitions of its own)."""
    import math

    from data_lakehouse_project_spark.ext.text import bigram_xentropy

    df = spark.createDataFrame(
        [(1, "a b a"), (2, "b a"), (3, "solo")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in bigram_xentropy(df, "text", "doc_id").collect()}
    p_ab = 0.7 * 1 / 1 + 0.3 * 2 / 6  # p(b|a) = lam*c12/c1 + (1-lam)*cu(b)/N
    p_ba = 0.7 * 2 / 2 + 0.3 * 3 / 6  # p(a|b)
    exp1 = -(math.log(p_ab) + math.log(p_ba)) / 2
    exp2 = -math.log(p_ba)
    assert abs(out[1]["bigram_xent"] - exp1) < 1e-5
    assert out[1]["n_bigrams"] == 2
    assert abs(out[2]["bigram_xent"] - exp2) < 1e-5
    # single-token doc has no transitions: excluded, not scored as 0
    assert 3 not in out


# -------------------------------------------------- prefix-filter join
def test_jaccard_prefix_equals_quadratic_anchor(spark):
    """PPJoin-style prefix filtering must reproduce the O(n²) BNLJ
    pair set EXACTLY — ids and jaccard values — including permuted
    near-copies (same token set, different order → jaccard 1.0 via the
    collapse path) and partial overlaps that straddle the threshold."""
    import random

    from data_lakehouse_project_spark.ext.dedup import jaccard_pairs_prefix

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(60)]
    rows = []
    for d in range(80):
        toks = rng.sample(vocab, rng.randint(5, 25))
        rows.append((d, " ".join(toks)))
        if d % 7 == 0:  # permuted copy: identical token SET
            shuffled = toks[:]
            rng.shuffle(shuffled)
            rows.append((d + 1000, " ".join(shuffled)))
    df = spark.createDataFrame(rows, "doc_id long, text string")

    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in jaccard_pairs_prefix(df, "text", "doc_id", 0.7).collect()
    }

    tok = df.select(
        "doc_id",
        F.array_distinct(F.split(F.lower(F.trim("text")), " ")).alias("u"),
    )
    a = tok.select(F.col("doc_id").alias("id_a"), F.col("u").alias("ua"))
    b = tok.select(F.col("doc_id").alias("id_b"), F.col("u").alias("ub"))
    inter = F.size(F.array_intersect("ua", "ub"))
    union = F.size("ua") + F.size("ub") - inter
    want = {
        (r.id_a, r.id_b): r.jaccard
        for r in a.join(b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", (inter / union).alias("jaccard"))
        .where(F.col("jaccard") >= 0.7)
        .collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k] == want[k]
    # the permuted copies must be found at exactly 1.0
    assert any(v == 1.0 for v in got.values())


def test_jaccard_prefix_plan_is_equi_join(spark):
    from data_lakehouse_project_spark.ext.dedup import jaccard_pairs_prefix

    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c d f"), (3, "x y z")],
        "doc_id long, text string",
    )
    plan = (
        jaccard_pairs_prefix(df, "text", "doc_id", 0.7)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
