"""Deterministic hash sampling invariants (ext/sampling.py) — the
properties that make it training-pipeline-grade, none of which hold for
seed-based random sampling:

- determinism across reruns AND partitionings
- rate monotonicity: the 1% sample is a subset of the 2% sample
- train/eval split partitions the data with no overlap
- stratified rates land near their targets per stratum
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_lakehouse_project_spark.ext.sampling import (
    hash_bucket,
    hash_sample,
    split_column,
    stratified_hash_sample,
    temperature_mix_report,
)


def _docs(spark, n=2000):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("src"), (F.col("id") % 4)).alias("source"),
    )


def test_sample_deterministic_and_partition_independent(spark):
    df = _docs(spark)
    a = {r.doc_id for r in hash_sample(df.repartition(1), "doc_id", 0.3).collect()}
    b = {r.doc_id for r in hash_sample(df.repartition(13), "doc_id", 0.3).collect()}
    assert a == b and 0.2 < len(a) / 2000 < 0.4


def test_rate_monotone_subset(spark):
    df = _docs(spark)
    s1 = {r.doc_id for r in hash_sample(df, "doc_id", 0.1).collect()}
    s2 = {r.doc_id for r in hash_sample(df, "doc_id", 0.2).collect()}
    assert s1 < s2  # strictly grows, never swaps members


def test_train_eval_split_is_a_partition(spark):
    df = _docs(spark).withColumn("split", split_column(F.col("doc_id"), 0.25))
    counts = dict(df.groupBy("split").count().collect())
    assert set(counts) == {"train", "eval"}
    assert counts["train"] + counts["eval"] == 2000
    assert 0.15 < counts["eval"] / 2000 < 0.35


def test_stratified_rates_apply_per_stratum(spark):
    df = _docs(spark)
    out = stratified_hash_sample(
        df, "doc_id", "source", rates={"src0": 1.0, "src1": 0.0}, default_rate=0.5
    )
    got = dict(out.groupBy("source").count().collect())
    assert got["src0"] == 500  # 100% kept
    assert "src1" not in got  # 0% kept
    for s in ("src2", "src3"):
        assert 0.3 < got[s] / 500 < 0.7


def test_bucket_range(spark):
    df = _docs(spark, 500).select(hash_bucket(F.col("doc_id")).alias("b"))
    mn, mx = df.agg(F.min("b"), F.max("b")).first()
    assert 0 <= mn and mx < 10_000


def test_temperature_mix_flattens_toward_uniform(spark):
    """alpha=0 is uniform, alpha=1 is natural proportions; 0<alpha<1
    up-weights small strata relative to their natural share. Weights
    always sum to 1; a stratum's sample_rate caps at 1."""
    df = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        # skewed strata: 800 / 150 / 50
        F.when(F.col("id") < 800, "big")
        .when(F.col("id") < 950, "mid")
        .otherwise("small")
        .alias("source"),
    )
    by_alpha = {
        a: {r.stratum: r for r in
            temperature_mix_report(df, "source", alpha=a).collect()}
        for a in (0.0, 0.5, 1.0)
    }
    for a, rows in by_alpha.items():
        assert abs(sum(r.weight for r in rows.values()) - 1.0) < 1e-5, a
        for r in rows.values():
            assert r.sample_rate <= 1.0
    assert abs(by_alpha[0.0]["small"].weight - 1 / 3) < 1e-5
    assert abs(by_alpha[1.0]["small"].weight - 0.05) < 1e-5
    assert 0.05 < by_alpha[0.5]["small"].weight < 1 / 3
    # at alpha=1 every stratum's implied rate is exactly 1 (natural mix)
    assert all(
        abs(r.sample_rate - 1.0) < 1e-5 for r in by_alpha[1.0].values()
    )


def test_cap_per_group_exact_and_monotone(spark):
    from data_lakehouse_project_spark.ext.sampling import cap_per_group

    df = spark.range(300).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("s"), (F.col("id") % 7).cast("string")).alias("source"),
    )
    kept10 = cap_per_group(df, "source", "doc_id", 10)
    counts = {r.source: r.n for r in
              kept10.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert all(n == 10 for n in counts.values())
    # deterministic under repartitioning
    again = {r.doc_id for r in
             cap_per_group(df.repartition(13), "source", "doc_id", 10).collect()}
    assert {r.doc_id for r in kept10.collect()} == again
    # a lower cap keeps a subset of a higher cap's selection
    kept5 = {r.doc_id for r in cap_per_group(df, "source", "doc_id", 5).collect()}
    assert kept5 < again and len(kept5) == 35


def test_cap_per_group_hash_approximate(spark):
    from data_lakehouse_project_spark.ext.sampling import cap_per_group_hash

    df = spark.range(2000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("s"), (F.col("id") % 4).cast("string")).alias("source"),
    )
    kept = cap_per_group_hash(df, "source", "doc_id", 100)  # 100 of 500 each
    counts = {r.source: r.n for r in
              kept.groupBy("source").agg(F.count("*").alias("n")).collect()}
    for s, n in counts.items():
        assert 50 <= n <= 160, (s, n)  # ~binomial(500, 0.2) jitter band
    # map-only filter: selection is a subset and deterministic
    again = {r.doc_id for r in
             cap_per_group_hash(df.repartition(9), "source", "doc_id", 100).collect()}
    assert {r.doc_id for r in kept.collect()} == again


def test_cap_per_group_hash_hot_group_never_empty(spark):
    """Regression: cap*BUCKETS/n < 1 used to floor the cutoff to 0 and
    silently drop the ENTIRE hot group — exactly the case this function
    exists for. The ceil-clamped cutoff keeps one bucket (~n/BUCKETS
    rows), overshooting the cap rather than vanishing."""
    from data_lakehouse_project_spark.ext.sampling import BUCKETS, cap_per_group_hash

    n = 5 * BUCKETS  # 50k rows in one group; cap=1 → raw cutoff 0.2
    df = spark.range(n).select(
        F.col("id").alias("doc_id"), F.lit("hot").alias("source")
    )
    kept = cap_per_group_hash(df, "source", "doc_id", 1).count()
    assert 1 <= kept <= 30, kept  # one bucket ≈ n/BUCKETS = 5 rows


def test_token_budget_selection_respects_budget(spark):
    from data_lakehouse_project_spark.ext.sampling import token_budget_selection

    df = spark.createDataFrame(
        [
            (1, "a", "one two three four"),          # 4 tokens
            (2, "a", "one two three"),               # 3
            (3, "a", "one two"),                     # 2
            (4, "b", "x " * 50),                     # 50 tokens, alone over budget? no, 50>9 → excluded
            (5, "b", "just five tokens in here"),    # 5
        ],
        "doc_id long, source string, text string",
    )
    out = {r.source: r for r in
           token_budget_selection(df, "text", "doc_id", "source", 9).collect()}
    # group a: 4 + 3 = 7 <= 9, adding the 2-token doc would hit exactly 9 → kept
    assert (out["a"].docs_kept, out["a"].tokens_kept) == (3, 9)
    # group b: longest doc (50) already exceeds the budget → only the 5-token doc... 
    # ordering is longest-first, so cum=50 > 9 excludes it AND cum for next = 55 > 9
    assert "b" not in out


def test_ngram_novelty_bounds_and_uniqueness(spark):
    from data_lakehouse_project_spark.ext.text import ngram_novelty

    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),     # shares grams with doc 2
            (2, "alpha beta gamma epsilon"),
            (3, "zeta eta theta iota kappa"),  # fully unique grams
            (4, "hi"),                         # < n tokens → excluded
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in ngram_novelty(df, "text", "doc_id", n=3).collect()}
    assert set(out) == {1, 2, 3}
    assert out[3].novel_frac == 1.0
    # doc1: grams {alpha beta gamma, beta gamma delta} — first shared → 0.5
    assert out[1].n_grams == 2 and out[1].novel_frac == 0.5
    assert all(0.0 <= r.novel_frac <= 1.0 for r in out.values())


def test_weighted_sample_without_replacement_properties(spark):
    """A-ES weighted sampling: per-group size cap, no duplicates,
    ineligible weights excluded, dominant weight always selected, and
    bit-for-bit determinism across invocations."""
    from data_lakehouse_project_spark.ext.sampling import weighted_sample

    rows = [(i, "s" + str(i % 2), float(1 + i % 7)) for i in range(200)]
    rows.append((999, "s0", 1e9))  # dominant weight
    rows.append((998, "s0", 0.0))  # ineligible
    rows.append((997, "s1", -3.0))  # ineligible
    df = spark.createDataFrame(rows, "doc_id long, source string, w double")

    out = weighted_sample(df, "doc_id", "w", 15, ["source"])
    got = [(r.source, r.doc_id) for r in out.collect()]
    per_group: dict = {}
    for s, d in got:
        per_group.setdefault(s, []).append(d)
    assert all(len(v) == 15 for v in per_group.values())
    assert all(len(set(v)) == len(v) for v in per_group.values())
    assert 999 in per_group["s0"]  # key = ln(u)/1e9 ~ 0 beats everything
    assert 998 not in per_group["s0"] and 997 not in per_group["s1"]

    again = weighted_sample(df, "doc_id", "w", 15, ["source"])
    assert sorted(got) == sorted(
        (r.source, r.doc_id) for r in again.collect()
    )


def test_weighted_sample_prefers_heavy_rows(spark):
    """Statistical sanity on the deterministic keys: rows with weight 10
    must be selected far more often than weight-1 rows when both
    populations are large and k covers a minority."""
    from pyspark.sql import functions as F

    from data_lakehouse_project_spark.ext.sampling import weighted_sample

    rows = [(i, 10.0 if i < 500 else 1.0) for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    picked = weighted_sample(df, "doc_id", "w", 200, None)
    heavy = picked.where("w = 10.0").count()
    assert heavy > 140  # expectation ~ 190/200; 140 is a safe floor


def test_token_budget_skip_fills_past_oversized_docs(spark):
    """The knapsack-style walk keeps filling where strict
    prefix-truncation stops: a group whose longest doc exceeds the
    budget still spends it on shorter docs."""
    from data_lakehouse_project_spark.ext.sampling import (
        token_budget_selection,
        token_budget_skip_selection,
    )

    rows = [
        # group 'a': 30-token giant + three 4-token docs, budget 10
        (1, "a", "w " * 30),
        (2, "a", "w " * 4),
        (3, "a", "w " * 4),
        (4, "a", "w " * 4),
        # group 'b': plain prefix case, no skipping needed
        (5, "b", "w " * 6),
        (6, "b", "w " * 3),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")

    skip = token_budget_skip_selection(
        df, "text", "doc_id", "source", budget_tokens=10
    )
    got = {(r.source, r.doc_id) for r in skip.collect()}
    # giant (30) skipped; docs 2 and 3 fit (8 ≤ 10); doc 4 would reach
    # 12 → skipped. group b: 6 then 3 both fit.
    assert got == {("a", 2), ("a", 3), ("b", 5), ("b", 6)}

    # strict prefix keeps NOTHING in group 'a' (giant first overflows)
    prefix = {
        r.source: r.docs_kept
        for r in token_budget_selection(
            df, "text", "doc_id", "source", budget_tokens=10
        ).collect()
    }
    assert "a" not in prefix
    assert prefix["b"] == 2

    # invariant: per-group token totals never exceed the budget
    from pyspark.sql import functions as F

    totals = skip.groupBy("source").agg(F.sum("n_tokens").alias("t"))
    assert all(r.t <= 10 for r in totals.collect())


def test_cluster_safe_split_no_leakage(spark):
    """Every near-dup cluster lands wholly in one split; singletons
    reduce to the plain doc-id split."""
    from data_lakehouse_project_spark.ext.sampling import cluster_safe_split

    # 600 docs; docs (3k, 3k+1, 3k+2) clustered for even k, singletons
    # for odd k — cluster_id is the min member per dedup_clusters.
    clusters = spark.range(600).select(
        F.col("id").alias("doc_id"),
        F.when((F.floor(F.col("id") / 3) % 2) == 0, F.floor(F.col("id") / 3) * 3)
        .otherwise(F.col("id"))
        .alias("cluster_id"),
    )
    out = cluster_safe_split(clusters, 0.2)
    # no cluster spans splits
    spans = (
        out.groupBy("cluster_id")
        .agg(F.countDistinct("split").alias("n_splits"))
        .where(F.col("n_splits") > 1)
        .count()
    )
    assert spans == 0
    # both splits populated, eval share in a sane band around 20%
    frac = out.where(F.col("split") == "eval").count() / 600
    assert 0.08 < frac < 0.35
    # singleton clusters match the plain doc-id split exactly
    singles = out.where(F.col("cluster_id") == F.col("doc_id")).select(
        "doc_id", "split"
    )
    plain = clusters.select(
        "doc_id", split_column(F.col("doc_id"), 0.2).alias("split")
    )
    diff = singles.join(plain, "doc_id").where(
        singles.split != plain.split
    )
    assert diff.count() == 0
