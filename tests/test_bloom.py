"""Bloom-filter membership index (ext/bloom.py): no false negatives,
bounded false positives, lossless mergeability, map-side probe plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_lakehouse_project_spark.ext.bloom import (
    bloom_build,
    bloom_fpr,
    bloom_merge,
    bloom_probe,
)

BITS = 1 << 16
K = 5


def _keys(spark, lo, hi, prefix="doc"):
    return spark.range(lo, hi).select(
        F.concat(F.lit(prefix), F.col("id")).alias("fp")
    )


def test_no_false_negatives_and_bounded_fpr(spark):
    members = _keys(spark, 0, 2000)
    bloom = bloom_build(members, "fp", BITS, K)

    probed = bloom_probe(members, "fp", bloom, BITS, K)
    assert probed.where("NOT maybe_member").count() == 0  # never FN

    outsiders = _keys(spark, 0, 20000, prefix="other")
    fp = bloom_probe(outsiders, "fp", bloom, BITS, K).where(
        "maybe_member"
    ).count()
    bound = bloom_fpr(BITS, K, 2000)
    # generous 3x slack over theory keeps this deterministic-in-practice
    assert fp / 20000 < max(3 * bound, 0.02), (fp, bound)


def test_merge_equals_build_of_union(spark):
    a, b = _keys(spark, 0, 500), _keys(spark, 500, 1000)
    merged = bloom_merge(
        bloom_build(a, "fp", BITS, K), bloom_build(b, "fp", BITS, K)
    )
    direct = bloom_build(a.unionAll(b), "fp", BITS, K)

    def lanes(df):  # packed map -> comparable (blk, lane, bits) rows
        return df.select(
            "blk", F.explode("lanes").alias("lane", "bits")
        )

    diff = (
        lanes(merged).alias("m")
        .join(lanes(direct).alias("d"), ["blk", "lane"], "full")
        .where("m.bits IS DISTINCT FROM d.bits")
    )
    assert diff.count() == 0  # bit-identical filters

    # merged filter admits everything either side indexed
    probed = bloom_probe(a.unionAll(b), "fp", merged, BITS, K)
    assert probed.where("NOT maybe_member").count() == 0


def test_filter_is_bounded_and_probe_is_broadcast(spark):
    from data_lakehouse_project_spark.ext.bloom import BITS_PER_BLOCK

    bloom = bloom_build(_keys(spark, 0, 50000), "fp", BITS, K)
    # packed layout: fixed row bound regardless of input size
    assert bloom.count() <= BITS // BITS_PER_BLOCK

    plan = bloom_probe(
        _keys(spark, 0, 100), "fp", bloom, BITS, K
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # filter side broadcast, map-side probe


def test_admission_prefilter_routes_only_maybes_to_exact_check(spark):
    """The intended composition: bloom says 'definitely new' map-side;
    only maybe-members reach the exact (expensive) fingerprint join."""
    corpus = _keys(spark, 0, 1000)
    batch = _keys(spark, 900, 1100)  # 100 dups, 100 novel
    bloom = bloom_build(corpus, "fp", BITS, K)

    flagged = bloom_probe(batch, "fp", bloom, BITS, K)
    definite_new = flagged.where("NOT maybe_member")
    maybes = flagged.where("maybe_member").select("fp")
    confirmed_dup = maybes.join(corpus, "fp", "semi")

    # exactness restored end-to-end: dup set is exactly the overlap
    dups = sorted(r.fp for r in confirmed_dup.collect())
    assert dups == sorted(f"doc{i}" for i in range(900, 1000))
    # and the bloom pass never sent a true duplicate to definite_new
    assert definite_new.join(corpus, "fp", "semi").count() == 0
