"""Scaling probe: do the core plan shapes hold throughput as data grows?

Replicates lineitem N× (union of re-reads, so input bytes actually grow)
and runs three shapes at each multiple:

- **agg**   — TPC-H Q1 pricing-summary scan + partial/final aggregation
- **join**  — fact-fact shuffle join (replicated lineitem ⋈ orders) + agg
- **window**— per-order running sum (partitioned window, no global sort)
- **text**  — corpus scan: normalize → tokenize → explode → term counts
  (the inverted-index build shape every dedup pipeline starts with;
  runs over replicated documents instead of lineitem)

Flat rows/sec across multiples = linear scaling; a falling curve marks a
shuffle or memory cliff. Results recorded in BASELINE.md.

    python tools/scaling_probe.py [sf_dir] [shapes...]
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from data_lakehouse_project_spark import get_spark


def shape_agg(df, orders):
    return (
        df.where(F.col("l_shipdate") <= "1998-09-01")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("sum_disc_price"),
            F.avg("l_extendedprice").alias("avg_price"),
            F.count(F.lit(1)).alias("n"),
        )
    )


def shape_join(df, orders):
    return (
        df.join(orders, df.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


def shape_window(df, orders):
    w = (
        Window.partitionBy("l_orderkey")
        .orderBy("l_linenumber")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return df.select(
        "l_orderkey",
        "l_linenumber",
        F.sum("l_extendedprice").over(w).alias("running_price"),
    )


def shape_text(df, orders):
    from data_lakehouse_project_spark.functions.scalar import normalize_text

    toks = F.split(normalize_text(F.col("text")), " ")
    return (
        df.select(F.explode(toks).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def replicate_union(base, mult):
    """Default replication: union of re-reads, so input bytes grow."""
    return functools.reduce(lambda a, b: a.unionByName(b), [base] * mult)


def replicate_explode(base, mult):
    """Row replication via one explode — keeps the plan small at high
    multiples (a 128-way union tree stresses the analyzer, not the
    engine)."""
    return base.select(
        F.explode(F.array(*[F.lit(i) for i in range(mult)])).alias("_dup"),
        "*",
    ).drop("_dup")


def replicate_universe_docs(base, mult):
    """Documents replicated as `mult` parallel universes: replica i of
    every doc gets token-suffix ``u<i>``, so universes are mutually
    Jaccard-0 while each universe preserves the original corpus's
    similarity structure. Rep count, band buckets, candidates, and true
    pairs all grow exactly mult× — the linear-scaling testbed the raw
    corpus (degenerately self-similar) can't provide. Suffix is
    alphanumeric so normalize_text keeps it."""
    return base.select(
        F.explode(F.array(*[F.lit(i) for i in range(mult)])).alias("u"),
        "doc_id",
        "text",
    ).select(
        (F.col("doc_id") * mult + F.col("u")).alias("doc_id"),
        F.array_join(
            F.transform(
                F.split(F.col("text"), " "),
                lambda t: F.concat(t, F.lit("u"), F.col("u").cast("string")),
            ),
            " ",
        ).alias("text"),
    )


def replicate_skewed_docs(base, mult):
    """Replicated documents with a Zipf-skewed ``domain`` column: domain
    d = BUCKETS // (bucket+1) over the uniform md5 bucket, so domain 1
    holds ~half of ALL rows, domain 2 ~1/6, ... (mass ∝ 1/(d(d+1))) —
    one pathologically hot crawl host plus a power-law tail, fully
    deterministic. Replica ids stay unique so rank/hash caps see real
    per-row identities."""
    from data_lakehouse_project_spark.ext.sampling import BUCKETS, hash_bucket

    rep = base.select(
        F.explode(F.array(*[F.lit(i) for i in range(mult)])).alias("_u"),
        "doc_id",
        "text",
    ).select(
        (F.col("doc_id") * mult + F.col("_u")).alias("doc_id"), "text"
    )
    b = hash_bucket(F.col("doc_id"))
    return rep.withColumn(
        "domain", (F.lit(BUCKETS) / (b + F.lit(1))).cast("long")
    )


def shape_segdedup(df, orders):
    """C4-style segment dedup summary (ext/curation.py): segment
    construction is array expressions (no shuffle), then two
    xxhash64-key shuffles + one id-grain agg. Under universe
    replication the per-universe duplicate structure is preserved, so
    segments, dup groups, and output rows all grow exactly mult×."""
    from data_lakehouse_project_spark.ext.curation import (
        segment_dedup_summary,
    )

    return segment_dedup_summary(df, "text", "doc_id", seg_len=10)


def shape_dsir(df, orders):
    """DSIR importance log-weights (ext/curation.py): token explode →
    1024-bucket agg → broadcast ratio join → id-grain sum. Target slice
    is a deterministic hash bucket of the doc id (~1/8 of rows) so the
    target/raw split survives replication."""
    from data_lakehouse_project_spark.ext.curation import dsir_log_weights
    from data_lakehouse_project_spark.ext.sampling import hash_bucket

    return dsir_log_weights(
        df, "text", "doc_id", hash_bucket(F.col("doc_id"), 8) == 0,
        dim=1024,
    )


def shape_skew_cap_sort(df, orders):
    """Window-rank domain quota — the per-group sort straggles on the
    hot domain; this is the curve the hash variant should flatten."""
    from data_lakehouse_project_spark.ext.sampling import cap_per_group

    return cap_per_group(df, "domain", "doc_id", 100)


def shape_skew_cap_hash(df, orders):
    """No-sort hash-bucket domain quota — map-only after a broadcast of
    per-domain counts; hot domains cost the same as cold ones."""
    from data_lakehouse_project_spark.ext.sampling import cap_per_group_hash

    return cap_per_group_hash(df, "domain", "doc_id", 100)


def shape_skew_rollup_plain(df, orders):
    return df.groupBy("domain").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.length("text")).alias("n_chars"),
    )


def shape_skew_rollup_salted(df, orders):
    from data_lakehouse_project_spark.ext.skew import salted_aggregate

    return salted_aggregate(
        df.withColumn("_len", F.length("text")),
        ["domain"],
        sums={"n_chars": "_len"},
        count_name="n_docs",
    )


def shape_minhash(df, orders):
    """Production MinHash LSH at rep grain (expand=False): collapse →
    band → bucket join → verify. The collapsed output keeps the probe
    compute-bound instead of output-bound."""
    from data_lakehouse_project_spark.ext.dedup import minhash_near_duplicates

    return minhash_near_duplicates(
        df,
        "text",
        "doc_id",
        num_hashes=64,
        bands=16,
        jaccard_threshold=0.7,
        expand=False,
    )


def shape_vector(df, orders):
    # batch-ANN shape: broadcast query matrix, per-batch matmul, tiny
    # top-k shuffle — throughput should track the corpus scan rate
    from data_lakehouse_project_spark.ext.similarity import ann_batch_topk

    queries = [
        (int(r.vec_id), [float(x) for x in r.embedding])
        for r in df.where(F.col("vec_id") < 8)
        .select("vec_id", "embedding")
        .limit(8)
        .collect()
    ]
    return ann_batch_topk(df, "embedding", "vec_id", queries, k=10)


# shape -> (base table, builder, replicate)
SHAPES = {
    "agg": ("lineitem", shape_agg, replicate_union),
    "join": ("lineitem", shape_join, replicate_union),
    "window": ("lineitem", shape_window, replicate_union),
    "text": ("documents", shape_text, replicate_union),
    "vector": ("embeddings", shape_vector, replicate_explode),
    "minhash": ("documents", shape_minhash, replicate_universe_docs),
    "segdedup": ("documents", shape_segdedup, replicate_universe_docs),
    # universe replication (not plain explode) so replica doc_ids stay
    # unique and the id-grain output grows mult× with the input
    "dsir": ("documents", shape_dsir, replicate_universe_docs),
    "skew_cap_sort": ("documents", shape_skew_cap_sort, replicate_skewed_docs),
    "skew_cap_hash": ("documents", shape_skew_cap_hash, replicate_skewed_docs),
    "skew_rollup_plain": (
        "documents", shape_skew_rollup_plain, replicate_skewed_docs,
    ),
    "skew_rollup_salted": (
        "documents", shape_skew_rollup_salted, replicate_skewed_docs,
    ),
}


def run_admit_probe(spark, sf_dir: str, mults: tuple[int, ...]) -> None:
    """Admission membership check, exact-index vs persisted-Bloom, as
    the corpus grows mult× while the arriving batch stays fixed.

    Models the streaming-admission steady state: the fp index / Bloom
    filter are PREBUILT (localCheckpointed outside the timer — in
    production both are persisted tables); the timed region is one
    batch's membership decision. Universe-replicated corpora are
    fp-disjoint from the batch, i.e. the mostly-novel case admission
    control lives in: the exact path must still scan/join the growing
    index; the Bloom path answers from a FIXED-SIZE broadcast bitset,
    and its maybe-sliver join is empty."""
    from data_lakehouse_project_spark.ext.bloom import (
        bloom_build,
        bloom_probe,
    )
    from data_lakehouse_project_spark.functions.scalar import normalize_text

    # sized for the LARGEST corpus probed: 2^27 bits / 5 hashes holds
    # ~5M keys at ~2e-4 FPR and is still only a 16 MiB broadcast — the
    # sizing rule is bits ≈ 16–25× keys (undersizing saturates the
    # filter and silently degrades to the exact path's cost)
    import shutil
    import tempfile

    bits, k = 1 << 27, 5
    base = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    fp = F.md5(normalize_text(F.col("text"))).alias("fp")
    batch = base.select("doc_id", fp).localCheckpoint(eager=True)
    n_batch = batch.count()
    idx_root = tempfile.mkdtemp(prefix="admit_fp_idx_")
    for mult in mults:
        corpus = (
            replicate_universe_docs(base, mult)
            .select(fp)
            .localCheckpoint(eager=True)
        )
        n_corpus = corpus.count()
        # the production index: fp table PARTITIONED by 2-hex-char
        # prefix (256 dirs) — a persisted artifact, built outside the
        # per-batch timer exactly like the Bloom filter
        idx_path = os.path.join(idx_root, f"m{mult}")
        (
            corpus.withColumn("pfx", F.substring("fp", 1, 2))
            .write.mode("overwrite")
            .partitionBy("pfx")
            .parquet(idx_path)
        )

        t0 = time.perf_counter()
        n_dup = batch.join(corpus, "fp", "semi").count()
        t_exact = time.perf_counter() - t0

        bloom = bloom_build(corpus, "fp", bits, k).localCheckpoint(
            eager=True
        )
        t0 = time.perf_counter()
        flagged = bloom_probe(batch, "fp", bloom, bits, k)
        maybes = flagged.where("maybe_member").select(
            "doc_id", "fp"
        ).localCheckpoint(eager=True)
        n_maybe = maybes.count()
        t_probe = time.perf_counter() - t0
        # only the maybe sliver ever touches the index, and through the
        # PARTITIONED layout it reads only the sliver's prefix dirs
        # (collecting <= |maybes| 2-char prefixes is driver-bounded);
        # an empty sliver means zero index IO for the whole batch
        t0 = time.perf_counter()
        if n_maybe:
            pfxs = [
                r.pfx
                for r in maybes.select(
                    F.substring("fp", 1, 2).alias("pfx")
                )
                .distinct()
                .collect()
            ]
            idx = spark.read.parquet(idx_path).where(
                F.col("pfx").isin(pfxs)
            )
            n_confirmed = maybes.join(idx, "fp", "semi").count()
        else:
            n_confirmed = 0
        t_confirm = time.perf_counter() - t0

        assert n_dup == n_confirmed  # no false negatives end to end
        print(
            f"admit    mult={mult:4d} corpus={n_corpus:>11,} "
            f"batch={n_batch} maybes={n_maybe} exact={t_exact:6.2f}s "
            f"probe={t_probe:6.2f}s confirm={t_confirm:6.2f}s",
            flush=True,
        )
    shutil.rmtree(idx_root, ignore_errors=True)


def run_dv_probe(spark, mults: tuple[int, ...]) -> None:
    """Delete-cost scaling: CoW-selective vs deletion-vector DELETE as
    the table grows, against the full-rewrite upper bound.

    Table = ``mult`` files × 100k rows (range-clustered ids so stats
    prune); the delete always matches the SAME 5k rows confined to the
    first file. Expected: full-rewrite wall grows ~linearly with mult;
    file-pruned CoW and DV stay ~flat (their work is O(matched file) /
    O(deleted rows) — the probe includes each mode's find-touched-files
    scan, which IS stats-pruned via the prune hints)."""
    import shutil
    import tempfile

    from data_lakehouse_project_spark.operators.txnlog import TxnTable

    rows_per_file = 100_000
    for mult in mults:
        root = tempfile.mkdtemp(prefix="dvprobe-")
        try:
            results = {}
            for mode in ("full", "cow", "dv"):
                path = os.path.join(root, mode)
                t = TxnTable(path)
                # ~200B payload per row so file IO is the real cost;
                # one range-clustered write → mult disjoint-range files
                t.write(
                    spark.range(0, mult * rows_per_file)
                    .select(
                        F.col("id"),
                        (F.col("id") % 97).alias("v"),
                        F.repeat(F.sha2(F.col("id").cast("string"), 256), 3)
                        .alias("pad"),
                    )
                    .repartitionByRange(mult, "id")
                    .sortWithinPartitions("id"),
                    mode="overwrite",
                )
                t0 = time.perf_counter()
                if mode == "full":
                    # the pre-session behavior: rewrite every file
                    kept = t.read(spark).where("NOT (id < 5000)")
                    t.write(kept, mode="overwrite")
                else:
                    t.delete_where(
                        spark,
                        "id < 5000",
                        prune=[("id", "<", 5000)],
                        dv=(mode == "dv"),
                    )
                results[mode] = time.perf_counter() - t0
                assert t.read(spark).count() == mult * rows_per_file - 5000
            print(
                f"dv_probe mult={mult:3d} rows={mult * rows_per_file:>11,} "
                f"full={results['full']:6.2f}s cow={results['cow']:6.2f}s "
                f"dv={results['dv']:6.2f}s",
                flush=True,
            )
        finally:
            shutil.rmtree(root, ignore_errors=True)


def run_merge_probe(spark, mults: tuple[int, ...]) -> None:
    """MERGE-cost scaling: full-clause ``merge_into`` (file-granularity
    CoW) vs the naive whole-table upsert ``merge()`` as the table grows.

    Table = ``mult`` files × 100k rows (range-clustered ids); the source
    always updates the SAME 2.5k rows confined to the first file and
    inserts 2.5k new rows. Expected: ``merge()`` rewrites every file so
    its wall grows ~linearly with mult; ``merge_into`` rewrites O(1)
    files — its join-pass still scans the table once to find touched
    files (that scan is the honest floor), but the WRITE side stays
    flat."""
    import shutil
    import tempfile

    from data_lakehouse_project_spark.operators.txnlog import TxnTable

    rows_per_file = 100_000
    for mult in mults:
        root = tempfile.mkdtemp(prefix="mergeprobe-")
        try:
            n = mult * rows_per_file
            src = spark.range(0, 2_500).select(
                F.col("id"),
                F.lit(-1).cast("long").alias("v"),
                F.lit("upd").alias("pad"),
            ).unionByName(
                spark.range(n, n + 2_500).select(
                    F.col("id"),
                    F.lit(-2).cast("long").alias("v"),
                    F.lit("new").alias("pad"),
                )
            )
            results = {}
            for mode in ("upsert", "clauses"):
                path = os.path.join(root, mode)
                t = TxnTable(path)
                t.write(
                    spark.range(0, n)
                    .select(
                        F.col("id"),
                        (F.col("id") % 97).alias("v"),
                        F.repeat(F.sha2(F.col("id").cast("string"), 256), 3)
                        .alias("pad"),
                    )
                    .repartitionByRange(mult, "id")
                    .sortWithinPartitions("id"),
                    mode="overwrite",
                )
                t0 = time.perf_counter()
                if mode == "upsert":
                    t.merge(src, ["id"])
                else:
                    t.merge_into(
                        spark,
                        src,
                        ["id"],
                        matched_update={"v": "s.v", "pad": "s.pad"},
                        insert=True,
                    )
                results[mode] = time.perf_counter() - t0
                # write amplification: bytes staged by the merge commit
                # (the 100 TB-relevant cost — local page-cache writes
                # are nearly free, so wall time alone understates the
                # difference on object storage)
                adds, removes, _, _, _ = t._read_commit(t.latest_version())
                results[f"{mode}_files"] = len(adds)
                results[f"{mode}_mb"] = sum(
                    a.get("size_bytes", 0) for a in adds
                ) / 1e6
                assert t.read(spark).count() == n + 2_500
                assert (
                    t.read(spark).where("v = -1").count() == 2_500
                )
            print(
                f"merge    mult={mult:3d} rows={n:>11,} "
                f"upsert={results['upsert']:6.2f}s "
                f"({results['upsert_files']} files, "
                f"{results['upsert_mb']:.0f} MB) "
                f"clauses={results['clauses']:6.2f}s "
                f"({results['clauses_files']} files, "
                f"{results['clauses_mb']:.0f} MB)",
                flush=True,
            )
        finally:
            shutil.rmtree(root, ignore_errors=True)


def _stage_stats(spark, min_stage_id: int):
    """Per-stage (tasks, spill bytes, task-duration p50/max) for every
    completed stage with id >= min_stage_id, via the app status store
    (the UI's data source — works headless)."""
    jvm = spark._jvm
    store = spark._jsparkSession.sparkContext().statusStore()
    empty = jvm.java.util.ArrayList()
    darr = spark._sc._gateway.new_array(jvm.double, 0)
    out = []
    stages = store.stageList(empty, False, False, darr, empty)
    for i in range(stages.size()):
        s = stages.apply(i)
        if s.stageId() < min_stage_id or s.numCompleteTasks() == 0:
            continue
        tl = store.taskList(s.stageId(), s.attemptId(), 100_000)
        durs = sorted(
            tl.apply(j).duration().get()
            for j in range(tl.size())
            if tl.apply(j).duration().isDefined()
        )
        out.append(
            {
                "stage": s.stageId(),
                "tasks": s.numCompleteTasks(),
                "spill_mem": s.memoryBytesSpilled(),
                "spill_disk": s.diskBytesSpilled(),
                "p50_ms": durs[len(durs) // 2] if durs else 0,
                "max_ms": durs[-1] if durs else 0,
                "sum_ms": sum(durs),
            }
        )
    return out


def _next_stage_id(spark) -> int:
    stats = _stage_stats(spark, 0)
    return max((s["stage"] for s in stats), default=-1) + 1


def run_skew_join_probe(spark, sf_dir: str, mults: tuple[int, ...]) -> None:
    """Skewed fact-fact JOIN at scale: a Zipf-hot key (~half of all
    fact rows share key 0) shuffle-joined to a uniform dimension-sized
    fact, AQE skew splitting OFF vs ON (round-4 verdict #8 — the
    test_plans gate proves the mechanism at toy size; this measures the
    straggler it removes on real volume).

    Recorded per (mult, mode): wall, and the join stage's task-duration
    median vs max — the straggler ratio max/p50 is the whole story
    (OFF: one task drags half the join; ON: AQE splits the hot
    partition into advisory-sized chunks). Split thresholds are set to
    match probe volume (defaults target multi-GB cluster partitions);
    broadcast is disabled because the modeled 100 TB fact-fact join has
    no broadcastable side.

    Two AQE-skew-detection pitfalls this probe had to engineer around,
    both measured here and worth knowing at 100 TB:

    1. Detection is BYTES-based on COMPRESSED map output: a constant
       hot key with only numeric columns compresses so well (38M hot
       rows → 7.9 MB, SMALLER than the median uniform-key partition)
       that no byte threshold can ever see the row skew. The fact rows
       therefore carry an incompressible 64-char payload so bytes ∝
       rows — which real payload-bearing fact rows provide; the salted
       fallback (ext/skew.py) covers hot keys that don't.
    2. A skewed partition is split by MAPPER ranges, so a shuffle with
       one map task is unsplittable no matter how skewed: sf0.1's
       single-file parquet scan produced exactly one mapper and
       silently disabled the optimization (measured: skew=true never
       appeared until the input had >1 map task). The fact is
       repartitioned first — at real scale inputs have thousands of
       mappers, but a coalesced upstream stage can recreate this
       failure mode in production."""
    lineitem = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    n_li = lineitem.count()
    right = orders.select(
        F.col("o_orderkey").alias("k"), "o_orderpriority"
    ).unionByName(
        spark.range(1).select(
            F.lit(0).cast("long").alias("k"),
            F.lit("0-HOT").alias("o_orderpriority"),
        )
    )
    conf = spark.conf
    saved = {
        k: conf.get(k)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.enabled",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        )
    }
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    # thresholds sized to PROBE volume for a reason worth recording:
    # skew detection is BYTES-based on compressed map output, and a hot
    # key compresses brutally well (38M (k=0, price) rows → ~8 MB under
    # LZ4, measured) — a CPU-bound straggler can hide under a byte
    # threshold tuned for incompressible data. Real deployments with
    # compressible hot keys need the same treatment (or salting).
    conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8m"
    )
    conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16m")
    try:
        for mult in mults:
            fact = (
                replicate_explode(lineitem, mult)
                .repartition(64)  # >1 mapper — see pitfall 2 above
                .withColumn(
                    "k",
                    F.when(
                        F.pmod(
                            F.xxhash64("l_orderkey", "l_linenumber"),
                            F.lit(2),
                        )
                        == 0,
                        F.lit(0),
                    ).otherwise(F.col("l_orderkey")),
                )
                .withColumn(
                    "payload",
                    F.sha2(
                        F.concat_ws(
                            "|", "l_orderkey", "l_linenumber", "k"
                        ),
                        256,
                    ),
                )
            )
            for mode in ("off", "on"):
                conf.set(
                    "spark.sql.adaptive.skewJoin.enabled",
                    "true" if mode == "on" else "false",
                )
                marker = _next_stage_id(spark)
                t0 = time.perf_counter()
                (
                    fact.join(right, "k")
                    .groupBy("o_orderpriority")
                    .agg(
                        F.count(F.lit(1)).alias("n"),
                        F.sum("l_extendedprice").alias("rev"),
                        # keeps the payload in the shuffled row so the
                        # fact exchange carries realistic bytes
                        F.sum(F.length("payload")).alias("pay"),
                    )
                    .write.format("noop")
                    .mode("overwrite")
                    .save()
                )
                wall = time.perf_counter() - t0
                stats = _stage_stats(spark, marker)
                # robust summary under AQE's shifting stage layout:
                # the longest task ANYWHERE is the critical-path bound
                # a straggler sets; p50 over every task shows what a
                # typical slice costs. (Per-stage attribution is
                # fragile — AQE re-stages between modes.)
                max_task = max((st["max_ms"] for st in stats), default=0)
                n_tasks = sum(st["tasks"] for st in stats)
                p50s = sorted(st["p50_ms"] for st in stats if st["tasks"] > 1)
                p50 = p50s[len(p50s) // 2] if p50s else 0
                print(
                    f"skew_join mult={mult:4d} rows={n_li * mult:>12,} "
                    f"aqe_skew={mode:3s} wall={wall:6.2f}s "
                    f"tasks={n_tasks:4d} "
                    f"stage_p50={p50 / 1e3:6.2f}s "
                    f"task_max={max_task / 1e3:6.2f}s "
                    f"straggler_x={max_task / max(p50, 1):5.1f}",
                    flush=True,
                )
    finally:
        for k, v in saved.items():
            conf.set(k, v)


_SPILL_SHAPES = ("join", "minhash")


def run_spill_worker(sf_dir: str, shape: str, mult: int) -> None:
    """Child-process body for the spill probe: a deliberately SMALL
    session (2g driver heap = executors in local mode, low memory
    fraction, 8 cores) so the shuffle CANNOT fit in execution memory —
    the question is whether it spills and completes or OOMs. Emits one
    JSON line consumed by run_spill_probe."""
    import json

    from pyspark.sql import SparkSession

    mem = os.environ.get("SPARK_GRAFT_SPILL_MEM", "2g")
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.driver.memory", mem)
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .appName(f"spill-probe-{shape}-{mult}")
        .getOrCreate()
    )
    table, fn, replicate = SHAPES[shape]
    base = spark.read.parquet(os.path.join(sf_dir, f"{table}.parquet"))
    n_base = base.count()
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    # replication choices differ from the throughput probe on purpose:
    # explode (not a mult-way union, whose plan alone stresses the
    # analyzer at 256+) for plain tables, and a repartition so tasks
    # see realistically-sized splits — at scale, mult× data arrives as
    # mult× more file splits, not as the replicator's handful of giant
    # exploded partitions (whose single-partition working set would
    # OOM any bounded heap by construction)
    if replicate is replicate_union:
        replicate = replicate_explode
    df = replicate(base, mult).repartition(max(32, mult // 4))
    marker = _next_stage_id(spark)
    t0 = time.perf_counter()
    fn(df, orders).write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0
    stats = _stage_stats(spark, marker)
    print(
        json.dumps(
            {
                "shape": shape,
                "mult": mult,
                "rows": n_base * mult,
                "wall_s": round(wall, 2),
                "spill_mem_bytes": sum(s["spill_mem"] for s in stats),
                "spill_disk_bytes": sum(s["spill_disk"] for s in stats),
                "mem": mem,
            }
        ),
        flush=True,
    )
    spark.stop()


def run_spill_probe(sf_dir: str, mults: tuple[int, ...]) -> None:
    """Memory-pressure probe (round-4 verdict #3): every prior probe fit
    comfortably in the 128 GiB session, so spill behavior was unproven.
    Re-runs the fact-fact join and minhash shapes in a fresh CHILD
    process per point with a 2g driver heap; records completed-vs-OOM
    and the measured shuffle spill bytes."""
    import json
    import subprocess

    shapes = tuple(
        s
        for s in os.environ.get(
            "SPARK_GRAFT_SPILL_SHAPES", ",".join(_SPILL_SHAPES)
        ).split(",")
        if s
    )
    for shape in shapes:
        for mult in mults:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), sf_dir,
                 "_spill_worker", shape, str(mult)],
                capture_output=True,
                text=True,
                timeout=3600,
            )
            line = next(
                (
                    ln
                    for ln in reversed(proc.stdout.splitlines())
                    if ln.startswith("{")
                ),
                None,
            )
            if proc.returncode != 0 or line is None:
                tail = (proc.stderr or proc.stdout).splitlines()[-5:]
                print(
                    f"spill    shape={shape} mult={mult} FAILED "
                    f"(rc={proc.returncode}): {' | '.join(tail)}",
                    flush=True,
                )
                continue
            r = json.loads(line)
            print(
                f"spill    shape={shape:8s} mult={r['mult']:4d} "
                f"rows={r['rows']:>12,} mem={r['mem']} "
                f"wall={r['wall_s']:7.2f}s "
                f"spill_mem={r['spill_mem_bytes'] / 1e9:6.2f}GB "
                f"spill_disk={r['spill_disk_bytes'] / 1e9:6.2f}GB",
                flush=True,
            )


def run_pagerank_probe(spark, mults: tuple[int, ...]) -> None:
    """PageRank wall vs edge volume on a synthetic hub-heavy graph.

    The graph is generated deterministically JVM-side: src cycles the
    node set, dst = floor(u² · n_nodes) with u = a hash-uniform in
    [0,1) — the quadratic bias concentrates in-degree on low node ids,
    giving the power-law hub structure link graphs (and near-dup
    graphs) actually have. Edges are localCheckpoint'ed so the timer
    bills pagerank's 5 rounds (join + aggregate each), not generation.
    avg out-degree 8, so nodes scale with edges (both axes grow)."""
    from data_lakehouse_project_spark.ext.graph import pagerank

    base_edges = 200_000
    print("\npagerank probe: 5 iterations, hub-heavy synthetic graph")
    for mult in mults:
        n_edges = base_edges * mult
        n_nodes = max(n_edges // 8, 1)
        u = (F.pmod(F.xxhash64(F.col("id")), F.lit(1_000_000)).cast("double")
             / 1_000_000.0)
        edges = (
            spark.range(n_edges)
            .select(
                (F.col("id") % n_nodes).alias("id_a"),
                F.floor(u * u * n_nodes).cast("long").alias("id_b"),
            )
            .where(F.col("id_a") != F.col("id_b"))
            .localCheckpoint(eager=True)
        )
        n = edges.count()
        t0 = time.perf_counter()
        pagerank(edges, iterations=5).write.format("noop").mode(
            "overwrite"
        ).save()
        dt = time.perf_counter() - t0
        print(
            f"pagerank mult={mult:4d} edges={n:>11,} nodes={n_nodes:>10,} "
            f"wall={dt:6.2f}s edges/s={n / dt:>12,.0f}"
        )


def run_concurrent_probe(sf_dir: str, n_threads: int = 4) -> None:
    """Multi-tenant fairness probe (round-5 verdict task 5): the bench
    runs queries serially, but a real cluster multiplexes pipelines.
    N driver threads each run a headline mix against ONE session with
    the FAIR scheduler (one pool per thread), so concurrent jobs share
    executor slots instead of queueing FIFO behind the largest job.

    Reports per-query serial baseline vs concurrent p50/p95 and a
    fairness verdict: at N=4 no query's p95 should exceed 3× its serial
    time (4 tenants on one box ⇒ ~4× slowdown is the fair-share
    ceiling; >3× before that ceiling on the p95 would mean starvation,
    i.e. FIFO-style convoying behind a big job). Also prints aggregate
    throughput: total queries / concurrent wall vs serial wall —
    >1× shows the multiplexing actually buys utilization.
    """
    import statistics
    import threading

    from data_lakehouse_project_spark import registry

    spark = get_spark(
        app_name="concurrent-probe",
        extra_conf={"spark.scheduler.mode": "FAIR"},
    )
    qs = registry.queries()
    mix = [
        "pricing_summary",          # scan + partial/final agg
        "join_lineitem_orders",     # fact-fact shuffle join
        "window_topk_per_customer", # partitioned window
        "text_stats",               # corpus scan, wide projection
        "events_hourly_rollup",     # event-time rollup
        "ann_cosine_topk",          # vector scan + TakeOrdered
    ]

    def _run(name):
        qs[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()

    for name in mix:  # warm: JIT, file index, Arrow workers
        _run(name)

    serial = {}
    t_serial0 = time.perf_counter()
    for name in mix:
        best = float("inf")
        for _ in range(2):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            _run(name)
            best = min(best, time.perf_counter() - t0)
        serial[name] = best
    serial_wall = time.perf_counter() - t_serial0

    rounds = 2
    times: dict[str, list[float]] = {n: [] for n in mix}
    lock = threading.Lock()

    def worker(tid: int) -> None:
        # one FAIR pool per tenant thread (pinned-thread mode makes
        # the local property thread-scoped)
        spark.sparkContext.setLocalProperty(
            "spark.scheduler.pool", f"tenant-{tid}"
        )
        for r in range(rounds):
            # stagger the mix per thread so tenants overlap DIFFERENT
            # query shapes, the adversarial case for fairness
            for name in mix[tid % len(mix):] + mix[: tid % len(mix)]:
                t0 = time.perf_counter()
                _run(name)
                dt = time.perf_counter() - t0
                with lock:
                    times[name].append(dt)

    threads = [
        threading.Thread(target=worker, args=(i,))
        for i in range(n_threads)
    ]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    conc_wall = time.perf_counter() - t0

    n_queries = n_threads * rounds * len(mix)
    print(
        f"concurrent n_threads={n_threads} rounds={rounds} "
        f"serial_wall(min-of-2 sum)={sum(serial.values()):.2f}s "
        f"concurrent_wall={conc_wall:.2f}s "
        f"qps_serial={len(mix) / sum(serial.values()):.2f} "
        f"qps_concurrent={n_queries / conc_wall:.2f}",
        flush=True,
    )
    worst = 0.0
    for name in mix:
        xs = sorted(times[name])
        p50 = statistics.median(xs)
        p95 = xs[max(0, int(len(xs) * 0.95) - 1)]
        ratio = p95 / serial[name]
        worst = max(worst, ratio)
        print(
            f"  {name:26s} serial={serial[name]:5.2f}s "
            f"p50={p50:5.2f}s p95={p95:5.2f}s p95/serial={ratio:4.2f}x",
            flush=True,
        )
    verdict = "PASS" if worst <= 3.0 else "FAIL"
    print(
        f"fairness {verdict}: worst p95/serial = {worst:.2f}x "
        f"(gate: <=3x at N={n_threads})",
        flush=True,
    )
    spark.stop()


def run_lpa_probe(spark, mults: tuple[int, ...]) -> None:
    """Label propagation wall vs edge volume — same hub-heavy synthetic
    graph and localCheckpoint discipline as the pagerank probe (the two
    share the per-round cost model: one join + aggregates on node
    keys); 5 synchronous rounds."""
    from data_lakehouse_project_spark.ext.graph import label_propagation

    base_edges = 200_000
    print("\nlpa probe: 5 iterations, hub-heavy synthetic graph")
    for mult in mults:
        n_edges = base_edges * mult
        n_nodes = max(n_edges // 8, 1)
        u = (F.pmod(F.xxhash64(F.col("id")), F.lit(1_000_000)).cast("double")
             / 1_000_000.0)
        edges = (
            spark.range(n_edges)
            .select(
                (F.col("id") % n_nodes).alias("id_a"),
                F.floor(u * u * n_nodes).cast("long").alias("id_b"),
            )
            .where(F.col("id_a") != F.col("id_b"))
            .localCheckpoint(eager=True)
        )
        n = edges.count()
        t0 = time.perf_counter()
        label_propagation(edges, iterations=5).write.format("noop").mode(
            "overwrite"
        ).save()
        dt = time.perf_counter() - t0
        print(
            f"lpa mult={mult:4d} edges={n:>11,} nodes={n_nodes:>10,} "
            f"wall={dt:6.2f}s edges/s={n / dt:>12,.0f}"
        )
        edges.unpersist()


def run_geo_probe(spark, mults: tuple[int, ...]) -> None:
    """Grid-binned geo radius self-join at volume (ext/geo.py).

    Points derive from xxhash64(id) (uniform over the ±60° band); the
    radius SHRINKS as n grows so the output stays ~2M pairs — real
    point sets densify this way (city-scale data, city-scale radii),
    and a fixed radius would measure output explosion (O(n²·r²) pairs),
    not the join. The candidate generator's cost is the grid shuffle +
    Σ|cell|·9 verify, so wall should scale near-linearly in n while
    the naive plan's n²/2 comparisons go from 5e11 (n=1M) to 1.3e14
    (n=16M) — unrunnable two decades earlier.

    Input is localCheckpointed so the timer bills the JOIN, not point
    generation."""
    from data_lakehouse_project_spark.ext.geo import neighbor_pairs_grid

    ladder = [(1_000_000, 25.0), (4_000_000, 6.0), (16_000_000, 1.5)]
    for n, radius in ladder:
        pts = (
            spark.range(n)
            .select(
                "id",
                (F.pmod(F.xxhash64("id"), F.lit(12000)) / 100.0 - 60.0)
                .alias("lat"),
                (
                    F.pmod(F.xxhash64("id", F.lit(1)), F.lit(36000)) / 100.0
                    - 180.0
                ).alias("lon"),
            )
            .localCheckpoint(eager=True)
        )
        t0 = time.perf_counter()
        cnt = neighbor_pairs_grid(pts, radius).count()
        dt = time.perf_counter() - t0
        print(
            f"geo n={n:>10,} r={radius:5.1f}km pairs={cnt:>10,} "
            f"wall={dt:6.2f}s pts/s={n / dt:>12,.0f}"
        )
        pts.unpersist()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    shapes = sys.argv[2:] or list(SHAPES)
    mults = tuple(
        int(m)
        for m in os.environ.get("SPARK_GRAFT_MULTS", "1,4,16").split(",")
    )
    if shapes and shapes[0] == "_spill_worker":
        run_spill_worker(sf_dir, shapes[1], int(shapes[2]))
        return
    if "spill" in shapes:  # spawns its own constrained child sessions
        shapes = [s for s in shapes if s != "spill"]
        run_spill_probe(sf_dir, mults)
        if not shapes:
            return
    if "concurrent" in shapes:  # needs a FAIR-scheduler session
        shapes = [s for s in shapes if s != "concurrent"]
        run_concurrent_probe(
            sf_dir,
            n_threads=int(os.environ.get("SPARK_GRAFT_TENANTS", "4")),
        )
        if not shapes:
            return
    spark = get_spark(app_name="scaling-probe")
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    orders.count()  # warm

    if "admit" in shapes:
        shapes = [s for s in shapes if s != "admit"]
        run_admit_probe(spark, sf_dir, mults)

    if "dv" in shapes:
        shapes = [s for s in shapes if s != "dv"]
        run_dv_probe(spark, mults)

    if "merge" in shapes:
        shapes = [s for s in shapes if s != "merge"]
        run_merge_probe(spark, mults)

    if "skew_join" in shapes:
        shapes = [s for s in shapes if s != "skew_join"]
        run_skew_join_probe(spark, sf_dir, mults)

    if "pagerank" in shapes:
        shapes = [s for s in shapes if s != "pagerank"]
        run_pagerank_probe(spark, mults)

    if "geo" in shapes:
        shapes = [s for s in shapes if s != "geo"]
        run_geo_probe(spark, mults)

    if "lpa" in shapes:
        shapes = [s for s in shapes if s != "lpa"]
        run_lpa_probe(spark, mults)

    for shape in shapes:
        table, fn, replicate = SHAPES[shape]
        base = spark.read.parquet(os.path.join(sf_dir, f"{table}.parquet"))
        n_base = base.count()
        for mult in mults:
            # always through replicate: some replicators also derive
            # probe columns (e.g. the skewed `domain`) even at mult=1
            df = replicate(base, mult)
            if shape.startswith("skew_"):
                # materialize the synthetic skewed input so the timer
                # sees the OPERATOR's cost (at scale the input is on
                # disk; recomputing the explode inside a two-pass
                # operator would bill generation twice)
                df = df.localCheckpoint(eager=True)
            t0 = time.perf_counter()
            fn(df, orders).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            rows = n_base * mult
            print(
                f"{shape:8s} mult={mult:4d} rows={rows:>11,} wall={dt:6.2f}s "
                f"throughput={rows / dt / 1e6:6.2f}M rows/s",
                flush=True,
            )
    spark.stop()


if __name__ == "__main__":
    main()
