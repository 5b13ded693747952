"""Deduplication operators.

Five families, ordered by exactness/cost (SURVEY §2.8 mapping):

1. exact duplicate groups  — hash-groupBy on a normalized fingerprint
2. token-set duplicates    — exact Jaccard=1.0 via sorted-vocab hash join
3. MinHash + LSH near-dup  — shingle → minhash → band → bucket join
4. SimHash near-dup        — 64-bit sign-of-sum fingerprint + Hamming bands
5. embedding near-dup      — cosine over LSH (random-hyperplane) buckets

Scale notes (the whole point of each design):

- Every variant is *bucket-join shaped*: candidates meet only inside a
  group/bucket key, so cost is Σ|bucket|² not |table|² — the only shape
  that survives 100 TB. No crossJoin anywhere.
- MinHash signatures are computed with ``xxhash64`` + affine rehash inside
  ``F.transform``/``F.array_min`` — pure JVM codegen, no Python.
- Banding: a signature of K hashes split into B bands of R rows; two docs
  collide if any band matches ⇒ P(collide) = 1-(1-j^R)^B, the classic LSH
  S-curve. Callers pick (K, B) for their threshold.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_lakehouse_project_spark.cacheutil import release_on_gc
from data_lakehouse_project_spark.functions.scalar import normalize_text

# Mersenne prime 2^31-1 for affine rehashing: keeps a*h+b well inside
# 64-bit under ANSI arithmetic (a < 2^8, h < 2^31 → product < 2^39)
_MERSENNE = (1 << 31) - 1

# python-kernel verify gate (minhash_near_duplicates): frozensets of the
# rep token hashes cost ~80 B/token in worker memory, so cap the total
# at ~300 MB of sets per python worker; past it the JVM join verify
# takes over (broadcast, then shuffle past broadcast_bytes_limit)
_PY_VERIFY_MAX_TOKENS = 4_000_000


def tokens(text: Column) -> Column:
    """Whitespace tokens of normalized text (JVM split, no UDF).

    Equivalent to ``split(normalize_text(text), ' ')`` but ~1.7x
    faster (r12): the collapse-whitespace regexp_replace rewrote the
    whole document string just so a plain split could cut it; trimming
    only the ENDS (anchored regex, usually a no-op) and splitting on
    ``\\s+`` directly produces the identical token list — maximal
    non-whitespace runs, ``['']`` for empty/whitespace-only input
    (verified on adversarial tab/newline edges; plain ``trim`` alone
    would NOT be equivalent, it strips 0x20 only)."""
    return F.split(
        F.regexp_replace(F.lower(text), r"^\s+|\s+$", ""), r"\s+"
    )


def exact_dedup_groups(
    df: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """Exact duplicate groups by md5 fingerprint of normalized text.

    One shuffle on the 32-char fingerprint (never on the raw document), so
    shuffle volume is O(rows × 32B) regardless of document size.
    Returns (fingerprint, keep_id=min id, dup_count).
    """
    fp = F.md5(normalize_text(F.col(text_col)))
    return (
        df.select(fp.alias("fingerprint"), F.col(id_col))
        .groupBy("fingerprint")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
    )


def tokenset_dedup_groups(
    df: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """Duplicate groups under token-SET equality (Jaccard == 1.0).

    Catches shuffled/permuted near-copies (same vocabulary, any order)
    *exactly* and without pairwise comparison: the sorted distinct token
    list is hashed and grouped — one shuffle on a 32-byte key. This is the
    scale path for the strongest near-dup class; MinHash below handles
    0 < jaccard < 1.
    """
    vocab_fp = F.md5(
        F.array_join(F.array_sort(F.array_distinct(tokens(F.col(text_col)))), " ")
    )
    return (
        df.select(vocab_fp.alias("vocab_fp"), F.col(id_col))
        .groupBy("vocab_fp")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
    )


def _affine_min(th_col, a: int, b: int) -> Column:
    """min over pre-hashed tokens of (a*h + b) mod p."""
    return F.array_min(
        F.transform(
            th_col,
            lambda h: F.pmod(F.lit(a) * h + F.lit(b), F.lit(_MERSENNE)),
        )
    )


def minhash_signatures(
    df: DataFrame, text_col: str, id_col: str, num_hashes: int = 64
) -> DataFrame:
    """Per-document MinHash signature (array<bigint>, length num_hashes).

    Two projections: (1) tokenize + xxhash64 each distinct token ONCE into
    a base-hash array, (2) K affine rehash+min passes over that small int
    array. Hashing each token once instead of once-per-permutation cuts
    signature cost ~K× (measured 9.3s → ~1s for 5k docs at K=64).
    Coefficients are deterministic (universal-hashing family).
    """
    base = F.transform(
        F.array_distinct(tokens(F.col(text_col))),
        lambda t: F.pmod(F.xxhash64(t), F.lit(_MERSENNE)),
    )
    pre = df.select(F.col(id_col), base.alias("_th"))
    sig = F.array(
        *[
            _affine_min(F.col("_th"), 2 * i + 1, 1_000_003 * (i + 1))
            for i in range(num_hashes)
        ]
    )
    return pre.select(F.col(id_col), sig.alias("signature"))


def _signatures_from_token_hashes(
    toh_df: DataFrame, num_hashes: int, toh_col: str = "toh"
) -> DataFrame:
    """MinHash signatures for a frame that already carries xxhash64'd
    tokens (array<bigint>) — pmod(hash, MERSENNE) yields the same base
    values as hashing the strings directly, so signatures are identical
    to minhash_signatures' while never touching a string.

    Two projections on purpose: the base-hash array materializes in its
    own project operator, so the K affine-min expressions reference it as
    an attribute instead of re-inlining the base hashing K times
    (CollapseProject keeps the boundary because the reference is
    non-cheap and used K times)."""
    pre = toh_df.withColumn(
        "_th",
        F.transform(F.col(toh_col), lambda h: F.pmod(h, F.lit(_MERSENNE))),
    )
    sig = F.array(
        *[
            _affine_min(F.col("_th"), 2 * i + 1, 1_000_003 * (i + 1))
            for i in range(num_hashes)
        ]
    )
    return pre.withColumn("signature", sig).drop("_th")


def minhash_near_duplicates(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 64,
    bands: int = 16,
    jaccard_threshold: float = 0.5,
    expand: bool = True,
    broadcast_bytes_limit: int = 64 << 20,
    round_digits: int | None = 6,
) -> DataFrame:
    """Near-duplicate pairs via exact-group collapse + MinHash LSH banding
    + exact verification.

    Two-stage pipeline (the shape that survives 100 TB *and* duplicate-
    heavy corpora):

    1. **Collapse**: group docs by exact token-set fingerprint; LSH runs
       only on group representatives. Large exact-duplicate clusters
       (boilerplate, mirrored pages) otherwise explode the band buckets
       quadratically — measured 48.6M → ~20M raw candidates on the test
       corpus, where one vocab group has 248 members.
    2. **LSH on reps**: signature → B band keys → bucket self-join →
       distinct candidate rep pairs → exact token-set Jaccard verify.
       Σ|bucket|², no crossJoin; AQE splits skewed buckets.
    3. **Expand**: verified rep pairs fan back out to member pairs
       (join against group membership — no extra shuffle of text), and
       intra-group pairs are emitted directly with jaccard = 1.0.

    Returns (id_a, id_b, jaccard) with id_a < id_b and jaccard >= threshold.

    With ``expand=False`` the member fan-out (stage 3) is skipped and the
    result stays at representative grain: (rep_a, rep_b, jaccard, pairs)
    where ``pairs`` is how many member pairs the row stands for
    (|A|·|B| across groups, C(n,2) within an exact-dup group, rep_a =
    rep_b for the latter). Sum(pairs) equals the expanded pair count, so
    no information is lost — on duplicate-heavy corpora the expanded
    output is orders of magnitude larger than the computation that
    produced it, and at 100 TB the collapsed form is what you'd persist.
    """
    rows_per_band = num_hashes // bands

    # (fan_out_input on the raw input was A/B-measured a LOSS here —
    # the group-collapse shuffle right below already parallelizes every
    # downstream stage, and the extra exchange costs more than the
    # single-task tokenize it saves)

    # token strings are xxhash64'd ONCE here; every downstream stage
    # (group fingerprint, signatures, verify) runs on long arrays —
    # sorting/hashing/set-intersecting 8-byte ints instead of strings
    toh = df.select(
        F.col(id_col),
        F.transform(
            F.array_distinct(tokens(F.col(text_col))), lambda t: F.xxhash64(t)
        ).alias("toh"),
    )
    # vocab fingerprint = xxhash64 of the SORTED token-hash array value —
    # no giant join-to-string + md5; the group key is 8 bytes on the wire
    # persist + release_on_gc (see cacheutil): the result is returned
    # lazily, so the caches are unpersisted when the caller drops the
    # result — a bare .persist() leaked two cached tables per call for
    # the life of the session, and localCheckpoint blocks are pinned by
    # the py4j bridge forever (measured; cacheutil docstring).
    grouped = (
        toh.withColumn("vocab_fp", F.xxhash64(F.array_sort("toh")))
        .groupBy("vocab_fp")
        .agg(
            F.min(id_col).alias("rep_id"),
            F.collect_list(id_col).alias("members"),
            F.first("toh").alias("toh"),
        )
        .persist()
    )
    members = grouped.select(
        "vocab_fp", F.explode("members").alias("member_id")
    )

    # --- stage 2: LSH over representatives only --------------------------
    reps = grouped.select(
        F.col("vocab_fp"), F.col("rep_id"), F.col("toh")
    )
    sigs = _signatures_from_token_hashes(reps, num_hashes)
    # band buckets are xxhash64 of the signature slice ARRAY (hashing the
    # Catalyst array value directly — no string join), giving long join
    # keys instead of 32-char md5 strings. Multi-band collisions are
    # deduped with distinct(): an inline "first colliding band" array
    # check was measured 3× SLOWER overall — interpreted higher-order
    # functions on every raw candidate cost more than one exchange of the
    # (long, long) pair set.
    banded = (
        sigs.select(
            "rep_id",
            F.size("toh").alias("sz"),
            F.posexplode(
                F.array(
                    *[
                        F.xxhash64(
                            F.slice(
                                "signature", b * rows_per_band + 1, rows_per_band
                            )
                        )
                        for b in range(bands)
                    ]
                )
            ).alias("band", "bucket"),
        )
        .persist()  # one materialization feeds both sides of the
    )  # self-join; released with the result (release_on_gc below)

    # size prefilter INSIDE the bucket join: jaccard >= t implies
    # t*|A| <= |B| and t*|B| <= |A| (inter <= min, union >= max, so
    # j <= min/max) — an exact necessary condition, never drops a true
    # pair. Banding tuned for recall at threshold t admits plenty of
    # mid-similarity pairs on dup-heavy corpora; the 4-byte `sz` column
    # kills them BEFORE the distinct shuffle and the verify (measured
    # sf0.1: t=0.9 raw candidates 10.8M -> 5.4M, distinct 4.6M -> 1.8M;
    # t=0.7 distinct -21%). NaN edge preserved: two empty token sets
    # pass 0 <= 0 and still reach the verify's 0/0.
    raw_cand = (
        banded.alias("a")
        .join(
            banded.alias("b"),
            on=[
                F.col("a.band") == F.col("b.band"),
                F.col("a.bucket") == F.col("b.bucket"),
                F.col("a.rep_id") < F.col("b.rep_id"),
                F.lit(jaccard_threshold) * F.col("a.sz") <= F.col("b.sz"),
                F.lit(jaccard_threshold) * F.col("b.sz") <= F.col("a.sz"),
            ],
        )
        .select(
            F.col("a.rep_id").alias("rep_a"), F.col("b.rep_id").alias("rep_b")
        )
    )

    # materializes the persisted `grouped` once and sizes the broadcast
    # decisions: the rep token map feeds the Arrow verify kernel and the
    # member/size tables broadcast into the expansion joins while they
    # fit — the candidate set is orders of magnitude larger than the rep
    # set, so shuffling it per join is the wrong side to move. The gate
    # is on estimated BYTES, not rows: rep_tok carries full token-hash
    # arrays and `members` carries id lists, so a row-count gate
    # under-estimates by the avg doc size (500k reps of 1k-token docs is
    # ~4 GB — a driver OOM, not a broadcast). One stats job over the
    # already-persisted `grouped` prices both payloads; each table is
    # gated independently. Above the limit (real 100 TB corpora) the
    # joins stay shuffles.
    stats = grouped.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.sum(F.size("toh")), F.lit(0)).alias("tok_total"),
        F.coalesce(F.sum(F.size("members")), F.lit(0)).alias("mem_total"),
    ).first()
    _ROW_OVERHEAD = 48  # UnsafeRow + array header + broadcast table slack
    tok_bytes = stats.n * _ROW_OVERHEAD + stats.tok_total * 8
    mem_bytes = stats.n * _ROW_OVERHEAD + stats.mem_total * 24
    small_tok = tok_bytes <= broadcast_bytes_limit
    small_mem = mem_bytes <= broadcast_bytes_limit

    def _b(d: DataFrame) -> DataFrame:  # member-list / scalar payload joins
        return F.broadcast(d) if small_mem else d

    # exact verify on the already-hashed tokens. Two routes:
    #
    # - python-kernel verify (token table comfortably in memory): ship
    #   ONLY the (rep_a, rep_b) id pairs into an Arrow kernel and
    #   intersect python frozensets from a broadcast {rep_id: tokens}
    #   map (~1 us/pair). The JVM route materializes both token arrays
    #   per candidate through two joins — for a near-dup-heavy corpus
    #   the candidate set is ~1000x the rep set, so that copies
    #   |cand|·(|A|+|B|) longs just to count overlaps (measured as THE
    #   bottleneck of the LSH pipeline at sf0.1; the kernel does the
    #   same exact intersection with zero array materialization —
    #   guide §4.2 vectorize-in-python / §8 decide-on-lightweight-
    #   proxies). Gated tighter than the JVM broadcast: frozensets
    #   cost ~10x the raw 8 B/token, so the cap is 4M total tokens
    #   (~300 MB of sets per python worker).
    # - else: the distributed/broadcast join verify, unchanged — the
    #   100 TB shape (JVM broadcast up to ``broadcast_bytes_limit``,
    #   shuffle joins past it).
    #
    # Parity: set intersection over the SAME xxhash64 values as
    # array_intersect; jaccard = i/(|A|+|B|-i) is one int/int double
    # division on both routes, bit-identical (the recall-1 grading
    # config relies on this). Spark NaN semantics (0/0 candidates pass
    # the >= filter) are mirrored explicitly, and a null token array
    # (null text) drops the pair on both routes (the JVM route via the
    # null `sz` in the candidate join, the kernel via its None check).
    rep_tok = reps.select("rep_id", "toh")
    if stats.tok_total <= _PY_VERIFY_MAX_TOKENS and small_tok:
        import numpy as np

        tok_map = {
            row["rep_id"]: (
                None if row["toh"] is None else frozenset(row["toh"])
            )
            for row in rep_tok.collect()
        }
        bc_tok = df.sparkSession.sparkContext.broadcast(tok_map)
        thr = float(jaccard_threshold)
        id_t = df.schema[id_col].dataType.simpleString()

        # distinct-first on this route too: verify-before-distinct was
        # A/B-measured ~2x SLOWER (the multi-band duplicate factor
        # multiplies the Arrow transfer and kernel work by more than
        # the distinct exchange costs)
        cand = raw_cand.distinct()

        def _verify(batches):
            tm = bc_tok.value
            for pb in batches:
                if not len(pb):
                    continue
                ra, rb = pb["rep_a"].to_numpy(), pb["rep_b"].to_numpy()
                jac = np.empty(len(pb), dtype=np.float64)
                keep = np.ones(len(pb), dtype=bool)
                for i in range(len(pb)):
                    sa, sb = tm.get(ra[i]), tm.get(rb[i])
                    if sa is None or sb is None:
                        keep[i] = False  # JVM: null array -> null jaccard
                        continue
                    inter = len(sa & sb)
                    den = len(sa) + len(sb) - inter
                    jac[i] = inter / den if den else float("nan")
                out = pb.assign(jaccard=jac)[keep]
                # Spark double ordering: NaN > any value, so NaN passes
                yield out[(out["jaccard"] >= thr) | np.isnan(out["jaccard"])]

        rep_pairs = cand.mapInPandas(
            _verify, f"rep_a {id_t}, rep_b {id_t}, jaccard double"
        )
    else:
        cand = raw_cand.distinct()

        def _bt(d: DataFrame) -> DataFrame:  # token-array payload joins
            return F.broadcast(d) if small_tok else d

        inter_sz = F.size(F.array_intersect("toh_a", "toh_b"))
        union_sz = F.size("toh_a") + F.size("toh_b") - inter_sz
        rep_pairs = (
            cand.join(
                _bt(
                    rep_tok.withColumnsRenamed(
                        {"rep_id": "rep_a", "toh": "toh_a"}
                    )
                ),
                "rep_a",
            )
            .join(
                _bt(
                    rep_tok.withColumnsRenamed(
                        {"rep_id": "rep_b", "toh": "toh_b"}
                    )
                ),
                "rep_b",
            )
            .withColumn("jaccard", inter_sz / union_sz)
            .where(F.col("jaccard") >= jaccard_threshold)
            .select("rep_a", "rep_b", "jaccard")
        )

    # round_digits=None returns the raw double division — bit-identical to
    # an exact-Jaccard SQL oracle dividing the same two small integers
    # (the recall-1 grading config relies on this; see registry.py)
    def _rd(c) -> Column:
        col = F.col(c) if isinstance(c, str) else c
        return F.round(col, round_digits) if round_digits is not None else col

    if not expand:
        sizes = grouped.select("rep_id", F.size("members").alias("n"))
        inter_c = (
            rep_pairs.join(
                _b(sizes.withColumnsRenamed({"rep_id": "rep_a", "n": "n_a"})),
                "rep_a",
            )
            .join(
                _b(sizes.withColumnsRenamed({"rep_id": "rep_b", "n": "n_b"})),
                "rep_b",
            )
            .select(
                "rep_a",
                "rep_b",
                _rd("jaccard").alias("jaccard"),
                (F.col("n_a") * F.col("n_b")).cast("long").alias("pairs"),
            )
        )
        n = F.size("members")
        intra_c = grouped.where(n > 1).select(
            F.col("rep_id").alias("rep_a"),
            F.col("rep_id").alias("rep_b"),
            F.lit(1.0).alias("jaccard"),
            (n * (n - 1) / 2).cast("long").alias("pairs"),
        )
        return release_on_gc(
            inter_c.unionByName(intra_c), grouped, banded
        )

    # --- stage 3: expand back to member pairs ----------------------------
    rep_groups = grouped.select("rep_id", "members")
    inter = (
        rep_pairs.join(
            _b(
                rep_groups.withColumnsRenamed(
                    {"rep_id": "rep_a", "members": "members_a"}
                )
            ),
            "rep_a",
        )
        .join(
            _b(
                rep_groups.withColumnsRenamed(
                    {"rep_id": "rep_b", "members": "members_b"}
                )
            ),
            "rep_b",
        )
        .select(
            F.explode("members_a").alias("m_a"), F.col("members_b"), "jaccard"
        )
        .select(
            "m_a", F.explode("members_b").alias("m_b"), "jaccard"
        )
        .select(
            F.least("m_a", "m_b").alias("id_a"),
            F.greatest("m_a", "m_b").alias("id_b"),
            "jaccard",
        )
    )
    intra = (
        members.alias("x")
        .join(
            members.alias("y"),
            on=[
                F.col("x.vocab_fp") == F.col("y.vocab_fp"),
                F.col("x.member_id") < F.col("y.member_id"),
            ],
        )
        .select(
            F.col("x.member_id").alias("id_a"),
            F.col("y.member_id").alias("id_b"),
            F.lit(1.0).alias("jaccard"),
        )
    )
    out = inter.unionByName(intra)
    if jaccard_threshold > 1.0:
        out = out.where(F.col("jaccard") >= jaccard_threshold)
    return release_on_gc(
        out.select("id_a", "id_b", _rd("jaccard").alias("jaccard")),
        grouped,
        banded,
    )


def char_shingles(text: Column, n: int = 3) -> Column:
    """Distinct character n-gram shingles of normalized text (JVM-only:
    Column.substr accepts Column offsets, unlike F.substring)."""
    norm = normalize_text(text)
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.length(norm) - (n - 1), F.lit(1))),
            lambda i: norm.substr(i, F.lit(n)),
        )
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    jaccard_threshold: float = 0.5,
) -> DataFrame:
    """Character n-gram Jaccard pairs via a shingle inverted-index join.

    The scalable formulation: explode (doc, shingle) rows, self-join ON
    THE SHINGLE (an equi-join — candidates meet only where they share a
    shingle), count shared shingles per pair, then jaccard =
    shared / (|a| + |b| - shared). No pairwise array comparison and no
    crossJoin; cost is Σ_shingle df(shingle)², the classic posting-list
    bound. Hot shingles (stop-grams) dominate that bound — production
    corpora drop the top-percentile document-frequency shingles first,
    same as stopword removal.
    """
    sh = df.select(
        F.col(id_col), F.explode(char_shingles(F.col(text_col), n)).alias("sh")
    )
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))

    shared = (
        sh.alias("a")
        .join(
            sh.alias("b"),
            on=[
                F.col("a.sh") == F.col("b.sh"),
                F.col(f"a.{id_col}") < F.col(f"b.{id_col}"),
            ],
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    return (
        shared.join(
            sizes.withColumnsRenamed({id_col: "id_a", "n_sh": "n_a"}), "id_a"
        )
        .join(sizes.withColumnsRenamed({id_col: "id_b", "n_sh": "n_b"}), "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.col("shared") / (F.col("n_a") + F.col("n_b") - F.col("shared"))
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= jaccard_threshold)
    )


def jaccard_pairs_prefix(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float = 0.7,
) -> DataFrame:
    """EXACT token-set Jaccard >= ``threshold`` pairs via prefix
    filtering (PPJoin-family, Chaudhuri et al. 2006 / Xiao et al.
    2008) — same output as the O(n²) anchor, scale-shaped plan.

    Prefix-filtering lemma: order every doc's distinct tokens by ONE
    global rarity order (document frequency asc, token asc as the
    tie-break). If J(a,b) >= t then |a∩b| >= ceil(t·|a|), so a's last
    ceil(t·|a|)-1 tokens cannot hold all shared tokens — at least one
    shared token falls in a's first |a| - ceil(t·|a|) + 1 tokens, and
    symmetrically for b. Candidates therefore only need an equi-join
    of PREFIX postings: rarest-token prefixes keep high-df tokens out
    of the index, so the Σdf² posting bound runs over rare tokens
    only — the failure mode of the full posting join (stop-token df²)
    is designed out, not trimmed. A length filter (t·|a| <= |b| and
    t·|b| <= |a|, necessary since J <= min/max) prunes before the
    exact verify; the verify recomputes inter/union on the full token
    arrays, so the prefix stage can only MISS nothing and ADMIT
    nothing wrong — output equality with the anchor is structural.

    Scale: exact-group collapse first (identical token SETS are
    interchangeable under set-Jaccard — the same collapse-before-join
    the MinHash pipeline uses, so a duplicate-heavy corpus pays the
    join at representative grain, not doc grain), then two
    aggregations (token df, per-rep rank), one equi-join on prefix
    tokens (bounded by Σ_{rare t} df(t)²), one distinct at pair grain,
    one verify join, and a member fan-out at the end (intra-group
    pairs are Jaccard exactly 1.0 by construction). All JVM
    expressions.
    """
    from pyspark.sql.window import Window

    docs = df.select(
        F.col(id_col).alias("id"),
        F.array_sort(
            F.array_distinct(tokens(F.col(text_col)))
        ).alias("u"),
    ).withColumn("s", F.size("u"))
    docs = docs.where(F.col("s") > 0)

    grp = (
        docs.groupBy(F.xxhash64(F.concat_ws("\x1f", "u")).alias("g"))
        .agg(
            F.min("id").alias("id"),
            F.sort_array(F.collect_list("id")).alias("members"),
            F.first("u").alias("u"),
            F.first("s").alias("s"),
        )
    )
    tok = grp.select("id", "u", "s")

    posts = tok.select("id", "s", F.explode("u").alias("t"))
    df_tok = posts.groupBy("t").agg(F.count(F.lit(1)).alias("df"))
    ranked = posts.join(df_tok, "t").withColumn(
        "pos",
        F.row_number().over(Window.partitionBy("id").orderBy("df", "t")),
    )
    prefix = ranked.where(
        F.col("pos")
        <= F.col("s") - F.ceil(F.lit(threshold) * F.col("s")) + 1
    )

    a = prefix.select(
        F.col("id").alias("id_a"), F.col("s").alias("sa"), "t"
    )
    b = prefix.select(
        F.col("id").alias("id_b"), F.col("s").alias("sb"), "t"
    )
    cand = (
        a.join(b, "t")
        .where(
            (F.col("id_a") < F.col("id_b"))
            & (F.lit(threshold) * F.col("sa") <= F.col("sb"))
            & (F.lit(threshold) * F.col("sb") <= F.col("sa"))
        )
        .select("id_a", "id_b")
        .distinct()
    )

    ta = tok.select(F.col("id").alias("id_a"), F.col("u").alias("ua"))
    tb = tok.select(F.col("id").alias("id_b"), F.col("u").alias("ub"))
    inter = F.size(F.array_intersect("ua", "ub"))
    union = F.size("ua") + F.size("ub") - inter
    rep_pairs = (
        cand.join(ta, "id_a")
        .join(tb, "id_b")
        .select("id_a", "id_b", (inter / union).alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )

    # fan back out to doc grain: cross-group pairs inherit the rep
    # pair's jaccard (identical token sets are interchangeable);
    # intra-group pairs are jaccard 1.0 by construction (inter = union
    # = s — the anchor's division yields exactly 1.0 for them)
    mem = grp.select(F.col("id").alias("rep"), "members")
    cross = (
        rep_pairs.join(
            mem.withColumnsRenamed({"rep": "id_a", "members": "ma"}),
            "id_a",
        )
        .join(
            mem.withColumnsRenamed({"rep": "id_b", "members": "mb"}),
            "id_b",
        )
        .select(
            F.explode("ma").alias("da"),
            F.col("mb"),
            "jaccard",
        )
        .select(
            F.col("da"), F.explode("mb").alias("db"), "jaccard"
        )
        .select(
            F.least("da", "db").alias("id_a"),
            F.greatest("da", "db").alias("id_b"),
            "jaccard",
        )
    )
    intra = (
        grp.where(F.size("members") >= 2)
        .select(
            F.explode(
                F.flatten(
                    F.transform(
                        F.col("members"),
                        lambda x, i: F.transform(
                            F.slice(
                                F.col("members"),
                                i + F.lit(2),
                                F.size("members") - i - 1,
                            ),
                            lambda y: F.struct(
                                x.alias("id_a"), y.alias("id_b")
                            ),
                        ),
                    )
                )
            ).alias("p")
        )
        .select(
            F.col("p.id_a"),
            F.col("p.id_b"),
            F.lit(1.0).alias("jaccard"),
        )
    )
    return cross.unionByName(intra)


def containment_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    threshold: float = 0.9,
) -> DataFrame:
    """ASYMMETRIC near-dup detection: containment(A in B) =
    |shingles(A) ∩ shingles(B)| / |shingles(A)|.

    Jaccard misses the boilerplate/quotation case — a short doc wholly
    copied inside a much longer one scores low symmetric similarity but
    containment ≈ 1. This is the Broder containment measure training
    pipelines use to catch quoted/templated text that survives
    Jaccard-threshold dedup.

    Same inverted-index shape and Σ df(shingle)² cost bound as
    ``ngram_jaccard_pairs`` (one posting self-join, no crossJoin), but
    DIRECTED: emits (contained_id, container_id, containment) both ways
    a pair qualifies. A high threshold τ implies |B| ≥ τ·|A| matches
    only, so the directed fan-out stays bounded by the same posting
    lists.
    """
    sh = df.select(
        F.col(id_col), F.explode(char_shingles(F.col(text_col), n)).alias("sh")
    )
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))

    shared = (
        sh.alias("a")
        .join(
            sh.alias("b"),
            on=[
                F.col("a.sh") == F.col("b.sh"),
                F.col(f"a.{id_col}") != F.col(f"b.{id_col}"),
            ],
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("contained_id"),
            F.col(f"b.{id_col}").alias("container_id"),
        )
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    return (
        shared.join(
            sizes.withColumnsRenamed(
                {id_col: "contained_id", "n_sh": "n_contained"}
            ),
            "contained_id",
        )
        .select(
            "contained_id",
            "container_id",
            (F.col("shared") / F.col("n_contained")).alias("containment"),
        )
        .where(F.col("containment") >= threshold)
    )


def edit_distance_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_dist: int = 2,
    n: int = 3,
) -> DataFrame:
    """Fuzzy record-linkage pairs: all (id_a < id_b) whose strings are
    within ``max_dist`` Levenshtein edits, WITHOUT the O(n²) pairwise
    scan.

    Candidate generation is an n-gram posting-list join, which is
    COMPLETE for this distance bound: one edit perturbs at most ``n``
    positional n-grams, so ``max_dist`` edits perturb at most ``n·d``
    of a string's ``L−n+1`` grams — any string with
    ``L ≥ n·(max_dist+1)`` keeps at least one gram intact, and that
    gram appears verbatim in the partner. Inputs shorter than that
    bound are excluded (both here and in any oracle) rather than
    silently half-checked. A length band (|len(a)−len(b)| ≤ d, since
    edit distance ≥ length difference) prunes candidates before the
    exact ``levenshtein`` verify.

    Cost: Σ df(gram)² posting bound for candidates + one exact verify
    per surviving DISTINCT pair — the standard q-gram filter-verify
    join (public scheme, e.g. Gravano et al. VLDB'01), not all-pairs.
    """
    min_len = n * (max_dist + 1)
    s = df.select(
        F.col(id_col).alias("id"),
        normalize_text(F.col(text_col)).alias("s"),
    ).where(F.length("s") >= min_len)
    sh = s.select(
        "id", F.length("s").alias("len"),
        F.explode(char_shingles(F.col("s"), n)).alias("g"),
    )
    cands = (
        sh.alias("a")
        .join(
            sh.alias("b"),
            on=[
                F.col("a.g") == F.col("b.g"),
                F.col("a.id") < F.col("b.id"),
                F.abs(F.col("a.len") - F.col("b.len")) <= max_dist,
            ],
        )
        .select(
            F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b")
        )
        .distinct()
    )
    return (
        cands.join(s.withColumnsRenamed({"id": "id_a", "s": "s_a"}), "id_a")
        .join(s.withColumnsRenamed({"id": "id_b", "s": "s_b"}), "id_b")
        .select(
            "id_a", "id_b", F.levenshtein("s_a", "s_b").alias("dist")
        )
        .where(F.col("dist") <= max_dist)
    )


def simhash(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """64-bit SimHash fingerprint per document.

    For each bit position i: sum over tokens of (+1 if bit i of
    xxhash64(token) else -1); bit i of the fingerprint = sign. Expressed as
    one ``F.aggregate`` over the token array with a 64-slot accumulator —
    stays entirely in the JVM. Bit positions are unrolled as literal ints
    (Spark's shift functions take Python ints, not Columns).
    """

    def _bit_contrib(t):
        # +1/-1 per bit of the token hash, as a 64-slot array
        return F.array(
            *[
                F.when(
                    F.shiftright(F.xxhash64(t), i).bitwiseAND(F.lit(1)) == 1,
                    F.lit(1),
                )
                .otherwise(F.lit(-1))
                .cast("long")
                for i in range(64)
            ]
        )

    toks = tokens(F.col(text_col))
    acc = F.aggregate(
        toks,
        F.array_repeat(F.lit(0).cast("long"), 64),
        lambda acc, t: F.zip_with(acc, _bit_contrib(t), lambda a, b: a + b),
    )
    with_acc = df.select(F.col(id_col), acc.alias("acc"))

    fingerprint = None
    for i in range(64):
        # bit 63 is the sign bit: 1<<63 overflows long, use long-min
        bit_val = (1 << i) if i < 63 else -(1 << 63)
        term = F.when(
            F.element_at("acc", i + 1) > 0, F.lit(bit_val).cast("long")
        ).otherwise(F.lit(0).cast("long"))
        fingerprint = term if fingerprint is None else fingerprint.bitwiseOR(term)
    return with_acc.select(F.col(id_col), fingerprint.alias("simhash"))


def simhash_near_duplicates(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_hamming: int = 3,
) -> DataFrame:
    """Pairs with SimHash Hamming distance <= max_hamming.

    Pigeonhole banding: split the 64-bit hash into 4 16-bit chunks; any
    pair within Hamming distance 3 agrees exactly on >=1 chunk, so joining
    on (chunk_index, chunk_value) finds all such pairs without a crossJoin.
    """
    sh = simhash(df, text_col, id_col)
    chunks = sh.select(
        F.col(id_col),
        F.col("simhash"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftrightunsigned("simhash", 16 * c)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("val"),
                    )
                    for c in range(4)
                ]
            )
        ).alias("ck"),
    ).select(id_col, "simhash", "ck.chunk", "ck.val")

    a, b = chunks.alias("a"), chunks.alias("b")
    pairs = (
        a.join(
            b,
            on=[
                F.col("a.chunk") == F.col("b.chunk"),
                F.col("a.val") == F.col("b.val"),
                F.col(f"a.{id_col}") < F.col(f"b.{id_col}"),
            ],
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
        .withColumn("hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))))
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
    return pairs


def word_ngrams_of(toks_name: str, n: int) -> Column:
    """Space-joined word n-grams over an ALREADY-MATERIALIZED token
    array column (empty array when the document has fewer than n tokens
    — sequence() would otherwise count DOWN and fabricate grams).

    Takes a column NAME, not an expression, deliberately: a lambda body
    is outside common-subexpression elimination, so an inline tokenizer
    expression would re-run normalize+split once per gram per row; and
    gram assembly uses element_at (O(1) per offset), not
    slice-inside-transform (O(len) copy per position → O(len²) per doc)
    — the same two pitfalls text.py's gram builder documents."""
    parts = ", ".join(f"element_at({toks_name}, i + {j})" for j in range(n))
    return F.when(
        F.size(toks_name) >= n,
        F.expr(
            f"transform(sequence(1, size({toks_name}) - {n - 1}), "
            f"i -> concat_ws(' ', {parts}))"
        ),
    ).otherwise(F.array().cast("array<string>"))


def _distinct_grams(
    df: DataFrame, text_col: str, id_col: str, n: int, out_id: str
) -> DataFrame:
    """(out_id, gram) pairs, distinct per document by construction:
    tokens materialize in their own projection (word_ngrams_of's
    contract), array_distinct runs BEFORE explode so no post-explode
    shuffle is ever needed."""
    return df.select(
        F.col(id_col).alias(out_id),
        tokens(F.col(text_col)).alias("__toks"),
    ).select(
        out_id,
        F.explode(F.array_distinct(word_ngrams_of("__toks", n))).alias(
            "gram"
        ),
    )


def ngram_contamination(
    train: DataFrame,
    bench: DataFrame,
    n: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_bench: bool = True,
) -> DataFrame:
    """Benchmark-contamination report: training documents sharing at
    least one word n-gram with a held-out benchmark set → (doc_id,
    shared_grams, bench_docs).

    The decontamination step of every serious LLM training pipeline:
    n-gram collision with an eval set means the example leaks the
    benchmark. Both sides explode to DISTINCT (id, gram) pairs; the
    benchmark side is broadcast by default — eval suites are tiny
    relative to a 100 TB corpus, so the contamination check is a
    map-side join over the train scan, no train-side shuffle. Set
    ``broadcast_bench=False`` for benchmark sets beyond broadcast size
    (falls back to a shuffle join on the gram key).
    """
    tg = _distinct_grams(train, text_col, id_col, n, "train_id")
    bg = _distinct_grams(bench, text_col, id_col, n, "bench_id")
    if broadcast_bench:
        bg = F.broadcast(bg)
    return (
        tg.join(bg, "gram")
        .groupBy(F.col("train_id").alias(id_col))
        .agg(
            F.countDistinct("gram").alias("shared_grams"),
            F.countDistinct("bench_id").alias("bench_docs"),
        )
    )


def incremental_dedup_report(
    old_df: DataFrame,
    new_df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    jaccard_threshold: float = 0.8,
    round_to: int = 6,
) -> DataFrame:
    """Verdict for every arriving document against an existing corpus —
    the daily-ingest dedup shape. Returns one row per new doc:
    (id, kind, match_id, jaccard) where kind is 'exact' (normalized
    text identical to some corpus doc; match_id = smallest such id),
    'near' (char-n-gram Jaccard >= threshold; match_id = best match by
    jaccard desc then id), or 'unique' (both NULL).

    Why a dedicated operator instead of pairing old ∪ new with itself:
    the batch-vs-corpus posting join costs Σ_sh df_old(sh)·df_new(sh) —
    old-old pairs (the overwhelming majority at 100 TB, and already
    adjudicated in previous runs) are never generated. Exact matching
    is an equi-join on 32-byte fingerprints; at scale the corpus-side
    fingerprints and posting lists are the persisted index this
    operator probes, not something recomputed per batch.
    """
    old_fp, sh_old = build_dedup_index(old_df, text_col, id_col, n=n)
    return incremental_dedup_report_indexed(
        old_fp,
        sh_old,
        new_df,
        text_col,
        id_col,
        n=n,
        jaccard_threshold=jaccard_threshold,
        round_to=round_to,
    )


def build_dedup_index(
    df: DataFrame, text_col: str, id_col: str, n: int = 3
) -> tuple[DataFrame, DataFrame]:
    """The corpus-side dedup index as two persistable tables:
    fingerprints ``(old_id, fp)`` and shingle postings ``(old_id, sh)``.

    This is the state a production admission pipeline APPENDS per
    admitted batch (e.g. into delta-lite tables) instead of re-deriving
    md5 + shingles over the whole corpus text on every micro-batch —
    the probe then scans two narrow index tables, never the corpus
    text. ``incremental_dedup_report`` is the recompute-wrapper over
    this; ``incremental_dedup_report_indexed`` is the probe."""
    fp = F.md5(normalize_text(F.col(text_col)))
    fp_df = df.select(F.col(id_col).alias("old_id"), fp.alias("fp"))
    postings = df.select(
        F.col(id_col).alias("old_id"),
        F.explode(char_shingles(F.col(text_col), n)).alias("sh"),
    )
    return fp_df, postings


def incremental_dedup_report_indexed(
    old_fp: DataFrame,
    old_postings: DataFrame,
    new_df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    jaccard_threshold: float = 0.8,
    round_to: int = 6,
    bloom: DataFrame | None = None,
    bloom_bits: int = 1 << 23,
    bloom_hashes: int = 5,
) -> DataFrame:
    """``incremental_dedup_report`` probing a PERSISTED corpus index
    (``build_dedup_index`` schemas: ``(old_id, fp)`` / ``(old_id, sh)``)
    instead of recomputing fingerprints+shingles from corpus text. Same
    verdict semantics, but per-batch cost no longer touches corpus text
    at all — the 100 TB admission-control shape.

    ``bloom``: optional ``(word, bits)`` filter (ext/bloom.py) covering
    every fp in ``old_fp``. When given, the exact-fingerprint join is
    gated map-side: definite-new fps (no false negatives) never reach
    the fp-index shuffle, so the exact branch's join input shrinks to
    the maybe-member sliver. Verdicts are unchanged — the filter only
    prunes rows that provably cannot match."""
    from pyspark.sql import Window

    fp = F.md5(normalize_text(F.col(text_col)))
    new_fp = new_df.select(F.col(id_col), fp.alias("fp"))
    exact_probe = new_fp
    if bloom is not None:
        from data_lakehouse_project_spark.ext.bloom import bloom_probe

        exact_probe = (
            bloom_probe(new_fp, "fp", bloom, bloom_bits, bloom_hashes)
            .where(F.col("maybe_member"))
            .select(id_col, "fp")
        )
    exact = (
        exact_probe.join(old_fp, "fp")
        .groupBy(id_col)
        .agg(F.min("old_id").alias("exact_match"))
    )

    sh_new = new_df.select(
        F.col(id_col), F.explode(char_shingles(F.col(text_col), n)).alias("sh")
    )
    sh_old = old_postings
    n_new = sh_new.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_a"))
    n_old = sh_old.groupBy("old_id").agg(F.count(F.lit(1)).alias("n_b"))
    shared = (
        sh_new.join(sh_old, "sh")
        .groupBy(id_col, "old_id")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    jacc = F.col("shared") / (F.col("n_a") + F.col("n_b") - F.col("shared"))
    w = Window.partitionBy(id_col).orderBy(
        F.desc("jaccard"), F.col("old_id")
    )
    best_near = (
        shared.join(n_new, id_col)
        .join(n_old, "old_id")
        .withColumn("jaccard", jacc)
        .where(F.col("jaccard") >= jaccard_threshold)
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            F.col(id_col),
            F.col("old_id").alias("near_match"),
            F.col("jaccard").alias("near_jaccard"),
        )
    )

    scale = float(10**round_to)
    rnd = F.floor(F.col("near_jaccard") * scale + F.lit(0.5)).cast(
        "double"
    ) / scale
    return (
        new_df.select(F.col(id_col))
        .join(exact, id_col, "left")
        .join(best_near, id_col, "left")
        .select(
            F.col(id_col),
            F.when(F.col("exact_match").isNotNull(), F.lit("exact"))
            .when(F.col("near_match").isNotNull(), F.lit("near"))
            .otherwise(F.lit("unique"))
            .alias("kind"),
            F.coalesce("exact_match", "near_match").alias("match_id"),
            F.when(F.col("exact_match").isNotNull(), F.lit(1.0))
            .when(F.col("near_match").isNotNull(), rnd)
            .alias("jaccard"),
        )
    )


def _dup_window_hits(
    df: DataFrame,
    text_col: str,
    id_col: str,
    window: int,
    min_repeats: int,
    stride: int,
) -> DataFrame:
    """Shared front half of the ExactSubstr family: rolling-hash
    windows, optional content-defined sampling, corpus frequency
    table, join-back. Returns (id, n_tokens, pos, whash) for every
    window occurring >= min_repeats times corpus-wide.

    The window construction (tokenize + per-start slice/concat/hash) is
    the heavy per-row stage AND is evaluated by two consumers (the
    frequency-table aggregate and the join-back), so an
    under-partitioned input pays it twice on one core — fan out first
    (measured 1.4x at sf0.1; no-op on multi-split inputs)."""
    from data_lakehouse_project_spark.ext.skew import fan_out_input

    df = fan_out_input(df, id_col)
    arr = tokens(F.col(text_col))
    base = df.select(
        F.col(id_col), arr.alias("arr"), F.size(arr).alias("n_tokens")
    ).where(F.col("n_tokens") >= window)
    starts = F.sequence(F.lit(1), F.col("n_tokens") - window + 1)
    wins = base.select(
        id_col,
        "n_tokens",
        F.explode(
            F.transform(
                starts,
                lambda i: F.struct(
                    i.alias("pos"),
                    F.xxhash64(
                        F.concat_ws(" ", F.slice("arr", i, window))
                    ).alias("whash"),
                ),
            )
        ).alias("w"),
    ).select(id_col, "n_tokens", "w.pos", "w.whash")
    if stride > 1:
        wins = wins.where(F.pmod("whash", F.lit(stride)) == 0)

    # persist the window table: it feeds BOTH the frequency aggregate
    # and the join-back, and the two subtrees differ (agg vs join), so
    # ReuseExchange never fires — without the cache the window
    # construction (tokenize + per-start slice/concat/hash, the heavy
    # per-row stage) runs twice (A/B sf0.1: 1.90 -> 1.26 s). Rows are
    # (id, n_tokens, pos, whash) ≈ 30 B/window — MEMORY_AND_DISK
    # default spills rather than OOMs at corpus scale, and ``stride``
    # divides the cached volume on the 100 TB path. Released with the
    # result (release_on_gc), same lifecycle as the minhash caches.
    wins = wins.persist()
    dup_hashes = (
        wins.groupBy("whash")
        .agg(F.count(F.lit(1)).alias("occ"))
        .where(F.col("occ") >= min_repeats)
        .select("whash")
    )
    # callers tie `wins` to their FINAL result via release_on_gc —
    # attaching it to this intermediate would free the cache the moment
    # the local name goes out of scope, before the query ever runs
    return wins.join(dup_hashes, "whash"), wins


def duplicated_window_spans(
    df: DataFrame,
    text_col: str,
    id_col: str,
    window: int = 8,
    min_repeats: int = 2,
    stride: int = 1,
    summary: bool = True,
    round_to: int = 2,
) -> DataFrame:
    """Exact duplicated-substring spans, ExactSubstr-style (Lee et al.
    2021, "Deduplicating Training Data Makes Language Models Better"):
    every token window of length ``window`` that occurs >= ``min_repeats``
    times anywhere in the corpus (across OR within documents) marks its
    covering positions as duplicated; overlapping duplicated windows are
    merged into maximal per-document spans.

    Distributed shape (the suffix-array of the paper is a single-machine
    structure; this is the shuffle-native equivalent):

    1. per doc: rolling xxhash64 over each aligned ``window``-token
       slice — pure JVM ``transform``/``slice``/``concat_ws``, no UDF;
    2. a 16 B/window ``(whash, count-partial)`` shuffle builds the
       corpus frequency table (map-side combine; volume O(corpus token
       count) regardless of token bytes — same order as the minhash
       shingle pipeline); position tuples themselves never shuffle
       globally, only the matching HITS move (step 4);
    3. hash-groupBy keeps hashes with total count >= ``min_repeats``
       (a corpus-wide frequency table, NOT a pair join — cost never
       touches |bucket|^2);
    4. join positions back on the 8-byte hash (AQE broadcasts when the
       duplicated set is small), then per-doc interval-merge with one
       window function.

    ``stride`` > 1 is the 100 TB dial: it keeps only windows whose hash
    is ``0 (mod stride)`` — CONTENT-DEFINED sampling (the CDC-chunking
    trick), so the two copies of a repeated substring select identical
    windows no matter their byte offsets. (Arithmetic every-k-th-start
    sampling is broken here: copies at different offsets sample
    disjoint windows and a duplicated span of ANY length can be
    missed.) Step-2 volume drops by ~stride; a span containing w
    duplicated windows is missed with probability (1 - 1/stride)^w, so
    pick stride << expected span length. Sampled hits from one run can
    sit further than ``window`` apart, so one physical span may report
    as several — counts are a sampling floor, never an overcount.

    ``summary=True`` returns one row per affected doc
    ``(id, n_tokens, n_dup_spans, dup_tokens, max_span_tokens,
    dup_fraction)``; ``summary=False`` returns the spans themselves
    ``(id, span_start, span_end, span_tokens)`` (1-based, inclusive).

    Window-hash collisions (~p = n_windows^2 / 2^65) can in principle
    mark a non-duplicated span; the paper's suffix array is exact. At
    any feasible corpus size the expected false-span count is << 1.
    """
    from pyspark.sql import Window as W

    hits, wins = _dup_window_hits(
        df, text_col, id_col, window, min_repeats, stride
    )

    ordered = W.partitionBy(id_col).orderBy("pos")
    # fixed-length aligned windows => span ends are monotone in pos, so
    # a single lag(pos) decides island breaks (no running-max needed)
    islands = (
        hits.withColumn(
            "brk",
            F.when(
                F.col("pos") > F.lag("pos").over(ordered) + window, 1
            ).otherwise(0),
        )
        .withColumn(
            "island",
            F.sum("brk").over(
                ordered.rowsBetween(W.unboundedPreceding, 0)
            ),
        )
    )
    spans = islands.groupBy(id_col, "island").agg(
        F.any_value("n_tokens").alias("n_tokens"),
        F.min("pos").alias("span_start"),
        (F.max("pos") + window - 1).alias("span_end"),
    )
    if not summary:
        return release_on_gc(
            spans.select(
                id_col,
                F.col("span_start").cast("long"),
                F.col("span_end").cast("long"),
                (F.col("span_end") - F.col("span_start") + 1)
                .cast("long")
                .alias("span_tokens"),
            ),
            wins,
        )
    span_len = F.col("span_end") - F.col("span_start") + 1
    scale = float(10**round_to)
    frac = F.sum(span_len) / F.any_value("n_tokens")
    return release_on_gc(
        spans.groupBy(id_col).agg(
            F.any_value("n_tokens").cast("long").alias("n_tokens"),
            F.count(F.lit(1)).cast("long").alias("n_dup_spans"),
            F.sum(span_len).cast("long").alias("dup_tokens"),
            F.max(span_len).cast("long").alias("max_span_tokens"),
            (F.floor(frac * scale + F.lit(0.5)).cast("double") / scale)
            .alias("dup_fraction"),
        ),
        wins,
    )


def trim_duplicated_spans(
    df: DataFrame,
    text_col: str,
    id_col: str,
    window: int = 8,
    min_repeats: int = 2,
    stride: int = 1,
) -> DataFrame:
    """Boilerplate trimming: rewrite each document's text with its
    duplicated spans (``duplicated_window_spans`` definition) REMOVED —
    the "cut" step of ExactSubstr dedup as used for boilerplate
    (headers/footers/navigation chrome that repeats corpus-wide).

    Honest semantic note: this removes EVERY occurrence of a duplicated
    span (the right call for boilerplate, where no copy belongs in
    training data). The paper's keep-one-global-copy variant requires
    electing a canonical occurrence per duplicate class — at corpus
    scale that is a second groupBy on span hash; compose it from
    ``duplicated_window_spans(summary=False)`` if needed.

    Scale shape: spans per doc collapse to an array via one groupBy
    (span counts are bounded by dup windows, already computed), the
    rewrite itself is a pure JVM higher-order-function projection
    (``filter`` + ``exists`` over the token array) — no Python on rows,
    no extra shuffle beyond the span computation.

    Returns the input columns with ``text_col`` rewritten and
    ``n_tokens_removed`` appended (0 for untouched docs).
    """
    spans = duplicated_window_spans(
        df,
        text_col,
        id_col,
        window=window,
        min_repeats=min_repeats,
        stride=stride,
        summary=False,
    )
    per_doc = spans.groupBy(id_col).agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("_spans")
    )
    # `spans` carries the release_on_gc of the persisted window table;
    # it must outlive the derived result or the window construction
    # (the heavy per-row stage) recomputes per consumer in the caller's
    # action — pin it to the returned frame (cacheutil.keep_alive)
    from data_lakehouse_project_spark.cacheutil import keep_alive
    arr = tokens(F.col(text_col))
    indexed = F.zip_with(
        arr,
        F.sequence(F.lit(1), F.size(arr)),
        lambda t, i: F.struct(t.alias("tok"), i.alias("pos")),
    )
    covered = lambda t: F.exists(
        F.col("_spans"),
        lambda s: (t["pos"] >= s["span_start"])
        & (t["pos"] <= s["span_end"]),
    )
    kept = F.filter(indexed, lambda t: ~covered(t))
    out_cols = [
        c for c in df.columns if c != text_col
    ]
    joined = df.join(per_doc, id_col, "left")
    return keep_alive(
        joined.select(
            *out_cols,
            F.when(
                F.col("_spans").isNull(), F.col(text_col)
            )
            .otherwise(
                F.concat_ws(
                    " ", F.transform(kept, lambda t: t["tok"])
                )
            )
            .alias(text_col),
            F.when(F.col("_spans").isNull(), F.lit(0))
            .otherwise(F.size(arr) - F.size(kept))
            .cast("long")
            .alias("n_tokens_removed"),
        ),
        spans,
    )


def trim_duplicated_spans_keep_one(
    df: DataFrame,
    text_col: str,
    id_col: str,
    window: int = 8,
    min_repeats: int = 2,
    stride: int = 1,
) -> DataFrame:
    """The paper-faithful ExactSubstr cut: for every duplicated window
    class, the CANONICAL occurrence (first by (id, pos) — deterministic
    row_number over the class) keeps its text; every other occurrence
    is cut. Exactly one copy of duplicated content survives corpus-wide
    (``trim_duplicated_spans`` removes all copies — the boilerplate
    posture; this variant is the dedup posture).

    A position survives iff it is NOT covered by any non-canonical
    duplicated window, OR it is covered by a canonical one (overlapping
    classes can disagree; protection wins, so survivors err toward
    keeping one copy rather than shredding).

    Scale shape: one row_number over the per-class hits (co-partitioned
    by whash from the frequency join), then ONE id-partitioned window
    pass computes both span sets — islands break on a position gap OR a
    protected-class change (ordering by (protected, pos) keeps each
    class contiguous), so the cut/prot split costs no second shuffle
    and every downstream aggregate + the final join reuse the id
    partitioning (plan_audit caught the original two-subset version
    recomputing the hit pipeline once per class: 10 exchanges → 6).
    """
    from pyspark.sql import Window as W

    hits, wins = _dup_window_hits(
        df, text_col, id_col, window, min_repeats, stride
    )
    cls = W.partitionBy("whash").orderBy(id_col, "pos")
    flagged = hits.withColumn(
        "protected", F.row_number().over(cls) == 1
    )

    ordered = W.partitionBy(id_col).orderBy("protected", "pos")
    span_struct = F.struct(
        F.min("pos").alias("s"), (F.max("pos") + window - 1).alias("e")
    )
    spans_per_doc = (
        flagged.withColumn(
            "brk",
            F.when(
                (F.col("pos") > F.lag("pos").over(ordered) + window)
                | (
                    F.col("protected")
                    != F.lag("protected").over(ordered)
                ),
                1,
            ).otherwise(0),
        )
        .withColumn(
            "island",
            F.sum("brk").over(
                ordered.rowsBetween(W.unboundedPreceding, 0)
            ),
        )
        .groupBy(id_col, "protected", "island")
        .agg(span_struct.alias("sp"))
        .groupBy(id_col)
        .agg(
            F.collect_list(
                F.when(~F.col("protected"), F.col("sp"))
            ).alias("_cut_raw"),
            F.collect_list(
                F.when(F.col("protected"), F.col("sp"))
            ).alias("_prot"),
        )
        # docs whose every hit is protected have no cut spans: treat as
        # untouched (NULL _cut), matching the two-frame formulation
        .select(
            id_col,
            F.when(F.size("_cut_raw") > 0, F.col("_cut_raw")).alias(
                "_cut"
            ),
            "_prot",
        )
    )

    arr = tokens(F.col(text_col))
    indexed = F.zip_with(
        arr,
        F.sequence(F.lit(1), F.size(arr)),
        lambda t, i: F.struct(t.alias("tok"), i.alias("pos")),
    )
    in_spans = lambda col, t: F.exists(
        F.coalesce(F.col(col), F.array()),
        lambda s: (t["pos"] >= s["s"]) & (t["pos"] <= s["e"]),
    )
    kept = F.filter(
        indexed,
        lambda t: ~in_spans("_cut", t) | in_spans("_prot", t),
    )
    out_cols = [c for c in df.columns if c != text_col]
    joined = df.join(spans_per_doc, id_col, "left")
    return release_on_gc(
        joined.select(
            *out_cols,
            F.when(F.col("_cut").isNull(), F.col(text_col))
            .otherwise(
                F.concat_ws(" ", F.transform(kept, lambda t: t["tok"]))
            )
            .alias(text_col),
            F.when(F.col("_cut").isNull(), F.lit(0))
            .otherwise(F.size(arr) - F.size(kept))
            .cast("long")
            .alias("n_tokens_removed"),
        ),
        wins,
    )
