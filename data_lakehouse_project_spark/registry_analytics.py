"""Analytics batch 4: conversion attribution, visualization
downsampling (M4 / LTOB), grid-binned geo radius join, CMS estimates.

North-star operators past the reference's surface (SURVEY §2.9): the
reference ingests raw events (`mysql_bronze_ingestion.py`) but has no
funnel/attribution, time-series-reduction, or spatial analytics on top.
Each query here is the end-to-end shape a warehouse user runs, with the
exact DuckDB oracle alongside (same formula text where float math is
involved, so the hash comparison is byte-fair).

Oracle parity notes:
- Buckets are computed as floor(epoch/width)*width on BOTH engines
  (not F.window / time_bucket, whose default origins differ), and
  emitted as formatted strings per registry convention.
- The haversine SQL is generated from the same constants as the Spark
  column expression (ext/geo.py::haversine_sql).
- M4 representative tie-breaks are lexicographic struct min/max on the
  Spark side; the oracle reproduces them with row_number orderings
  (ts,v / v,ts in the matching directions).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_lakehouse_project_spark.ext import attribution as X_attr
from data_lakehouse_project_spark.ext import downsample as X_ds
from data_lakehouse_project_spark.ext import frequent as X_freq
from data_lakehouse_project_spark.ext import geo as X_geo
from data_lakehouse_project_spark.sources.readers import load_testdata

_helpers: dict = {}

_FMT = "yyyy-MM-dd HH:mm:ss"
_FMT_DUCK = "%Y-%m-%d %H:%M:%S"


def _rn(col, n):
    return _helpers["_rn"](col, n)


def _t(spark, sf_dir, *names):
    tables = load_testdata(spark, sf_dir, names=names)
    return [tables[n] for n in names]


# --- attribution ------------------------------------------------------------

def q_attribution_last_touch(spark, sf_dir):
    """Channel report under last-touch attribution: each purchase
    credits its most recent view/click within 72 h. One user_id join +
    one per-conversion window + one channel-grain groupBy
    (ext/attribution.py)."""
    (events,) = _t(spark, sf_dir, "events")
    rep = X_attr.attribution_report(events, model="last")
    return rep.select(
        "touch_type",
        "touches_credited",
        "conversions",
        _rn(F.col("credit"), 2).alias("credit"),
    )


def q_attribution_linear(spark, sf_dir):
    """Channel report under linear attribution: each purchase splits
    credit 1/n across all touches in its 72 h lookback."""
    (events,) = _t(spark, sf_dir, "events")
    rep = X_attr.attribution_report(events, model="linear")
    return rep.select(
        "touch_type",
        "touches_credited",
        "conversions",
        _rn(F.col("credit"), 2).alias("credit"),
    )


_SQL_ATTR_BASE = """
WITH conv AS (
  SELECT user_id, event_id AS conv_id, ts AS conv_ts
  FROM events WHERE event_type = 'purchase'
), touch AS (
  SELECT user_id, event_id AS touch_id, ts AS touch_ts,
         event_type AS touch_type
  FROM events WHERE event_type IN ('view', 'click')
), j AS (
  SELECT c.conv_id, t.touch_id, t.touch_ts, t.touch_type
  FROM conv c JOIN touch t ON c.user_id = t.user_id
  WHERE t.touch_ts <= c.conv_ts
    AND epoch(c.conv_ts) - epoch(t.touch_ts) <= 72 * 3600
)
"""

SQL_ATTR_LAST = (
    _SQL_ATTR_BASE
    + """
, ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY conv_id ORDER BY touch_ts DESC, touch_id DESC
  ) AS rn FROM j
)
SELECT touch_type,
       count(*) AS touches_credited,
       count(DISTINCT conv_id) AS conversions,
       {CREDIT} AS credit
FROM ranked WHERE rn = 1
GROUP BY touch_type
"""
)

SQL_ATTR_LINEAR = (
    _SQL_ATTR_BASE
    + """
, wgt AS (
  SELECT touch_type, conv_id,
         1.0 / count(*) OVER (PARTITION BY conv_id) AS weight
  FROM j
)
SELECT touch_type,
       count(*) AS touches_credited,
       count(DISTINCT conv_id) AS conversions,
       {CREDIT} AS credit
FROM wgt
GROUP BY touch_type
"""
)


# --- downsampling -----------------------------------------------------------

def q_m4_downsample_events(spark, sf_dir):
    """M4 visualization downsampling of the events series to 1-hour
    pixel columns: ONE partial+final hash aggregate emitting the
    (first, last, min, max) points per bucket (ext/downsample.py;
    Jugel et al., VLDB'14). Bucket = floor(epoch/3600) for oracle-exact
    bucketing."""
    (events,) = _t(spark, sf_dir, "events")
    m4 = X_ds.m4_downsample(
        events,
        ts_col="ts",
        val_col="value",
        bucket_col=X_ds.epoch_bucket(events, "ts", 3600),
    )
    return m4.select(
        F.date_format("bucket_start", _FMT).alias("bucket_start"),
        F.date_format("first_ts", _FMT).alias("first_ts"),
        _rn(F.col("first_v"), 3).alias("first_v"),
        F.date_format("last_ts", _FMT).alias("last_ts"),
        _rn(F.col("last_v"), 3).alias("last_v"),
        F.date_format("min_ts", _FMT).alias("min_ts"),
        _rn(F.col("min_v"), 3).alias("min_v"),
        F.date_format("max_ts", _FMT).alias("max_ts"),
        _rn(F.col("max_v"), 3).alias("max_v"),
    )


SQL_M4 = """
WITH b AS (
  SELECT to_timestamp(CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT))
           AS bkt,
         ts, value
  FROM events
), r AS (
  SELECT *,
    row_number() OVER (PARTITION BY bkt ORDER BY ts ASC,  value ASC)  AS rf,
    row_number() OVER (PARTITION BY bkt ORDER BY ts DESC, value DESC) AS rl,
    row_number() OVER (PARTITION BY bkt ORDER BY value ASC,  ts ASC)  AS rmn,
    row_number() OVER (PARTITION BY bkt ORDER BY value DESC, ts DESC) AS rmx
  FROM b
)
SELECT strftime(bkt, '{FMT}') AS bucket_start,
       strftime(max(CASE WHEN rf  = 1 THEN ts END), '{FMT}') AS first_ts,
       {FIRST_V} AS first_v,
       strftime(max(CASE WHEN rl  = 1 THEN ts END), '{FMT}') AS last_ts,
       {LAST_V} AS last_v,
       strftime(max(CASE WHEN rmn = 1 THEN ts END), '{FMT}') AS min_ts,
       {MIN_V} AS min_v,
       strftime(max(CASE WHEN rmx = 1 THEN ts END), '{FMT}') AS max_ts,
       {MAX_V} AS max_v
FROM r
GROUP BY bkt
"""


def q_ltob_downsample_events(spark, sf_dir):
    """LTOB downsampling to 6-hour buckets: per bucket keep the point
    deviating most from the bucket mean (largest-triangle family,
    per-bucket-independent variant — Steinarsson 2013). One shuffle,
    two window functions (ext/downsample.py)."""
    (events,) = _t(spark, sf_dir, "events")
    ds = X_ds.ltob_downsample(
        events,
        ts_col="ts",
        val_col="value",
        bucket_col=X_ds.epoch_bucket(events, "ts", 21600),
    )
    return ds.select(
        F.date_format("bucket_start", _FMT).alias("bucket_start"),
        F.date_format("ts", _FMT).alias("ts"),
        _rn(F.col("value"), 3).alias("value"),
        _rn(F.col("bucket_avg"), 3).alias("bucket_avg"),
    )


SQL_LTOB = """
WITH b AS (
  SELECT to_timestamp(CAST(floor(epoch(ts) / 21600) * 21600 AS BIGINT))
           AS bkt,
         ts, value
  FROM events
), a AS (
  SELECT *, avg(value) OVER (PARTITION BY bkt) AS bucket_avg FROM b
), r AS (
  SELECT *, row_number() OVER (
    PARTITION BY bkt
    ORDER BY abs(value - bucket_avg) DESC, ts ASC, value ASC
  ) AS rn FROM a
)
SELECT strftime(bkt, '{FMT}') AS bucket_start,
       strftime(ts, '{FMT}') AS ts,
       {VAL} AS value,
       {AVG} AS bucket_avg
FROM r WHERE rn = 1
"""


# --- geo radius join --------------------------------------------------------

_GEO_RADIUS_KM = 50.0


def _with_coords(customer):
    """Deterministic synthetic coordinates from md5 of the customer key
    (the registry's portable-hash convention — Spark md5 ≡ DuckDB md5,
    so the oracle derives bit-identical points): lat in [-60, 60), lon
    in [-180, 180), uniform-ish. A linear-congruence projection was
    rejected: its difference lattice has no near pairs at all. The
    testdata carries no native geo columns; this projection is the
    documented fixture."""
    h = F.md5(F.col("c_custkey").cast("string"))
    h1 = F.conv(F.substring(h, 1, 8), 16, 10).cast("long")
    h2 = F.conv(F.substring(h, 9, 8), 16, 10).cast("long")
    return customer.select(
        F.col("c_custkey").alias("id"),
        ((h1 % 12000) / 100.0 - 60.0).alias("lat"),
        ((h2 % 36000) / 100.0 - 180.0).alias("lon"),
    )


def q_geo_neighbor_pairs(spark, sf_dir):
    """All customer pairs within 50 km: fixed-grid bin join (one
    shuffle on the cell key, ×9 constant fan-out on one side, exact
    haversine verify) — the scale shape for spatial self-joins; the
    oracle is the O(n²) join with the identical formula
    (ext/geo.py::neighbor_pairs_grid)."""
    (customer,) = _t(spark, sf_dir, "customer")
    pts = _with_coords(customer)
    pairs = X_geo.neighbor_pairs_grid(pts, _GEO_RADIUS_KM)
    return pairs.select(
        "id_a", "id_b", _rn(F.col("dist_km"), 2).alias("dist_km")
    )


SQL_GEO = """
WITH pts AS (
  SELECT c_custkey AS id,
         CAST(('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 8))
              AS BIGINT) % 12000 / 100.0 - 60.0 AS lat,
         CAST(('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 9, 8))
              AS BIGINT) % 36000 / 100.0 - 180.0 AS lon
  FROM customer
)
SELECT a.id AS id_a, b.id AS id_b, {DIST} AS dist_km
FROM pts a JOIN pts b ON a.id < b.id
WHERE {RAWDIST} <= {R_KM}
"""


# --- forecasting ------------------------------------------------------------

def q_events_ses_smoothed(spark, sf_dir):
    """SES-smoothed daily KPI per event_type: aggregate to daily grain
    (bounded series length — the skew discipline for sequential-per-
    series ops), then the α=0.3 recursion in one Arrow batch per
    series (ext/forecast.py). The oracle replays the identical double
    recursion as a recursive CTE."""
    from data_lakehouse_project_spark.ext.forecast import ses_smooth

    (events,) = _t(spark, sf_dir, "events")
    daily = events.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.avg("value").alias("day_avg"))
    sm = ses_smooth(daily, ["event_type"], "day", "day_avg", alpha=0.3)
    return sm.select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        _rn(F.col("day_avg"), 4).alias("day_avg"),
        _rn(F.col("smoothed"), 4).alias("smoothed"),
    )


SQL_SES = """
WITH RECURSIVE daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, AVG(value) AS day_avg
  FROM events GROUP BY 1, 2
), numbered AS (
  SELECT *, row_number() OVER (
    PARTITION BY event_type ORDER BY day
  ) AS rn FROM daily
), rec AS (
  SELECT event_type, day, day_avg, rn, day_avg AS s
  FROM numbered WHERE rn = 1
  UNION ALL
  SELECT n.event_type, n.day, n.day_avg, n.rn,
         0.3 * n.day_avg + 0.7 * r.s
  FROM numbered n
  JOIN rec r ON n.event_type = r.event_type AND n.rn = r.rn + 1
)
SELECT event_type, strftime(day, '%Y-%m-%d') AS day,
       {DAVG} AS day_avg, {SM} AS smoothed
FROM rec
"""


# --- market basket ----------------------------------------------------------

def q_basket_pair_lift(spark, sf_dir):
    """Top-25 co-purchased part pairs by lift over order baskets:
    Apriori item filter before pair generation, max-basket guard, the
    basket-count scalar on a 1-row broadcast (ext/basket.py).
    Deterministic order: lift desc, then the pair key."""
    from data_lakehouse_project_spark.ext.basket import basket_pair_stats

    (lineitem,) = _t(spark, sf_dir, "lineitem")
    stats = basket_pair_stats(
        lineitem, "l_orderkey", "l_partkey",
        min_item_count=2, min_pair_count=2,
    )
    from data_lakehouse_project_spark.cacheutil import keep_alive

    # pin `stats` (carrying the persisted basket table's release_on_gc)
    # to the derived frame — dropped early, the Apriori-filtered basket
    # table would recompute once per plan occurrence (4×) in the action
    return keep_alive(
        stats.select(
            "item_a",
            "item_b",
            "n_a",
            "n_b",
            "n_ab",
            _rn(F.col("lift"), 4).alias("lift"),
            _rn(F.col("conf_a_to_b"), 4).alias("conf_a_to_b"),
        )
        .orderBy(F.desc("lift"), "item_a", "item_b")
        .limit(25),
        stats,
    )


SQL_BASKET = """
WITH src AS (
  SELECT DISTINCT l_orderkey AS basket, l_partkey AS item FROM lineitem
), ic AS (
  SELECT item, count(*) AS n_item FROM src GROUP BY item
), freq AS (
  SELECT * FROM ic WHERE n_item >= 2
), kept AS (
  SELECT s.* FROM src s JOIN freq f ON s.item = f.item
), nb AS (
  SELECT count(DISTINCT basket) * 1.0 AS n_baskets FROM src
), pc AS (
  SELECT a.item AS item_a, b.item AS item_b, count(*) AS n_ab
  FROM kept a JOIN kept b
    ON a.basket = b.basket AND a.item < b.item
  GROUP BY 1, 2 HAVING count(*) >= 2
)
SELECT item_a, item_b,
       fa.n_item AS n_a, fb.n_item AS n_b, n_ab,
       {LIFT} AS lift,
       {CONF} AS conf_a_to_b
FROM pc
JOIN freq fa ON fa.item = pc.item_a
JOIN freq fb ON fb.item = pc.item_b
CROSS JOIN nb
ORDER BY lift DESC, item_a, item_b
LIMIT 25
"""


# --- event transition matrix ------------------------------------------------

def q_event_transition_probs(spark, sf_dir):
    """First-order Markov transition matrix over per-user event
    sequences: lead() window on (user, ts, id) order, then one
    bounded-cardinality groupBy (|types|² rows); row-normalized
    probabilities via a window sum — two shuffles total, the second
    over a 25-row frame."""
    from pyspark.sql import Window

    (events,) = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    steps = (
        events.select(
            "user_id",
            "ts",
            "event_id",
            F.col("event_type").alias("src"),
            F.lead("event_type").over(w).alias("dst"),
        )
        .where(F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = Window.partitionBy("src")
    return steps.select(
        "src",
        "dst",
        "n",
        _rn(F.col("n") / F.sum("n").over(tot), 4).alias("prob"),
    )


SQL_TRANSITIONS = """
WITH steps AS (
  SELECT event_type AS src,
         lead(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
         ) AS dst
  FROM events
), pc AS (
  SELECT src, dst, count(*) AS n FROM steps
  WHERE dst IS NOT NULL GROUP BY 1, 2
)
SELECT src, dst, n,
       {PROB} AS prob
FROM pc
"""


# --- polymorphic UDTF surface -----------------------------------------------

def q_udtf_split_priority(spark, sf_dir):
    """Polymorphic Python UDTF (static ``analyze`` computes the output
    schema from the constant column-name argument at PLAN time — the
    Spark 4 dynamic-schema UDTF API; functions/table_functions.py).
    Splits o_orderpriority '1-URGENT' into named columns in a LATERAL
    join; plan-audit exempts it as sanctioned row-at-a-time Python
    (API coverage, not hot path — split_part is the JVM twin)."""
    from data_lakehouse_project_spark.functions.table_functions import (
        register_table_functions,
    )

    (orders,) = _t(spark, sf_dir, "orders")
    register_table_functions(spark)
    orders.createOrReplaceTempView("_orders_prio")
    return spark.sql(
        "SELECT o.o_orderkey, s.prio_num, s.prio_name"
        " FROM _orders_prio o,"
        " LATERAL split_fields(o.o_orderpriority,"
        " 'prio_num,prio_name', '-') s"
    )


SQL_UDTF_SPLIT = """
SELECT o_orderkey,
       split_part(o_orderpriority, '-', 1) AS prio_num,
       split_part(o_orderpriority, '-', 2) AS prio_name
FROM orders
"""


# --- ML evaluation metrics --------------------------------------------------

def q_stopword_auc_langid(spark, sf_dir):
    """Exact distributed ROC-AUC (Mann-Whitney rank-sum with average
    ties, ext/evalmetrics.py) of the English-stopword-ratio score
    against the lang=='en' label: rows collapse to distinct-score grain
    BEFORE any ranking, so the window runs over |distinct scores| rows,
    never a global sort of the corpus. The oracle replays the identical
    rank arithmetic (exact: ranks are integer-and-half multiples)."""
    from data_lakehouse_project_spark.ext import text as X_text
    from data_lakehouse_project_spark.ext.evalmetrics import binary_auc

    (documents,) = _t(spark, sf_dir, "documents")
    t = F.col("text")
    score = X_text.stopword_count(t) / F.greatest(
        F.size(X_text.ws_tokens(t)), F.lit(1)
    )
    scored = documents.select(
        score.alias("s"), (F.col("lang") == "en").alias("y")
    )
    auc = binary_auc(scored, "y", "s")
    return auc.select(
        "n_pos", "n_neg", _rn(F.col("auc"), 6).alias("auc")
    )


SQL_STOPWORD_AUC = """
WITH scored AS (
  SELECT len(list_filter({TOKS}, x -> list_contains({STOP}, x))) * 1.0
           / greatest(len({TOKS}), 1) AS s,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
  FROM documents
), by_score AS (
  SELECT s, count(*) AS n, sum(y) AS pos FROM scored GROUP BY s
), ranked AS (
  SELECT *, coalesce(sum(n) OVER (
    ORDER BY s ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
  ), 0) AS cum_less FROM by_score
), a AS (
  SELECT sum(pos) AS np, sum(n) - sum(pos) AS nn,
         sum(pos * (cum_less + (n + 1) / 2.0)) AS rsp
  FROM ranked
)
SELECT CAST(np AS BIGINT) AS n_pos, CAST(nn AS BIGINT) AS n_neg,
       {AUC} AS auc
FROM a
"""


# --- ML feature encoding ----------------------------------------------------

def q_orders_feature_encode(spark, sf_dir):
    """Model-matrix projection of orders: smoothed target encoding of
    o_orderpriority against o_totalprice (statistics ride broadcasts —
    the fact is touched by one map stage) + z-scaled price
    (ext/features.py)."""
    (orders,) = _t(spark, sf_dir, "orders")
    # fused composition of ext/features.py::target_encode +
    # standard_scale (both pytest-pinned as standalone operators):
    # the encoding prior IS the scaling mean, so one global aggregate
    # serves both and the fact is scanned exactly 3× (2 stat passes +
    # 1 final map) with no nested re-execution — chaining the two
    # operators naively re-runs the encode subtree inside the stats
    # aggregate (plan-audit caught 10 exchanges; this shape has 4)
    stats = orders.agg(
        F.avg("o_totalprice").alias("_mu"),
        F.stddev_pop("o_totalprice").alias("_sd"),
    )
    per_cat = orders.groupBy("o_orderpriority").agg(
        F.sum("o_totalprice").alias("_sum_t"),
        F.count(F.lit(1)).alias("_n_c"),
    )
    m = 10.0
    return (
        orders.join(F.broadcast(per_cat), "o_orderpriority")
        .crossJoin(F.broadcast(stats))
        .select(
            "o_orderkey",
            "o_orderpriority",
            _rn(
                (F.col("_sum_t") + F.lit(m) * F.col("_mu"))
                / (F.col("_n_c") + F.lit(m)),
                4,
            ).alias("priority_enc"),
            _rn(
                F.when(
                    F.col("_sd") > 0,
                    (F.col("o_totalprice") - F.col("_mu")) / F.col("_sd"),
                ),
                4,
            ).alias("price_z"),
        )
    )


SQL_FEATURE_ENCODE = """
WITH prior AS (
  SELECT AVG(o_totalprice) AS p FROM orders
), per_cat AS (
  SELECT o_orderpriority, SUM(o_totalprice) AS sum_t, COUNT(*) AS n_c
  FROM orders GROUP BY 1
), stats AS (
  SELECT AVG(o_totalprice) AS mu, STDDEV_POP(o_totalprice) AS sd
  FROM orders
)
SELECT o.o_orderkey, o.o_orderpriority,
       {ENC} AS priority_enc,
       {Z} AS price_z
FROM orders o
JOIN per_cat c ON c.o_orderpriority = o.o_orderpriority
CROSS JOIN prior CROSS JOIN stats
"""


# --- navigation path analysis -----------------------------------------------

def q_session_top_paths(spark, sf_dir):
    """Top-20 user-day navigation paths: per (user, day) the ordered
    event-type sequence (array_sort over (ts, event_id, type) structs —
    deterministic under timestamp ties, no window needed), then one
    path-grain rollup. Two shuffles; path cardinality is bounded by the
    session count, not the event count."""
    (events,) = _t(spark, sf_dir, "events")
    seq = F.array_join(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct("ts", "event_id", "event_type"))
            ),
            lambda s: s["event_type"],
        ),
        ">",
    )
    paths = events.groupBy(
        "user_id", F.col("ts").cast("date").alias("day")
    ).agg(seq.alias("path"))
    return (
        paths.groupBy("path")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy(F.desc("n_sessions"), "path")
        .limit(20)
    )


SQL_TOP_PATHS = """
WITH p AS (
  SELECT user_id, CAST(ts AS DATE) AS day,
         string_agg(event_type, '>' ORDER BY ts, event_id) AS path
  FROM events GROUP BY 1, 2
)
SELECT path, count(*) AS n_sessions,
       count(DISTINCT user_id) AS n_users
FROM p GROUP BY path
ORDER BY n_sessions DESC, path
LIMIT 20
"""


# --- A/B experiment readout -------------------------------------------------

def q_ab_test_purchase(spark, sf_dir):
    """Two-proportion z-test on purchase conversion under an md5-parity
    variant assignment: one user-grain aggregate + closed-form
    arithmetic on a 2-row frame (ext/abtest.py). The oracle replays
    the identical pooled-SE formula."""
    from data_lakehouse_project_spark.ext.abtest import (
        ab_test_proportions,
        assign_and_measure,
    )

    (events,) = _t(spark, sf_dir, "events")
    users = assign_and_measure(events)
    out = ab_test_proportions(users)
    return out.select(
        "n_a",
        "n_b",
        "conv_a",
        "conv_b",
        _rn(F.col("rate_a"), 4).alias("rate_a"),
        _rn(F.col("rate_b"), 4).alias("rate_b"),
        _rn(F.col("lift"), 4).alias("lift"),
        _rn(F.col("z_score"), 4).alias("z_score"),
    )


SQL_AB_TEST = """
WITH users AS (
  SELECT user_id,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
           AS converted,
         CASE WHEN CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)),
                         1, 8)) AS BIGINT) % 2 = 0
              THEN 'A' ELSE 'B' END AS variant
  FROM events GROUP BY user_id
), v AS (
  SELECT
    SUM(CASE WHEN variant = 'A' THEN 1 ELSE 0 END) AS n_a,
    SUM(CASE WHEN variant = 'B' THEN 1 ELSE 0 END) AS n_b,
    SUM(CASE WHEN variant = 'A' THEN converted ELSE 0 END) AS conv_a,
    SUM(CASE WHEN variant = 'B' THEN converted ELSE 0 END) AS conv_b
  FROM users
), c AS (
  SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
         CAST(conv_a AS BIGINT) AS conv_a, CAST(conv_b AS BIGINT) AS conv_b,
         conv_a * 1.0 / n_a AS rate_a, conv_b * 1.0 / n_b AS rate_b,
         (conv_a + conv_b) * 1.0 / (n_a + n_b) AS pooled
  FROM v
)
SELECT n_a, n_b, conv_a, conv_b,
       {RA} AS rate_a, {RB} AS rate_b,
       {LIFT} AS lift,
       {Z} AS z_score
FROM c
"""


def q_events_cusum_alarms(spark, sf_dir):
    """Two-sided CUSUM change-point statistics over the daily KPI per
    event_type (Page 1954; ext/forecast.py::cusum_changepoints). The
    daily inputs are floor-rounded at 4 digits and μ/σ at 6 on BOTH
    engines before the recursion — the max(0,·) hinge would amplify a
    1-ulp aggregate difference into a different alarm set."""
    from data_lakehouse_project_spark.ext.forecast import cusum_changepoints

    (events,) = _t(spark, sf_dir, "events")
    daily = events.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(_rn(F.avg("value"), 4).alias("x"))
    out = cusum_changepoints(
        daily, ["event_type"], "day", "x", k_sigma=0.5, h_sigma=4.0
    )
    return out.select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "x",
        _rn(F.col("s_pos"), 4).alias("s_pos"),
        _rn(F.col("s_neg"), 4).alias("s_neg"),
        "alarm",
    )


SQL_CUSUM = """
WITH RECURSIVE daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, {X} AS x
  FROM events GROUP BY 1, 2
), stats AS (
  SELECT event_type,
         {MU} AS mu
  FROM daily GROUP BY event_type
), stats2 AS (
  SELECT d.event_type, s.mu,
         {SD} AS sd
  FROM daily d JOIN stats s USING (event_type)
  GROUP BY d.event_type, s.mu
), numbered AS (
  SELECT *, row_number() OVER (
    PARTITION BY event_type ORDER BY day
  ) AS rn FROM daily
), rec AS (
  SELECT n.event_type, n.day, n.x, n.rn,
         greatest(0, n.x - s.mu - 0.5 * s.sd) AS sp,
         greatest(0, -(n.x - s.mu + 0.5 * s.sd)) AS sn,
         s.mu, s.sd
  FROM numbered n JOIN stats2 s USING (event_type) WHERE n.rn = 1
  UNION ALL
  SELECT n.event_type, n.day, n.x, n.rn,
         greatest(0, r.sp + (n.x - r.mu - 0.5 * r.sd)),
         greatest(0, r.sn - (n.x - r.mu + 0.5 * r.sd)),
         r.mu, r.sd
  FROM numbered n
  JOIN rec r ON n.event_type = r.event_type AND n.rn = r.rn + 1
)
SELECT event_type, strftime(day, '%Y-%m-%d') AS day, x,
       {SP} AS s_pos, {SN} AS s_neg,
       (sp > 4.0 * sd OR sn > 4.0 * sd) AS alarm
FROM rec
"""


# --- equi-depth histograms --------------------------------------------------

def q_histogram_equidepth_qty(spark, sf_dir):
    """Exact equi-depth histogram of l_quantity (8 buckets) via ntile —
    standard SQL semantics (larger buckets first, ties split by
    position), so the NTILE oracle is 1:1. The global sort is the price
    of exactness; the approx companion below is the 100 TB path
    (operators/profile.py::histogram_equidepth)."""
    from data_lakehouse_project_spark.operators.profile import (
        histogram_equidepth,
    )

    (lineitem,) = _t(spark, sf_dir, "lineitem")
    h = histogram_equidepth(lineitem, "l_quantity", 8)
    return h.select(F.col("bin").cast("long").alias("bin"), "lo", "hi", "cnt")


SQL_EQUIDEPTH = """
WITH s AS (
  SELECT CAST(l_quantity AS DOUBLE) AS v FROM lineitem
  WHERE l_quantity IS NOT NULL
), b AS (
  SELECT v, ntile(8) OVER (ORDER BY v) AS bin FROM s
)
SELECT CAST(bin AS BIGINT) AS bin, min(v) AS lo, max(v) AS hi,
       count(*) AS cnt
FROM b GROUP BY bin
"""


def q_histogram_equidepth_price_approx(spark, sf_dir):
    """Approx equi-depth over o_totalprice: boundaries from ONE
    mergeable approx_percentile aggregate (no global sort), bucket by
    broadcast boundary array. Rows-only: sketch boundaries are
    implementation-defined (depth equality is the property, gated in
    test_profile.py)."""
    from data_lakehouse_project_spark.operators.profile import (
        histogram_equidepth_approx,
    )

    (orders,) = _t(spark, sf_dir, "orders")
    h = histogram_equidepth_approx(orders, "o_totalprice", 16)
    return h.select(
        F.col("bin").cast("long").alias("bin"), "lo", "hi", "cnt"
    )


# --- CMS (rows-only: xxhash64 has no DuckDB counterpart) -------------------

def q_cms_token_estimates(spark, sf_dir):
    """Count-Min-sketch frequency estimates for the exact top-20 event
    types+sources: build a 4×1024 sketch over documents.source (one
    KB-scale shuffle), then point-query it (broadcast join). Rows-only:
    estimates are xxhash64-placement-dependent; the ≥-true and ε·N
    bounds are property-tested in tests/test_frequent.py."""
    (documents,) = _t(spark, sf_dir, "documents")
    src = documents.select(F.col("source").alias("item"))
    sketch = X_freq.cms_build(src, "item", width=1024, depth=4)
    queries = src.distinct()
    est = X_freq.cms_estimate(queries, sketch, "item", width=1024, depth=4)
    return est.select("item", "est")


def build(helpers: dict) -> dict:
    _helpers.update(helpers)
    R = helpers["R"]
    dist_raw = X_geo.haversine_sql("a.lat", "a.lon", "b.lat", "b.lon")
    return {
        "attribution_last_touch": (
            q_attribution_last_touch,
            SQL_ATTR_LAST.format(CREDIT=R("SUM(1.0)")),
        ),
        "attribution_linear": (
            q_attribution_linear,
            SQL_ATTR_LINEAR.format(CREDIT=R("SUM(weight)")),
        ),
        "m4_downsample_events": (
            q_m4_downsample_events,
            SQL_M4.format(
                FMT=_FMT_DUCK,
                FIRST_V=R("max(CASE WHEN rf  = 1 THEN value END)", 3),
                LAST_V=R("max(CASE WHEN rl  = 1 THEN value END)", 3),
                MIN_V=R("max(CASE WHEN rmn = 1 THEN value END)", 3),
                MAX_V=R("max(CASE WHEN rmx = 1 THEN value END)", 3),
            ),
        ),
        "ltob_downsample_events": (
            q_ltob_downsample_events,
            SQL_LTOB.format(FMT=_FMT_DUCK, VAL=R("value", 3),
                            AVG=R("bucket_avg", 3)),
        ),
        "geo_neighbor_pairs": (
            q_geo_neighbor_pairs,
            SQL_GEO.format(
                DIST=R(dist_raw), RAWDIST=dist_raw, R_KM=_GEO_RADIUS_KM
            ),
        ),
        "basket_pair_lift": (
            q_basket_pair_lift,
            SQL_BASKET.format(
                LIFT=R("n_baskets * n_ab / (fa.n_item * fb.n_item)", 4),
                CONF=R("n_ab * 1.0 / fa.n_item", 4),
            ),
        ),
        "event_transition_probs": (
            q_event_transition_probs,
            SQL_TRANSITIONS.format(
                PROB=R("n * 1.0 / SUM(n) OVER (PARTITION BY src)", 4)
            ),
        ),
        "udtf_split_priority": (q_udtf_split_priority, SQL_UDTF_SPLIT),
        "stopword_auc_langid": (
            q_stopword_auc_langid,
            SQL_STOPWORD_AUC.format(
                TOKS=helpers["TOKS"],
                STOP=helpers["STOP_EN"],
                AUC=R(
                    "CASE WHEN np > 0 AND nn > 0 THEN"
                    " (rsp - np * (np + 1) / 2.0) / (np * nn) END",
                    6,
                ),
            ),
        ),
        "orders_feature_encode": (
            q_orders_feature_encode,
            SQL_FEATURE_ENCODE.format(
                ENC=R("(c.sum_t + 10.0 * prior.p) / (c.n_c + 10.0)", 4),
                Z=R(
                    "CASE WHEN stats.sd > 0 THEN"
                    " (o.o_totalprice - stats.mu) / stats.sd END",
                    4,
                ),
            ),
        ),
        "session_top_paths": (q_session_top_paths, SQL_TOP_PATHS),
        "ab_test_purchase": (
            q_ab_test_purchase,
            SQL_AB_TEST.format(
                RA=R("rate_a", 4),
                RB=R("rate_b", 4),
                LIFT=R("rate_b - rate_a", 4),
                Z=R(
                    "CASE WHEN sqrt(pooled * (1 - pooled)"
                    " * (1.0 / n_a + 1.0 / n_b)) > 0"
                    " THEN (rate_b - rate_a)"
                    " / sqrt(pooled * (1 - pooled)"
                    " * (1.0 / n_a + 1.0 / n_b)) END",
                    4,
                ),
            ),
        ),
        "events_cusum_alarms": (
            q_events_cusum_alarms,
            SQL_CUSUM.format(
                X=R("AVG(value)", 4),
                MU=R("AVG(x)", 6),
                SD=R("sqrt(AVG((d.x - s.mu) * (d.x - s.mu)))", 6),
                SP=R("sp", 4),
                SN=R("sn", 4),
            ),
        ),
        "events_ses_smoothed": (
            q_events_ses_smoothed,
            SQL_SES.format(R=R, DAVG=R("day_avg", 4), SM=R("s", 4)),
        ),
        "histogram_equidepth_qty": (q_histogram_equidepth_qty, SQL_EQUIDEPTH),
        "histogram_equidepth_price_approx": (
            q_histogram_equidepth_price_approx,
            None,
        ),
        "cms_token_estimates": (q_cms_token_estimates, None),
    }
