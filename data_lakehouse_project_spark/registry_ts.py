"""Time-series window operators + nested-data (array/map/lateral)
surface, batch 3.

Adds the built-in window-bucketing operators Structured Streaming shares
with batch (``F.session_window``, hopping ``F.window``) plus the
lateral/nested surface (explode_outer, map functions, extended date
functions). The reference has none of these (SURVEY §2.9); they are
engine-design surface on the driver's events/documents/orders tables.

Oracle parity notes (hard-won; see also registry.py conventions):
- Spark ``session_window`` end = last event + gap; the gaps-and-islands
  SQL reproduces exactly that (max(ts) + INTERVAL).
- A hopping window (size 2h, slide 1h) assigns each event to the two
  windows starting at trunc(ts) and trunc(ts) - 1h; the oracle is a
  UNION ALL of the two shifted tumbling aggregations — no spine join.
- DuckDB ``dayofweek`` is 0=Sunday, Spark's is 1=Sunday: the Spark side
  emits ``dayofweek - 1``.
- DuckDB ``map[key]`` returns a LIST; the oracle indexes ``[1]`` to get
  the scalar that Spark's ``element_at`` returns.
- Window buckets are emitted as formatted strings (driver hash-compares
  values; timestamp formatting must match byte-for-byte).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_lakehouse_project_spark.functions.scalar import normalize_text
from data_lakehouse_project_spark.sources.readers import load_testdata

_helpers: dict = {}


def _rn(col, n):
    if "_rn" not in _helpers:
        from data_lakehouse_project_spark import registry  # noqa: F401
    return _helpers["_rn"](col, n)


def _r2(col):
    return _rn(col, 2)


def _t(spark, sf_dir, *names):
    tables = load_testdata(spark, sf_dir, names=names)
    return [tables[n] for n in names]


_FMT = "yyyy-MM-dd HH:mm:ss"
_FMT_DUCK = "%Y-%m-%d %H:%M:%S"


# --- session_window (built-in stateful window op, batch form) --------------

def q_events_session_window(spark, sf_dir):
    """Per-user sessions via the built-in ``F.session_window`` (the same
    operator Structured Streaming uses for stateful session aggregation;
    here in batch form). One shuffle on (user_id); window merging is
    handled by the operator, not a lag/cumsum reimplementation."""
    (events,) = _t(spark, sf_dir, "events")
    sw = F.session_window("ts", "30 minutes")
    return (
        events.groupBy("user_id", sw)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            _r2(F.sum("value")).alias("value_sum"),
        )
        .select(
            "user_id",
            F.date_format("session_window.start", _FMT).alias("session_start"),
            F.date_format("session_window.end", _FMT).alias("session_end"),
            "n_events",
            "value_sum",
        )
    )


SQL_SESSION_WINDOW = """
WITH flagged AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL THEN 1
              WHEN epoch(ts) - epoch(lag(ts) OVER w) > 1800 THEN 1
              ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), islands AS (
  SELECT user_id, ts, value,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS session_id
  FROM flagged
)
SELECT user_id,
       strftime(MIN(ts), '{FMT}') AS session_start,
       strftime(MAX(ts) + INTERVAL 30 MINUTE, '{FMT}') AS session_end,
       COUNT(*) AS n_events,
       {R_V} AS value_sum
FROM islands
GROUP BY user_id, session_id
"""


# --- hopping window --------------------------------------------------------

def q_events_hopping_window(spark, sf_dir):
    """Overlapping (hopping) windows: size 2 h, slide 1 h — each event
    contributes to two buckets. ``F.window`` emits the expansion
    JVM-side before the aggregate's single shuffle."""
    (events,) = _t(spark, sf_dir, "events")
    w = F.window("ts", "2 hours", "1 hour")
    return (
        events.groupBy(w)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            _r2(F.sum("value")).alias("value_sum"),
        )
        .select(
            F.date_format("window.start", _FMT).alias("window_start"),
            "n_events",
            "value_sum",
        )
    )


SQL_HOPPING = """
SELECT strftime(ws, '{FMT}') AS window_start,
       COUNT(*) AS n_events,
       {R_V} AS value_sum
FROM (
  SELECT date_trunc('hour', ts) AS ws, value FROM events
  UNION ALL
  SELECT date_trunc('hour', ts) - INTERVAL 1 HOUR AS ws, value FROM events
) expanded
GROUP BY ws
"""


# --- explode_outer / lateral -----------------------------------------------

def q_explode_outer_lateral(spark, sf_dir):
    """explode_outer over a usually-empty filtered token array: rows with
    no matches survive with a NULL token (LEFT JOIN LATERAL semantics),
    unlike plain explode which drops them."""
    (documents,) = _t(spark, sf_dir, "documents")
    toks = F.split(normalize_text(F.col("text")), " ")
    long_toks = F.filter(toks, lambda t: F.length(t) > 12)
    return documents.select(
        "doc_id", F.explode_outer(long_toks).alias("long_token")
    )


SQL_EXPLODE_OUTER = """
SELECT doc_id, u.long_token
FROM documents
LEFT JOIN LATERAL unnest(list_filter({TOKS}, t -> length(t) > 12))
  AS u(long_token) ON TRUE
"""


# --- extended date functions ----------------------------------------------

def q_date_functions_extended(spark, sf_dir):
    """date_trunc quarter/week, last_day, add_months, datediff, quarter,
    weekofyear, weekday — the scheduling/calendar toolkit."""
    (orders,) = _t(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return orders.select(
        "o_orderkey",
        F.date_trunc("quarter", F.col("o_orderdate")).cast("date").alias("qtr_start"),
        F.date_trunc("week", F.col("o_orderdate")).cast("date").alias("week_start"),
        F.last_day(d).alias("month_end"),
        F.add_months(d, 3).alias("plus_3m"),
        F.datediff(d, F.lit("1995-01-01").cast("date")).cast("long").alias(
            "days_since_t0"
        ),
        F.quarter(d).cast("long").alias("qtr"),
        F.weekofyear(d).cast("long").alias("iso_week"),
        (F.dayofweek(d) - 1).cast("long").alias("dow_sunday0"),
    )


SQL_DATE_EXTENDED = """
SELECT o_orderkey,
       CAST(date_trunc('quarter', o_orderdate) AS DATE) AS qtr_start,
       CAST(date_trunc('week', o_orderdate) AS DATE) AS week_start,
       last_day(CAST(o_orderdate AS DATE)) AS month_end,
       CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS plus_3m,
       CAST(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
            AS BIGINT) AS days_since_t0,
       CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
       CAST(weekofyear(o_orderdate) AS BIGINT) AS iso_week,
       CAST(dayofweek(o_orderdate) AS BIGINT) AS dow_sunday0
FROM orders
"""


# --- map functions ---------------------------------------------------------

def q_map_functions_surface(spark, sf_dir):
    """create_map / element_at / map_keys / map_values / size — the map
    column toolkit, reduced to deterministic scalar/array outputs (map
    columns themselves don't hash stably across engines)."""
    (lineitem,) = _t(spark, sf_dir, "lineitem")
    m = F.create_map(
        F.lit("qty"), F.col("l_quantity"),
        F.lit("ext"), F.col("l_extendedprice"),
    )
    return lineitem.select(
        "l_orderkey",
        "l_linenumber",
        F.element_at(m, "qty").alias("qty_val"),
        F.element_at(m, "ext").alias("ext_val"),
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("keys_sorted"),
        F.size(m).cast("long").alias("map_size"),
    )


SQL_MAP_SURFACE = """
SELECT l_orderkey, l_linenumber,
       (m['qty'])[1] AS qty_val,
       (m['ext'])[1] AS ext_val,
       array_to_string(list_sort(map_keys(m)), ',') AS keys_sorted,
       CAST(cardinality(m) AS BIGINT) AS map_size
FROM (
  SELECT l_orderkey, l_linenumber,
         map(['qty', 'ext'], [l_quantity, l_extendedprice]) AS m
  FROM lineitem
)
"""


# --- interpolated percentiles + windowed distinct counts -------------------

def q_percentile_cont_qty(spark, sf_dir):
    """PERCENTILE_CONT (linear interpolation) per return flag — the
    continuous twin of percentile_disc_qty. The oracle casts to DOUBLE
    first: DuckDB otherwise interpolates in the input's decimal scale.

    Round 9: rebuilt on the COUNTS GRAIN
    (``grouped_quantiles_exact`` — bit-identical interpolation,
    O(distinct values) per-group state) while keeping the SQL
    ``PERCENTILE_CONT ... WITHIN GROUP`` oracle, so the registry
    carries ZERO holistic per-row aggregation buffers on fact-grain
    input; the SQL form itself stays pinned by a pytest parity test
    (test_quantiles.py)."""
    from data_lakehouse_project_spark.functions.quantiles import (
        grouped_quantiles_exact,
    )

    (lineitem,) = _t(spark, sf_dir, "lineitem")
    qq = grouped_quantiles_exact(
        lineitem.select("l_returnflag", "l_quantity"),
        ["l_returnflag"],
        "l_quantity",
        {"q1": 0.25, "median": 0.5, "q3": 0.75},
    )
    return qq.select(
        "l_returnflag",
        _rn(F.col("q1"), 4).alias("q1"),
        _rn(F.col("median"), 4).alias("median"),
        _rn(F.col("q3"), 4).alias("q3"),
    )


SQL_PERCENTILE_CONT = """
SELECT l_returnflag,
       {Q1} AS q1,
       {MED} AS median,
       {Q3} AS q3
FROM lineitem
GROUP BY l_returnflag
"""


def q_window_distinct_running(spark, sf_dir):
    """Running DISTINCT count over a window — Spark has no native
    count(DISTINCT) OVER, so the engine idiom is size(collect_set()
    OVER w); DuckDB's native windowed distinct is the oracle. Same
    value-tiebreaker total order as window_ignore_nulls (the synthetic
    lineitem has duplicate (orderkey, linenumber) pairs)."""
    from pyspark.sql.window import Window

    (lineitem,) = _t(spark, sf_dir, "lineitem")
    w = (
        Window.partitionBy("l_orderkey")
        .orderBy(
            "l_linenumber", "l_extendedprice", "l_partkey", "l_suppkey",
            "l_discount",
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return lineitem.select(
        "l_orderkey",
        "l_linenumber",
        "l_partkey",
        F.size(F.collect_set("l_returnflag").over(w)).cast("long").alias(
            "distinct_flags_so_far"
        ),
    )


SQL_WINDOW_DISTINCT = """
SELECT l_orderkey, l_linenumber, l_partkey,
       CAST(count(DISTINCT l_returnflag) OVER (
         PARTITION BY l_orderkey
         ORDER BY l_linenumber, l_extendedprice, l_partkey, l_suppkey,
                  l_discount
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS distinct_flags_so_far
FROM lineitem
"""


# --- event analytics: ordered funnel + cohort retention --------------------

def q_events_funnel(spark, sf_dir):
    """Ordered conversion funnel view → click → purchase: a user counts
    at a stage only if the stage's FIRST occurrence follows the previous
    stage's first occurrence. ONE events scan and ONE shuffle on
    user_id: the three stage timestamps are a cascade of conditional
    window minimums over the same partition (each referencing the
    previous), the per-user reduce reuses the window's partitioning, and
    the final stage counts are a 1-row aggregate unpivoted with stack —
    versus the naive formulation (three filtered scans, a join per
    stage), which the plan auditor flags at 11 exchanges."""
    from pyspark.sql.window import Window

    (events,) = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    ts, et = F.col("ts"), F.col("event_type")
    e = (
        events.withColumn(
            "t_view", F.min(F.when(et == "view", ts)).over(w)
        )
        .withColumn(
            "t_click",
            F.min(
                F.when((et == "click") & (ts >= F.col("t_view")), ts)
            ).over(w),
        )
        .withColumn(
            "t_purchase",
            F.min(
                F.when((et == "purchase") & (ts >= F.col("t_click")), ts)
            ).over(w),
        )
    )
    per_user = e.groupBy("user_id").agg(
        F.max("t_view").alias("t_view"),
        F.max("t_click").alias("t_click"),
        F.max("t_purchase").alias("t_purchase"),
    )
    counts = per_user.agg(
        F.count("t_view").alias("_v1"),
        F.count("t_click").alias("_v2"),
        F.count("t_purchase").alias("_v3"),
    )
    return counts.select(
        F.expr(
            "stack(3, '1_view', _v1, '2_click_after_view', _v2, "
            "'3_purchase_after_click', _v3) AS (stage, n_users)"
        )
    )


SQL_FUNNEL = """
WITH v AS (
  SELECT user_id, MIN(ts) AS t_view FROM events
  WHERE event_type = 'view' GROUP BY user_id
), c AS (
  SELECT e.user_id, MIN(e.ts) AS t_click
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND e.ts >= v.t_view
  GROUP BY e.user_id
), p AS (
  SELECT e.user_id, MIN(e.ts) AS t_purchase
  FROM events e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.ts >= c.t_click
  GROUP BY e.user_id
)
SELECT '1_view' AS stage, COUNT(*) AS n_users FROM v
UNION ALL
SELECT '2_click_after_view', COUNT(*) FROM c
UNION ALL
SELECT '3_purchase_after_click', COUNT(*) FROM p
"""


def q_events_cohort_retention(spark, sf_dir):
    """Weekly cohort retention: users bucketed by first-activity week,
    counted per (cohort_week, weeks_since). Integer epoch-day
    arithmetic on both engines (interval/week-of-year semantics differ
    across dialects; day counts do not)."""
    (events,) = _t(spark, sf_dir, "events")
    t0 = F.lit("2024-01-01").cast("date")
    firsts = events.groupBy("user_id").agg(F.min("ts").alias("first_ts"))
    cohort = firsts.select(
        "user_id",
        # explicit floor: Spark's long cast truncates a double but
        # DuckDB's CAST rounds — floor() agrees everywhere for day >= 0
        F.floor(F.datediff(F.col("first_ts").cast("date"), t0) / 7)
        .cast("long")
        .alias("cohort_week"),
    )
    return (
        events.join(cohort, "user_id")
        .select(
            "user_id",
            "cohort_week",
            (
                F.floor(F.datediff(F.col("ts").cast("date"), t0) / 7).cast("long")
                - F.col("cohort_week")
            ).alias("weeks_since"),
        )
        .groupBy("cohort_week", "weeks_since")
        .agg(F.countDistinct("user_id").alias("active_users"))
    )


SQL_COHORT = """
WITH cohort AS (
  SELECT user_id,
         CAST(FLOOR(datediff('day', DATE '2024-01-01',
                             CAST(MIN(ts) AS DATE)) / 7) AS BIGINT)
           AS cohort_week
  FROM events GROUP BY user_id
)
SELECT cohort_week,
       CAST(FLOOR(datediff('day', DATE '2024-01-01',
                           CAST(ts AS DATE)) / 7) AS BIGINT)
         - cohort_week AS weeks_since,
       COUNT(DISTINCT e.user_id) AS active_users
FROM events e JOIN cohort ON e.user_id = cohort.user_id
GROUP BY 1, 2
"""


# --- information theory: Shannon entropy -----------------------------------

def q_agg_entropy(spark, sf_dir):
    """Shannon entropy (bits) of the priority distribution per order
    status — the category-diversity metric corpus curation uses to spot
    degenerate sources. Spark composes it from two aggregation grains
    (category counts → -Σ p·log₂p); DuckDB's native entropy() is the
    oracle. Same window-over-finer-agg pattern as the Q20/Q21 shapes
    would apply at scale; here the coarse grain is 3 rows, so a
    broadcast join-back is the cheaper plan."""
    (orders,) = _t(spark, sf_dir, "orders")
    counts = orders.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("c")
    )
    totals = counts.groupBy("o_orderstatus").agg(F.sum("c").alias("t"))
    p = F.col("c") / F.col("t")
    return (
        counts.join(F.broadcast(totals), "o_orderstatus")
        .groupBy("o_orderstatus")
        .agg(_rn(-F.sum(p * F.log2(p)), 6).alias("priority_entropy_bits"))
    )


SQL_ENTROPY = """
SELECT o_orderstatus, {H} AS priority_entropy_bits
FROM orders
GROUP BY o_orderstatus
"""


# --- robust statistics: median absolute deviation --------------------------

def q_agg_mad(spark, sf_dir):
    """MAD per return flag — the robust dispersion measure. Spark has
    no mad(); the engine composes it as two exact-median passes, each
    through the BOUNDED-MEMORY counts-grain straddle
    (``registry_r6.grouped_quantiles_exact``) instead of the holistic
    ``percentile`` whose per-group buffer materializes every fact row
    on one task (the 100× memory cliff).  DuckDB's native mad() is the
    oracle — the straddle is bit-identical to percentile_cont, so the
    4-digit parity holds unchanged."""
    from data_lakehouse_project_spark.registry_r6 import (
        grouped_quantiles_exact,
    )

    (lineitem,) = _t(spark, sf_dir, "lineitem")
    li = lineitem.select("l_returnflag", "l_extendedprice")
    med = grouped_quantiles_exact(
        li, ["l_returnflag"], "l_extendedprice", {"med": 0.5}
    ).select("l_returnflag", "med")
    devs = li.join(F.broadcast(med), "l_returnflag").select(
        "l_returnflag",
        F.abs(F.col("l_extendedprice") - F.col("med")).alias("ad"),
    )
    return grouped_quantiles_exact(
        devs, ["l_returnflag"], "ad", {"mad_raw": 0.5}
    ).select(
        "l_returnflag", _rn(F.col("mad_raw"), 4).alias("mad_price")
    )


SQL_MAD = """
SELECT l_returnflag, {MAD} AS mad_price
FROM lineitem
GROUP BY l_returnflag
"""


# --- array set operations ---------------------------------------------------

def _lstr(x):
    """long→string element cast for array_join (closure, not default-arg
    lambda — Spark HOFs misread default-arg lambdas as extra-arity)."""
    return x.cast("string")


def q_array_setops_surface(spark, sf_dir):
    """arrays_overlap / array_position / array_union / array_intersect /
    array_except on data-derived arrays. DuckDB has no native list set
    ops — the oracle composes list_distinct + list_filter lambdas;
    outputs are sorted on both sides because Spark's set ops preserve
    first-occurrence order while the emulation does not."""
    (lineitem,) = _t(spark, sf_dir, "lineitem")
    a = F.array(
        (F.col("l_partkey") % 10).cast("long"),
        (F.col("l_suppkey") % 10).cast("long"),
        F.col("l_linenumber").cast("long"),
    )
    b = F.array(
        F.col("l_linenumber").cast("long"),
        ((F.col("l_partkey") + 1) % 10).cast("long"),
    )
    return lineitem.select(
        "l_orderkey",
        "l_linenumber",
        "l_partkey",
        F.arrays_overlap(a, b).alias("overlaps"),
        F.array_position(a, F.col("l_linenumber").cast("long")).cast("long").alias(
            "line_pos"
        ),
        # joined to scalar strings — the driver's canonicalizer can't
        # hash list cells (long→string renders identically both engines)
        F.array_join(
            F.transform(F.array_sort(F.array_union(a, b)), _lstr), ","
        ).alias("union_sorted"),
        F.array_join(
            F.transform(F.array_sort(F.array_intersect(a, b)), _lstr), ","
        ).alias("intersect_sorted"),
        F.array_join(
            F.transform(F.array_sort(F.array_except(a, b)), _lstr), ","
        ).alias("except_sorted"),
    )


SQL_ARRAY_SETOPS = """
SELECT l_orderkey, l_linenumber, l_partkey,
       list_has_any(a, b) AS overlaps,
       CAST(list_position(a, CAST(l_linenumber AS BIGINT)) AS BIGINT)
         AS line_pos,
       COALESCE(array_to_string(list_sort(list_distinct(a || b)), ','), '')
         AS union_sorted,
       COALESCE(array_to_string(
         list_sort(list_filter(list_distinct(a), x -> list_contains(b, x))),
         ','), '') AS intersect_sorted,
       COALESCE(array_to_string(
         list_sort(list_filter(list_distinct(a),
                               x -> NOT list_contains(b, x))),
         ','), '') AS except_sorted
FROM (
  SELECT l_orderkey, l_linenumber, l_partkey,
         [l_partkey % 10, l_suppkey % 10, CAST(l_linenumber AS BIGINT)] AS a,
         [CAST(l_linenumber AS BIGINT), (l_partkey + 1) % 10] AS b
  FROM lineitem
)
"""


# --- higher moments (population ↔ sample conversion) -----------------------

def q_agg_higher_moments(spark, sf_dir):
    """skewness/kurtosis per line status. Spark computes POPULATION
    moments (g1, excess g2); DuckDB computes bias-corrected SAMPLE
    moments (G1, G2) — the Spark side applies the exact textbook
    conversions so both engines emit the sample form:
      G1 = g1 * sqrt(n(n-1)) / (n-2)
      G2 = (n-1)/((n-2)(n-3)) * ((n+1) g2 + 6)
    (verified to 12+ digits on a hand case before wiring)."""
    (lineitem,) = _t(spark, sf_dir, "lineitem")
    n = F.count(F.lit(1)).cast("double")
    g1 = F.skewness("l_extendedprice")
    g2 = F.kurtosis("l_extendedprice")
    sample_skew = g1 * F.sqrt(n * (n - 1)) / (n - 2)
    sample_kurt = (n - 1) / ((n - 2) * (n - 3)) * ((n + 1) * g2 + 6)
    return lineitem.groupBy("l_linestatus").agg(
        _rn(sample_skew, 6).alias("skew_sample"),
        _rn(sample_kurt, 6).alias("kurt_sample"),
    )


SQL_HIGHER_MOMENTS = """
SELECT l_linestatus,
       {SK} AS skew_sample,
       {KU} AS kurt_sample
FROM lineitem
GROUP BY l_linestatus
"""


# --- HLL sketch rollup (rows-only: sketch estimates are impl-specific) -----

def q_events_hll_daily_users(spark, sf_dir):
    """Daily distinct-user estimates from mergeable DataSketches HLL
    sketches (streaming/rollup.py); rows-only check — DuckDB's
    approx_count_distinct uses a different HLL implementation, so
    estimates aren't bit-comparable. Merge-associativity and accuracy
    are pinned in test_streaming.py::test_hll_rollup_merge_equals_direct."""
    from data_lakehouse_project_spark.streaming.rollup import hll_daily_users

    (events,) = _t(spark, sf_dir, "events")
    return hll_daily_users(events).select(
        F.date_format("day", _FMT).alias("day"), "users_est"
    )


def q_events_kll_monthly_quantiles(spark, sf_dir):
    """Monthly p50/p95/p99 of event value MERGED from daily KLL quantile
    sketches (streaming/rollup.py) — quantiles are not summable, so the
    hierarchy needs mergeable sketch partials; rows-only check (KLL
    estimates are impl-specific). Rank-error accuracy and
    merge-completeness are pinned in test_sketch_rollups.py."""
    from data_lakehouse_project_spark.streaming.rollup import (
        kll_daily_value_sketch,
        kll_monthly_quantiles,
    )

    (events,) = _t(spark, sf_dir, "events")
    out = kll_monthly_quantiles(kll_daily_value_sketch(events))
    return out.select(
        F.date_format("month", _FMT).alias("month"), "n", "p50", "p95", "p99"
    ).orderBy("month")


def q_events_theta_returning_users(spark, sf_dir):
    """Day-over-day returning/new/churned user estimates from theta
    sketch set algebra (intersection/difference — the operations HLL
    can't do) over the daily sketch rollup; the raw events are scanned
    once for the whole report. Rows-only (sketch estimates are
    impl-specific); flow-conservation accuracy is pinned in
    test_sketch_rollups.py."""
    from data_lakehouse_project_spark.streaming.rollup import (
        theta_daily_users,
        theta_returning_users,
    )

    (events,) = _t(spark, sf_dir, "events")
    out = theta_returning_users(theta_daily_users(events))
    return out.select(
        F.date_format("day", _FMT).alias("day"),
        "returning_est",
        "new_est",
        "churned_est",
    ).orderBy("day")


def q_events_rolling_anomaly(spark, sf_dir):
    """Hourly event-count anomaly detection: z-score of each hour's
    count against its event type's TRAILING 24-hour window (current
    hour excluded — an anomaly must not contaminate its own baseline).
    Frames shorter than 12 observations emit no score (cold start).
    One shuffle (hourly rollup) + one partitioned window; no global
    sort. z rounded to 4 decimals on both engines."""
    from pyspark.sql.window import Window

    (events,) = _t(spark, sf_dir, "events")
    hourly = events.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour"),
        "event_type",
    ).agg(F.count(F.lit(1)).cast("double").alias("n"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(-24, -1)
    )
    mu = F.avg("n").over(w)
    sd = F.stddev_samp("n").over(w)
    obs = F.count("n").over(w)
    z = F.when(
        (obs >= 12) & (sd > 0), (F.col("n") - mu) / sd
    )
    return (
        hourly.select(
            "event_type",
            F.date_format("hour", _FMT).alias("hour"),
            F.col("n").cast("long").alias("n"),
            _rn(z, 4).alias("z"),
        )
        .withColumn(
            "is_anomaly",
            F.when(F.col("z").isNotNull(), F.abs("z") >= 3.0),
        )
        .orderBy("event_type", "hour")
    )


SQL_ROLLING_ANOMALY = """
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS hour, event_type,
         CAST(COUNT(*) AS DOUBLE) AS n
  FROM events GROUP BY 1, 2
),
scored AS (
  SELECT event_type, hour, n,
         AVG(n) OVER w AS mu,
         STDDEV_SAMP(n) OVER w AS sd,
         COUNT(n) OVER w AS obs
  FROM hourly
  WINDOW w AS (PARTITION BY event_type ORDER BY hour
               ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
)
SELECT event_type, strftime(hour, '{FMT}') AS hour,
       CAST(n AS BIGINT) AS n,
       {Z} AS z,
       CASE WHEN {Z} IS NOT NULL THEN abs({Z}) >= 3.0 END AS is_anomaly
FROM scored
ORDER BY event_type, hour
"""


def build(helpers: dict) -> dict:
    _helpers.update(helpers)
    R = helpers["R"]
    TOKS = helpers["TOKS"]
    return {
        "events_session_window": (
            q_events_session_window,
            SQL_SESSION_WINDOW.format(FMT=_FMT_DUCK, R_V=R("SUM(value)")),
        ),
        "events_hopping_window": (
            q_events_hopping_window,
            SQL_HOPPING.format(FMT=_FMT_DUCK, R_V=R("SUM(value)")),
        ),
        "explode_outer_lateral": (
            q_explode_outer_lateral,
            SQL_EXPLODE_OUTER.format(TOKS=TOKS),
        ),
        "date_functions_extended": (q_date_functions_extended, SQL_DATE_EXTENDED),
        "map_functions_surface": (q_map_functions_surface, SQL_MAP_SURFACE),
        "events_hll_daily_users": (q_events_hll_daily_users, None),
        "events_kll_monthly_quantiles": (
            q_events_kll_monthly_quantiles,
            None,
        ),
        "events_theta_returning_users": (
            q_events_theta_returning_users,
            None,
        ),
        "events_rolling_anomaly": (
            q_events_rolling_anomaly,
            SQL_ROLLING_ANOMALY.format(
                FMT=_FMT_DUCK,
                Z=R(
                    "CASE WHEN obs >= 12 AND sd > 0"
                    " THEN (n - mu) / sd END",
                    4,
                ),
            ),
        ),
        "percentile_cont_qty": (
            q_percentile_cont_qty,
            SQL_PERCENTILE_CONT.format(
                Q1=R("percentile_cont(0.25) WITHIN GROUP"
                     " (ORDER BY CAST(l_quantity AS DOUBLE))", 4),
                MED=R("percentile_cont(0.5) WITHIN GROUP"
                      " (ORDER BY CAST(l_quantity AS DOUBLE))", 4),
                Q3=R("percentile_cont(0.75) WITHIN GROUP"
                     " (ORDER BY CAST(l_quantity AS DOUBLE))", 4),
            ),
        ),
        "window_distinct_running": (q_window_distinct_running, SQL_WINDOW_DISTINCT),
        "array_setops_surface": (q_array_setops_surface, SQL_ARRAY_SETOPS),
        "agg_mad": (
            q_agg_mad,
            SQL_MAD.format(MAD=R("mad(CAST(l_extendedprice AS DOUBLE))", 4)),
        ),
        "agg_entropy": (
            q_agg_entropy,
            SQL_ENTROPY.format(H=R("entropy(o_orderpriority)", 6)),
        ),
        "events_funnel": (q_events_funnel, SQL_FUNNEL),
        "events_cohort_retention": (q_events_cohort_retention, SQL_COHORT),
        "agg_higher_moments": (
            q_agg_higher_moments,
            SQL_HIGHER_MOMENTS.format(
                SK=R("skewness(l_extendedprice)", 6),
                KU=R("kurtosis(l_extendedprice)", 6),
            ),
        ),
    }
