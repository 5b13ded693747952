"""Round-7 analytics batch: RFM segmentation, Pareto revenue
concentration, and lead-time medians.

Three classic warehouse shapes added beyond SURVEY §2 (the reference
has no customer analytics at all — its processing core is
read→withColumn→groupBy→write, spark/jobs/mysql_gold_aggregation.py:
117-125), each deliberately free of the partitionless-window trap:

* ``customer_rfm_segments`` — recency/frequency/monetary per customer,
  each dimension labeled high/low against the GLOBAL MEDIAN (a 1-row
  exact-percentile aggregate broadcast into the grain — no global
  rank window), rolled up to the 8 RFM segments.
* ``customer_pareto_deciles`` — revenue concentration: customers
  bucketed into deciles by exact percentile BOUNDARIES (9 scalars
  broadcast, CASE-assigned) instead of ntile's single-task global
  sort; per-decile revenue share exposes the 80/20 shape.
* ``ship_latency_medians`` — per line status: exact median of the
  order-to-ship latency (fact-fact key join feeding the
  bounded-memory grouped median, ``registry_r6.grouped_median_exact``
  — its second consumer), plus the slow-ship fraction. Scales because
  the median runs on the (status, days)-distinct count grain.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_lakehouse_project_spark.registry_r6 import (
    grouped_median_exact,
    grouped_quantiles_exact,
)
from data_lakehouse_project_spark.sources.readers import load_testdata

_helpers: dict = {}


def _t(spark, sf_dir, *names):
    tables = load_testdata(spark, sf_dir, names=names)
    return [tables[n] for n in names]


def q_customer_rfm_segments(spark, sf_dir):
    """RFM: per customer, days since last order (vs the corpus max
    date), order count, total spend; each dimension split at the
    global median (ties -> 'low', i.e. 'high' means strictly above);
    output = segment label x customer count x avg spend."""
    r4 = _helpers["_rn"]
    (orders,) = _t(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_dt"),
        F.count(F.lit(1)).alias("freq"),
        F.sum("o_totalprice").alias("monetary"),
    )
    # recency needs the corpus max date first — two tiny passes over
    # the CUSTOMER grain (not the fact), both broadcastable
    max_dt = per_cust.agg(F.max("last_dt").alias("max_dt"))
    rfm = per_cust.crossJoin(F.broadcast(max_dt)).select(
        "o_custkey",
        F.datediff(F.col("max_dt"), F.col("last_dt")).alias("recency"),
        "freq",
        "monetary",
    )
    # global medians via the bounded-memory counts-grain straddle
    # (never F.percentile's one-buffer-holds-the-grain aggregate):
    # unpivot the three metrics, one grouped pass keyed by metric,
    # fold the 3-row result to one broadcastable row
    vals = rfm.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("r").alias("m"),
                    F.col("recency").cast("double").alias("v"),
                ),
                F.struct(
                    F.lit("f").alias("m"),
                    F.col("freq").cast("double").alias("v"),
                ),
                F.struct(
                    F.lit("m").alias("m"),
                    F.col("monetary").cast("double").alias("v"),
                ),
            )
        ).alias("x")
    ).select("x.m", "x.v")
    meds = grouped_quantiles_exact(vals, ["m"], "v", {"med": 0.5})
    med = meds.groupBy().agg(
        F.max(F.when(F.col("m") == "r", F.col("med"))).alias("med_r"),
        F.max(F.when(F.col("m") == "f", F.col("med"))).alias("med_f"),
        F.max(F.when(F.col("m") == "m", F.col("med"))).alias("med_m"),
    )
    seg = rfm.crossJoin(F.broadcast(med)).select(
        F.concat(
            F.when(F.col("recency") > F.col("med_r"), F.lit("R-"))
            .otherwise(F.lit("R+")),
            F.when(F.col("freq") > F.col("med_f"), F.lit("F+"))
            .otherwise(F.lit("F-")),
            F.when(F.col("monetary") > F.col("med_m"), F.lit("M+"))
            .otherwise(F.lit("M-")),
        ).alias("segment"),
        "monetary",
    )
    return (
        seg.groupBy("segment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            r4(F.avg("monetary"), 4).alias("avg_spend"),
        )
        .orderBy("segment")
    )


SQL_RFM = """
WITH per_cust AS (
  SELECT o_custkey, MAX(o_orderdate) AS last_dt,
         COUNT(*) AS freq, SUM(o_totalprice) AS monetary
  FROM orders GROUP BY 1
),
rfm AS (
  SELECT o_custkey,
         date_diff('day', last_dt, (SELECT MAX(last_dt) FROM per_cust))
           AS recency,
         freq, monetary
  FROM per_cust
),
med AS (
  SELECT quantile_cont(recency, 0.5) AS med_r,
         quantile_cont(freq, 0.5) AS med_f,
         quantile_cont(monetary, 0.5) AS med_m
  FROM rfm
)
SELECT (CASE WHEN recency > med_r THEN 'R-' ELSE 'R+' END)
       || (CASE WHEN freq > med_f THEN 'F+' ELSE 'F-' END)
       || (CASE WHEN monetary > med_m THEN 'M+' ELSE 'M-' END)
         AS segment,
       COUNT(*) AS n_customers,
       {AVG_SPEND} AS avg_spend
FROM rfm, med
GROUP BY 1 ORDER BY 1
"""


def q_customer_pareto_deciles(spark, sf_dir):
    """Revenue concentration: customers assigned to spend deciles by
    exact percentile BOUNDARIES (9 broadcast scalars, CASE-assigned —
    no single-task ntile sort), then per-decile share of revenue.
    Decile 1 = top spenders."""
    r4 = _helpers["_rn"]
    (orders,) = _t(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.sum("o_totalprice").alias("rev")
    )
    # decile boundaries via the bounded-memory counts-grain straddle
    # (one literal group — the window task streams distinct revenues
    # through an external sort, never F.percentile's buffer holding
    # the whole customer grain)
    bounds = grouped_quantiles_exact(
        per_cust.select(F.lit(1).alias("__g"), "rev"),
        ["__g"], "rev",
        {f"b{i}": i / 10.0 for i in range(1, 10)},
    ).drop("__g", "__n")
    total = per_cust.agg(F.sum("rev").alias("total"))
    df = per_cust.crossJoin(F.broadcast(bounds)).crossJoin(
        F.broadcast(total)
    )
    # decile 10 = lowest spenders; rev > b9 (the 0.9 boundary) ->
    # decile 1. Conditions chain in FIRST-MATCH order
    dec = F.when(F.col("rev") > F.col("b9"), F.lit(1))
    for i in range(1, 9):
        dec = dec.when(F.col("rev") > F.col(f"b{9 - i}"), F.lit(i + 1))
    dec = dec.otherwise(F.lit(10))
    return (
        df.select(dec.alias("decile"), "rev", "total")
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            r4(F.sum("rev") / F.max("total"), 6).alias("rev_share"),
        )
        .orderBy("decile")
    )


SQL_PARETO = """
WITH per_cust AS (
  SELECT o_custkey, SUM(o_totalprice) AS rev FROM orders GROUP BY 1
),
bounds AS (
  SELECT quantile_cont(rev, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS b,
         SUM(rev) AS total
  FROM per_cust
)
SELECT (CASE
          WHEN rev > b[9] THEN 1 WHEN rev > b[8] THEN 2
          WHEN rev > b[7] THEN 3 WHEN rev > b[6] THEN 4
          WHEN rev > b[5] THEN 5 WHEN rev > b[4] THEN 6
          WHEN rev > b[3] THEN 7 WHEN rev > b[2] THEN 8
          WHEN rev > b[1] THEN 9 ELSE 10 END) AS decile,
       COUNT(*) AS n_customers,
       {REV_SHARE} AS rev_share
FROM per_cust, bounds
GROUP BY 1 ORDER BY 1
"""


def q_ship_latency_medians(spark, sf_dir):
    """Per line status: EXACT median of the order-to-ship latency
    (l_shipdate - o_orderdate, via the fact-fact key join) through
    the bounded-memory grouped median, plus the slow-ship (>90 days)
    fraction — the helper's second consumer, this time downstream of
    a shuffle join."""
    r4 = _helpers["_rn"]
    li, orders = _t(spark, sf_dir, "lineitem", "orders")
    days = li.select("l_orderkey", "l_linestatus", "l_shipdate").join(
        orders.select("o_orderkey", "o_orderdate"),
        li["l_orderkey"] == orders["o_orderkey"],
    ).select(
        "l_linestatus",
        F.datediff("l_shipdate", "o_orderdate").alias("lat"),
    )
    med = grouped_median_exact(days, ["l_linestatus"], "lat", out="med_lat")
    slow = days.groupBy("l_linestatus").agg(
        (
            F.sum(F.when(F.col("lat") > 90, 1).otherwise(0))
            / F.count(F.lit(1))
        ).alias("slow_share")
    )
    return (
        med.join(slow, "l_linestatus")
        .select(
            "l_linestatus",
            r4(F.col("med_lat"), 4).alias("med_latency_days"),
            F.col("__n").cast("long").alias("n_rows"),
            r4(F.col("slow_share"), 6).alias("slow_share"),
        )
        .orderBy("l_linestatus")
    )


SQL_LEAD_TIME = """
SELECT l_linestatus,
       {MED_SLACK} AS med_latency_days,
       COUNT(*) AS n_rows,
       {LATE_SHARE} AS slow_share
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY 1 ORDER BY 1
"""


def q_lineitem_iqr_fences(spark, sf_dir):
    """Tukey fences per line status: Q1/Q3/IQR from ONE
    counts-grain pass (``grouped_quantiles_exact`` at two q's — the
    multi-quantile form; agg_mad needs two passes only because its
    second median is over a DERIVED column), broadcast back, then the
    outlier counts beyond 1.5·IQR.  Per-group state stays O(distinct
    prices); no holistic buffer."""
    r4 = _helpers["_rn"]
    (li,) = _t(spark, sf_dir, "lineitem")
    li = li.select("l_linestatus", "l_extendedprice")
    q = grouped_quantiles_exact(
        li, ["l_linestatus"], "l_extendedprice",
        {"q1": 0.25, "q3": 0.75},
    ).select("l_linestatus", "q1", "q3")
    j = li.join(F.broadcast(q), "l_linestatus")
    iqr = F.col("q3") - F.col("q1")
    lo = F.col("q1") - 1.5 * iqr
    hi = F.col("q3") + 1.5 * iqr
    return (
        j.groupBy("l_linestatus")
        .agg(
            r4(F.max("q1"), 4).alias("q1"),
            r4(F.max("q3"), 4).alias("q3"),
            F.sum(
                F.when(F.col("l_extendedprice") < lo, 1).otherwise(0)
            ).alias("n_low_outliers"),
            F.sum(
                F.when(F.col("l_extendedprice") > hi, 1).otherwise(0)
            ).alias("n_high_outliers"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .orderBy("l_linestatus")
    )


SQL_IQR = """
WITH q AS (
  SELECT l_linestatus,
         quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.25) AS q1,
         quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.75) AS q3
  FROM lineitem GROUP BY 1
)
SELECT li.l_linestatus,
       {Q1} AS q1, {Q3} AS q3,
       CAST(SUM(CASE WHEN li.l_extendedprice < q.q1 - 1.5*(q.q3-q.q1)
                THEN 1 ELSE 0 END) AS BIGINT) AS n_low_outliers,
       CAST(SUM(CASE WHEN li.l_extendedprice > q.q3 + 1.5*(q.q3-q.q1)
                THEN 1 ELSE 0 END) AS BIGINT) AS n_high_outliers,
       COUNT(*) AS n_rows
FROM lineitem li JOIN q ON li.l_linestatus = q.l_linestatus
GROUP BY 1, q.q1, q.q3 ORDER BY 1
"""


def build(helpers: dict) -> dict:
    _helpers.update(helpers)
    R = helpers["R"]
    return {
        "lineitem_iqr_fences": (
            q_lineitem_iqr_fences,
            SQL_IQR.format(Q1=R("MAX(q.q1)", 4), Q3=R("MAX(q.q3)", 4)),
        ),
        "customer_rfm_segments": (
            q_customer_rfm_segments,
            SQL_RFM.format(AVG_SPEND=R("AVG(monetary)", 4)),
        ),
        "customer_pareto_deciles": (
            q_customer_pareto_deciles,
            SQL_PARETO.format(REV_SHARE=R("SUM(rev) / MAX(total)", 6)),
        ),
        "ship_latency_medians": (
            q_ship_latency_medians,
            SQL_LEAD_TIME.format(
                MED_SLACK=R(
                    "quantile_cont(date_diff('day', o_orderdate, "
                    "l_shipdate), 0.5)",
                    4,
                ),
                LATE_SHARE=R(
                    "SUM(CASE WHEN date_diff('day', o_orderdate, "
                    "l_shipdate) > 90 THEN 1 ELSE 0 END) * 1.0 "
                    "/ COUNT(*)",
                    6,
                ),
            ),
        ),
    }
