"""Decision-support query shapes (TPC-H-derived) + array/unpivot surface.

The reference repo has no joins or subqueries at all (SURVEY §2.9); these
queries extend the engine's surface with the classic decision-support
patterns its star-schema testdata exists to exercise: correlated EXISTS
(Q4 shape), customer-order distribution (Q13 shape), per-group-threshold
filter (Q17 shape), conditional aggregation over a fact join (Q12 shape),
plus UNPIVOT, array functions over the embeddings table, RANGE-frame
windows, and null-handling scalars.

Scale notes (local[32] tests, 1000-executor design):
- Q17 shape: the naive correlated subquery rescans lineitem per part;
  we aggregate-then-join instead — one shuffle on l_partkey, and the
  brand filter is applied FIRST via a broadcast semi-join so the big
  aggregation only sees the selected parts' rows.
- Q4 shape: EXISTS decorrelates to a left-semi join on l_orderkey with
  the date inequality in the join condition — no duplicate explosion,
  map-side short-circuit once a match is found.
- RANGE frame orders by an integer day number (epoch days), which both
  engines sort identically; frames on raw timestamps differ in interval
  semantics across dialects.

Same determinism rules as registry.py (shared ``_rn``/``R`` helpers —
floor-based half-up rounding identical on both engines).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from data_lakehouse_project_spark.sources.readers import load_testdata

# populated by registry.py via build() to avoid a circular import
_helpers: dict = {}


def _rn(col, n):
    if "_rn" not in _helpers:
        # direct module use without going through registry: importing it
        # runs build(), which populates _helpers (registry imports this
        # module at its end, so no circularity at this point)
        from data_lakehouse_project_spark import registry  # noqa: F401
    return _helpers["_rn"](col, n)


def _r2(col):
    return _rn(col, 2)


def _t(spark, sf_dir, *names):
    tables = load_testdata(spark, sf_dir, names=names)
    return [tables[n] for n in names]


# --- Q4 shape: correlated EXISTS ------------------------------------------

def q_subquery_exists(spark, sf_dir):
    """Orders placed in 1996Q1 with at least one lineitem shipped >60 days
    after the order date, counted by priority.

    EXISTS ⇒ left-semi join with the correlated inequality folded into
    the join condition (Catalyst decorrelation, done by hand here to show
    the DataFrame-API form)."""
    orders, lineitem = _t(spark, sf_dir, "orders", "lineitem")
    od = F.to_date(orders.o_orderdate)
    o = orders.filter(
        (od >= F.lit("1996-01-01").cast("date"))
        & (od < F.lit("1996-04-01").cast("date"))
    )
    cond = (o.o_orderkey == lineitem.l_orderkey) & (
        F.to_date(lineitem.l_shipdate) > F.date_add(F.to_date(o.o_orderdate), 60)
    )
    return (
        o.join(lineitem, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


SQL_SUBQ_EXISTS = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
  AND CAST(o_orderdate AS DATE) < DATE '1996-04-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND CAST(l_shipdate AS DATE)
                    > CAST(o_orderdate AS DATE) + 60)
GROUP BY o_orderpriority
"""


# --- Q13 shape: customer order-count distribution --------------------------

def q_custdist(spark, sf_dir):
    """Distribution of customers by how many orders they placed
    (including zero — left outer join keeps orderless customers)."""
    customer, orders = _t(spark, sf_dir, "customer", "orders")
    per_cust = (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )


SQL_CUSTDIST = """
SELECT c_count, COUNT(*) AS custdist
FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey)
GROUP BY c_count
"""


# --- Q17 shape: per-group threshold filter ---------------------------------

def q_small_qty_revenue(spark, sf_dir):
    """Weekly-average revenue from small-quantity lineitems of one brand:
    rows whose quantity is below 20% of their part's average quantity.

    Aggregate-then-join (one pass) instead of the correlated per-part
    rescan; brand restriction pushed in front of the aggregation via a
    broadcast semi-join on the part dimension."""
    lineitem, part = _t(spark, sf_dir, "lineitem", "part")
    sel = part.filter(F.col("p_brand") == "Brand#4").select("p_partkey")
    li = lineitem.join(
        F.broadcast(sel), lineitem.l_partkey == sel.p_partkey, "left_semi"
    )
    thresh = li.groupBy("l_partkey").agg(
        (F.avg("l_quantity") * 0.2).alias("qty_thresh")
    )
    return (
        li.join(thresh, "l_partkey")
        .filter(F.col("l_quantity") < F.col("qty_thresh"))
        .agg(_r2(F.sum("l_extendedprice") / 7.0).alias("avg_yearly"))
    )


SQL_SMALL_QTY = """
SELECT {R_AVG_YEARLY} AS avg_yearly
FROM lineitem, part
WHERE p_partkey = l_partkey AND p_brand = 'Brand#4'
  AND l_quantity < (SELECT 0.2 * AVG(l2.l_quantity)
                    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
"""


# --- Q12 shape: conditional aggregation over the fact join -----------------

def q_late_shipment_flags(spark, sf_dir):
    """Per order priority: lineitems shipped more than 30 days after the
    order date vs on time. COUNT(CASE) form — one shuffle on the join
    key, then a partial+final hash aggregate on priority."""
    orders, lineitem = _t(spark, sf_dir, "orders", "lineitem")
    j = orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
    late = F.to_date("l_shipdate") > F.date_add(F.to_date("o_orderdate"), 30)
    return j.groupBy("o_orderpriority").agg(
        F.count(F.when(late, 1)).alias("late_lines"),
        F.count(F.when(~late, 1)).alias("ontime_lines"),
    )


SQL_LATE_FLAGS = """
SELECT o_orderpriority,
       COUNT(*) FILTER (WHERE CAST(l_shipdate AS DATE)
                              > CAST(o_orderdate AS DATE) + 30)
         AS late_lines,
       COUNT(*) FILTER (WHERE NOT (CAST(l_shipdate AS DATE)
                                   > CAST(o_orderdate AS DATE) + 30))
         AS ontime_lines
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY o_orderpriority
"""


# --- UNPIVOT ---------------------------------------------------------------

def q_unpivot_status_measures(spark, sf_dir):
    """Wide-to-long reshape: per-status aggregates unpivoted to
    (status, measure, value) rows — df.unpivot (a.k.a. melt)."""
    (orders,) = _t(spark, sf_dir, "orders")
    agg = orders.groupBy("o_orderstatus").agg(
        _r2(F.sum("o_totalprice")).alias("sum_price"),
        _r2(F.avg("o_totalprice")).alias("avg_price"),
        F.count(F.lit(1)).cast("double").alias("n_orders"),
    )
    return agg.unpivot(
        "o_orderstatus",
        ["sum_price", "avg_price", "n_orders"],
        "measure",
        "value",
    )


SQL_UNPIVOT = """
WITH a AS (SELECT o_orderstatus,
                  {R_SUM} AS sum_price,
                  {R_AVG} AS avg_price,
                  CAST(COUNT(*) AS DOUBLE) AS n_orders
           FROM orders GROUP BY o_orderstatus)
SELECT o_orderstatus, 'sum_price' AS measure, sum_price AS value FROM a
UNION ALL
SELECT o_orderstatus, 'avg_price', avg_price FROM a
UNION ALL
SELECT o_orderstatus, 'n_orders', n_orders FROM a
"""


# --- array functions over embeddings ---------------------------------------

def q_array_functions(spark, sf_dir):
    """Array surface on the embedding column: size, min/max element,
    first element, head slice, top-2 by value — all JVM-side array
    expressions, no Python in the loop."""
    (embeddings,) = _t(spark, sf_dir, "embeddings")
    emb = F.col("embedding")
    return embeddings.select(
        "vec_id",
        F.size(emb).cast("long").alias("dim"),
        _rn(F.array_max(emb).cast("double"), 4).alias("max_val"),
        _rn(F.array_min(emb).cast("double"), 4).alias("min_val"),
        _rn(emb.getItem(0).cast("double"), 4).alias("first_val"),
        # joined to scalar strings (fixed-scale decimal rendering matches
        # across engines); the driver's canonicalizer can't hash arrays
        F.array_join(
            F.transform(
                F.slice(emb, 1, 3),
                lambda x: _rn(x.cast("double"), 4)
                .cast("decimal(18,4)")
                .cast("string"),
            ),
            ",",
        ).alias("head3"),
        F.array_join(
            F.transform(
                F.slice(F.sort_array(emb, asc=False), 1, 2),
                lambda x: _rn(x.cast("double"), 4)
                .cast("decimal(18,4)")
                .cast("string"),
            ),
            ",",
        ).alias("top2"),
    )


_R4 = "CAST(FLOOR(CAST({x} AS DOUBLE) * 10000 + 0.5) AS DOUBLE) / 10000.0"

SQL_ARRAY_FUNCS = f"""
SELECT vec_id,
       CAST(len(embedding) AS BIGINT) AS dim,
       {_R4.format(x='list_max(embedding)')} AS max_val,
       {_R4.format(x='list_min(embedding)')} AS min_val,
       {_R4.format(x='embedding[1]')} AS first_val,
       array_to_string(list_transform(embedding[1:3],
           x -> CAST(CAST({_R4.format(x='x')} AS DECIMAL(18,4)) AS VARCHAR)),
           ',') AS head3,
       array_to_string(list_transform(list_sort(embedding, 'DESC')[1:2],
           x -> CAST(CAST({_R4.format(x='x')} AS DECIMAL(18,4)) AS VARCHAR)),
           ',') AS top2
FROM embeddings
"""


# --- RANGE-frame window ----------------------------------------------------

def q_window_range_trailing(spark, sf_dir):
    """Per-customer trailing-30-day revenue: a RANGE frame over an
    integer epoch-day ordering (value-based frame, peers share it — no
    tie nondeterminism)."""
    (orders,) = _t(spark, sf_dir, "orders")
    day_num = F.datediff(
        F.to_date("o_orderdate"), F.lit("1970-01-01").cast("date")
    )
    df = orders.withColumn("day_num", day_num)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("day_num")
        .rangeBetween(-30, 0)
    )
    return df.select(
        "o_custkey",
        "o_orderkey",
        _r2(F.sum("o_totalprice").over(w)).alias("trailing_30d_rev"),
    )


SQL_WINDOW_RANGE = """
SELECT o_custkey, o_orderkey, {R_TRAIL} AS trailing_30d_rev
FROM (SELECT *, date_diff('day', DATE '1970-01-01',
                          CAST(o_orderdate AS DATE)) AS day_num
      FROM orders)
WINDOW w AS (PARTITION BY o_custkey ORDER BY day_num
             RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)
"""


# --- null-handling scalars -------------------------------------------------

def q_null_handling(spark, sf_dir):
    """NULLIF / COALESCE / LEAST / GREATEST / conditional-NULL surface."""
    (customer,) = _t(spark, sf_dir, "customer")
    bal = F.col("c_acctbal")
    return customer.select(
        "c_custkey",
        F.coalesce(
            F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("OTHER")
        ).alias("segment_or_other"),
        _r2(F.least(bal, F.lit(0.0))).alias("neg_part"),
        _r2(F.greatest(bal, F.lit(0.0))).alias("pos_part"),
        F.when(bal < 0, F.lit(None).cast("double"))
        .otherwise(_r2(bal))
        .alias("bal_nonneg_or_null"),
        F.isnull(F.nullif(F.col("c_mktsegment"), F.lit("MACHINERY"))).alias(
            "is_machinery"
        ),
    )


SQL_NULL_HANDLING = """
SELECT c_custkey,
       COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'OTHER')
         AS segment_or_other,
       {R_NEG} AS neg_part,
       {R_POS} AS pos_part,
       CASE WHEN c_acctbal < 0 THEN NULL ELSE {R_BAL} END
         AS bal_nonneg_or_null,
       NULLIF(c_mktsegment, 'MACHINERY') IS NULL AS is_machinery
FROM customer
"""


# --- Q7 shape: dual-dimension nation-pair volume ---------------------------

def q_nation_pair_volume(spark, sf_dir):
    """Shipping volume between (supplier nation, customer nation) pairs by
    ship year. The nation dimension joins TWICE under different roles —
    column-renamed projections avoid self-join exprId ambiguity, and both
    lookups broadcast (no shuffle beyond the fact-fact orderkey join)."""
    lineitem, orders, customer, supplier, nation = _t(
        spark, sf_dir, "lineitem", "orders", "customer", "supplier", "nation"
    )
    cust_nation = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    supp_nation = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(cust_nation), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(supplier), lineitem.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(supp_nation), F.col("s_nationkey") == F.col("sn_key"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year(F.to_date("l_shipdate")).cast("long").alias("ship_year"),
        )
        .agg(
            _r2(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("volume")
        )
    )


SQL_NATION_PAIR = """
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       CAST(year(CAST(l_shipdate AS DATE)) AS BIGINT) AS ship_year,
       {R_VOL} AS volume
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
GROUP BY 1, 2, 3
"""


# --- Q10 shape: returned-item revenue ranking ------------------------------

def q_returned_item_customers(spark, sf_dir):
    """Top-20 customers by revenue lost to returns. The returnflag filter
    is pushed to the lineitem scan; customer and nation broadcast."""
    customer, orders, lineitem, nation = _t(
        spark, sf_dir, "customer", "orders", "lineitem", "nation"
    )
    returned = lineitem.filter(F.col("l_returnflag") == "R")
    return (
        returned.join(orders, returned.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            _r2(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.col("c_custkey"))
        .limit(20)
    )


SQL_RETURNED_ITEMS = """
SELECT c_custkey, c_name, n_name, {R_REV} AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


# --- Q6 shape: filtered scan aggregate -------------------------------------

def q_forecast_revenue_change(spark, sf_dir):
    """Revenue increase from dropping discounts in a band: one filtered
    scan (all three predicates pushed to parquet) + global agg."""
    (lineitem,) = _t(spark, sf_dir, "lineitem")
    d = F.to_date("l_shipdate")
    return (
        lineitem.filter(
            (d >= F.lit("1996-01-01").cast("date"))
            & (d < F.lit("1997-01-01").cast("date"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        ).agg(
            _r2(F.sum(F.col("l_extendedprice") * F.col("l_discount"))).alias(
                "revenue_change"
            )
        )
    )


SQL_FORECAST = """
SELECT {R_CHG} AS revenue_change
FROM lineitem
WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
  AND CAST(l_shipdate AS DATE) < DATE '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


# --- argmax / argmin aggregates --------------------------------------------

def q_argminmax_orders(spark, sf_dir):
    """max_by/min_by: which order had the extreme price per status.
    Ties broken deterministically by folding the orderkey into an
    integer sort key (cents * 1e7 + key — exact in int64 on both
    engines; raw double max_by would tie-break arbitrarily)."""
    (orders,) = _t(spark, sf_dir, "orders")
    sort_key = (
        F.round(F.col("o_totalprice") * 100).cast("long") * F.lit(10000000)
        + F.col("o_orderkey")
    )
    return orders.groupBy("o_orderstatus").agg(
        F.max_by("o_orderkey", sort_key).alias("priciest_order"),
        F.min_by("o_orderkey", sort_key).alias("cheapest_order"),
        _r2(F.max("o_totalprice")).alias("max_price"),
        _r2(F.min("o_totalprice")).alias("min_price"),
    )


SQL_ARGMINMAX = """
SELECT o_orderstatus,
       arg_max(o_orderkey,
               CAST(round(o_totalprice * 100) AS BIGINT) * 10000000
               + o_orderkey) AS priciest_order,
       arg_min(o_orderkey,
               CAST(round(o_totalprice * 100) AS BIGINT) * 10000000
               + o_orderkey) AS cheapest_order,
       {R_MAX} AS max_price,
       {R_MIN} AS min_price
FROM orders GROUP BY o_orderstatus
"""


# --- bivariate statistics --------------------------------------------------

def q_agg_corr_covar(spark, sf_dir):
    """Pearson correlation + sample/population covariance per return
    flag — partial+final aggregation of the co-moment sketches."""
    (lineitem,) = _t(spark, sf_dir, "lineitem")
    return lineitem.groupBy("l_returnflag").agg(
        _rn(F.corr("l_quantity", "l_extendedprice"), 6).alias("qty_price_corr"),
        _r2(F.covar_samp("l_quantity", "l_extendedprice")).alias("covar_s"),
        _r2(F.covar_pop("l_quantity", "l_extendedprice")).alias("covar_p"),
    )


SQL_CORR_COVAR = """
SELECT l_returnflag,
       {R_CORR} AS qty_price_corr,
       {R_CS} AS covar_s,
       {R_CP} AS covar_p
FROM lineitem GROUP BY l_returnflag
"""


def q_agg_regression(spark, sf_dir):
    """Linear-regression aggregates: price explained by quantity."""
    (lineitem,) = _t(spark, sf_dir, "lineitem")
    y, x = F.col("l_extendedprice"), F.col("l_quantity")
    return lineitem.groupBy("l_linestatus").agg(
        _rn(F.regr_slope(y, x), 4).alias("slope"),
        _r2(F.regr_intercept(y, x)).alias("intercept"),
        _rn(F.regr_r2(y, x), 6).alias("r2"),
        F.regr_count(y, x).alias("n_points"),
    )


SQL_REGRESSION = """
SELECT l_linestatus,
       {R_SLOPE} AS slope,
       {R_ICEPT} AS intercept,
       {R_R2} AS r2,
       regr_count(l_extendedprice, l_quantity) AS n_points
FROM lineitem GROUP BY l_linestatus
"""


def q_agg_bitwise(spark, sf_dir):
    """Bitwise AND/OR/XOR aggregates over user ids per event type."""
    (events,) = _t(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.bit_and("user_id").alias("uid_and"),
        F.bit_or("user_id").alias("uid_or"),
        F.bit_xor("user_id").alias("uid_xor"),
    )


SQL_BITWISE = """
SELECT event_type,
       bit_and(user_id) AS uid_and,
       bit_or(user_id) AS uid_or,
       bit_xor(user_id) AS uid_xor
FROM events GROUP BY event_type
"""


def q_try_cast_safe(spark, sf_dir):
    """Safe casting: TRY_CAST returns NULL instead of failing the job —
    the difference matters at 100 TB where one malformed row must not
    kill a 1000-executor stage."""
    (orders,) = _t(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.expr("try_cast(o_orderpriority AS INT)").alias("prio_as_int"),
        F.expr(
            "try_cast(substring(o_orderpriority, 1, 1) AS INT)"
        ).alias("prio_digit"),
        F.expr("try_cast(o_orderstatus AS DATE)").alias("status_as_date"),
    )


SQL_TRY_CAST = """
SELECT o_orderkey,
       TRY_CAST(o_orderpriority AS INTEGER) AS prio_as_int,
       TRY_CAST(substring(o_orderpriority, 1, 1) AS INTEGER) AS prio_digit,
       TRY_CAST(o_orderstatus AS DATE) AS status_as_date
FROM orders
"""


# --- JSON surface ----------------------------------------------------------

def q_events_json_surface(spark, sf_dir):
    """JSON in/out: key listing, path extraction, struct→JSON packing —
    all JVM-side (Jackson), no Python."""
    (events,) = _t(spark, sf_dir, "events")
    return events.select(
        "event_id",
        F.array_join(F.sort_array(F.json_object_keys("props")), ",").alias(
            "prop_keys"
        ),
        F.get_json_object("props", "$.k").cast("long").alias("k_value"),
        F.to_json(F.struct(F.col("event_id"), F.col("event_type"))).alias(
            "packed"
        ),
    )


SQL_JSON_SURFACE = """
SELECT event_id,
       array_to_string(list_sort(json_keys(props)), ',') AS prop_keys,
       CAST(props->>'k' AS BIGINT) AS k_value,
       CAST(to_json(struct_pack(event_id := event_id,
                                event_type := event_type)) AS VARCHAR)
         AS packed
FROM events
"""


# --- discrete percentiles --------------------------------------------------

SQL_PDISC_DUCK = """
SELECT l_returnflag,
       quantile_disc(l_quantity, 0.25) AS q1,
       quantile_disc(l_quantity, 0.50) AS q2,
       quantile_disc(l_quantity, 0.75) AS q3
FROM lineitem GROUP BY l_returnflag
"""


def q_percentile_disc(spark, sf_dir):
    """PERCENTILE_DISC (smallest value with cume_dist >= p — an actual
    data value, no interpolation; verified equal to DuckDB's
    quantile_disc rule on boundary cases).

    Round 9: rebuilt on the COUNTS GRAIN (``grouped_quantiles_disc``,
    O(distinct values) per-group state — no holistic buffer) while
    keeping the DuckDB ``quantile_disc`` oracle; the SQL
    ``PERCENTILE_DISC ... WITHIN GROUP`` form stays pinned by a
    pytest parity test (test_quantiles.py)."""
    from data_lakehouse_project_spark.functions.quantiles import (
        grouped_quantiles_disc,
    )

    tables = load_testdata(spark, sf_dir, names=("lineitem",))
    qq = grouped_quantiles_disc(
        tables["lineitem"].select("l_returnflag", "l_quantity"),
        ["l_returnflag"],
        "l_quantity",
        {"q1": 0.25, "q2": 0.50, "q3": 0.75},
    )
    return qq.select("l_returnflag", "q1", "q2", "q3")


# --- positional explode ----------------------------------------------------

def q_tokens_with_position(spark, sf_dir):
    """posexplode: first-5 tokens of each document with their position
    (generator expands JVM-side; the oracle zips parallel unnests)."""
    (documents,) = _t(spark, sf_dir, "documents")
    toks = _helpers["tokens"](F.col("text"))
    return documents.select(
        "doc_id", F.posexplode(F.slice(toks, 1, 5)).alias("pos", "token")
    ).withColumn("pos", F.col("pos").cast("long"))


SQL_TOKENS_POS = """
SELECT doc_id,
       unnest(range(0, least(len(toks), 5))) AS pos,
       unnest(toks[1:5]) AS token
FROM (SELECT doc_id, {TOKS} AS toks FROM documents)
"""


# --- multiset set operations -----------------------------------------------

def _half_years(orders):
    d = F.to_date("o_orderdate")
    first = orders.where(F.year(d) == 1996).select("o_orderpriority")
    second = orders.where(F.year(d) == 1997).select("o_orderpriority")
    return first, second


def q_setop_intersect_all(spark, sf_dir):
    """INTERSECT ALL: multiplicity-preserving intersection (min of the
    per-side duplicate counts) of two years' priority multisets."""
    (orders,) = _t(spark, sf_dir, "orders")
    a, b = _half_years(orders)
    return a.intersectAll(b)


SQL_INTERSECT_ALL = """
SELECT o_orderpriority FROM orders WHERE year(CAST(o_orderdate AS DATE)) = 1996
INTERSECT ALL
SELECT o_orderpriority FROM orders WHERE year(CAST(o_orderdate AS DATE)) = 1997
"""


def q_setop_except_all(spark, sf_dir):
    """EXCEPT ALL: multiplicity-preserving difference."""
    (orders,) = _t(spark, sf_dir, "orders")
    a, b = _half_years(orders)
    return a.exceptAll(b)


SQL_EXCEPT_ALL = """
SELECT o_orderpriority FROM orders WHERE year(CAST(o_orderdate AS DATE)) = 1996
EXCEPT ALL
SELECT o_orderpriority FROM orders WHERE year(CAST(o_orderdate AS DATE)) = 1997
"""


# --- generated date spine --------------------------------------------------

def q_date_spine_months(spark, sf_dir):
    """sequence() month spine LEFT-joined to order counts: months with no
    orders survive with n_orders = 0 (the report-completeness pattern;
    the spine generates JVM-side, no driver loop)."""
    (orders,) = _t(spark, sf_dir, "orders")
    spine = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("1996-01-01").cast("date"),
                F.lit("1996-12-01").cast("date"),
                F.expr("INTERVAL 1 MONTH"),
            )
        ).alias("month_start")
    )
    monthly = (
        orders.where(F.year(F.to_date("o_orderdate")) == 1996)
        .groupBy(F.trunc(F.to_date("o_orderdate"), "month").alias("month_start"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return spine.join(monthly, "month_start", "left").select(
        "month_start", F.coalesce(F.col("n"), F.lit(0)).alias("n_orders")
    )


SQL_DATE_SPINE = """
SELECT month_start, COALESCE(n, 0) AS n_orders
FROM (SELECT unnest(generate_series(DATE '1996-01-01', DATE '1996-12-01',
                                    INTERVAL 1 MONTH))::DATE AS month_start)
LEFT JOIN (SELECT date_trunc('month', CAST(o_orderdate AS DATE)) AS m,
                  COUNT(*) AS n
           FROM orders WHERE year(CAST(o_orderdate AS DATE)) = 1996
           GROUP BY 1) ON m = month_start
"""


# --- regular-expression surface --------------------------------------------

def q_regexp_surface(spark, sf_dir):
    """regexp_extract / regexp_replace / rlike / regexp_count over part
    names (Java regex vs RE2 — restricted to the common subset)."""
    (part,) = _t(spark, sf_dir, "part")
    return part.where(F.col("p_name").rlike("^[a-z]+ ")).select(
        "p_partkey",
        F.regexp_extract("p_name", "([a-z]+)$", 1).alias("last_word"),
        F.regexp_replace("p_name", "[aeiou]", "*").alias("devoweled"),
        F.regexp_count("p_name", F.lit("[a-z]+")).cast("long").alias("n_words"),
    )


SQL_REGEXP = """
SELECT p_partkey,
       regexp_extract(p_name, '([a-z]+)$', 1) AS last_word,
       regexp_replace(p_name, '[aeiou]', '*', 'g') AS devoweled,
       len(regexp_extract_all(p_name, '[a-z]+')) AS n_words
FROM part WHERE regexp_matches(p_name, '^[a-z]+ ')
"""


# --- nth_value / offset lag / grouping markers / any_value ------------------

def q_window_nth_lag(spark, sf_dir):
    """nth_value with an explicit running frame + lag with offset 2 and
    a default — the remaining window-offset surface."""
    (orders,) = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wf = w.rowsBetween(Window.unboundedPreceding, 0)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.nth_value("o_orderkey", 2).over(wf).alias("second_order"),
        _r2(F.lag("o_totalprice", 2, 0.0).over(w)).alias("price_2_back"),
    )


SQL_NTH_LAG = """
SELECT o_custkey, o_orderkey,
       nth_value(o_orderkey, 2) OVER wf AS second_order,
       {R_LAG} AS price_2_back
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
       wf AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


def q_window_ntile(spark, sf_dir):
    """NTILE bucketing (equal-frequency quartiles per order status) —
    the remaining ranking-window surface beyond row_number/rank/
    percent_rank. Unique (price, key) tiebreak makes bucket assignment
    engine-portable."""
    (orders,) = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy(
        "o_totalprice", "o_orderkey"
    )
    return orders.select(
        "o_orderstatus",
        "o_orderkey",
        F.ntile(4).over(w).cast("long").alias("price_quartile"),
    )


SQL_NTILE = """
SELECT o_orderstatus, o_orderkey,
       CAST(NTILE(4) OVER (PARTITION BY o_orderstatus
                           ORDER BY o_totalprice, o_orderkey) AS BIGINT)
         AS price_quartile
FROM orders
"""


def q_rollup_grouping_markers(spark, sf_dir):
    """ROLLUP with GROUPING() markers so consumers can tell subtotal rows
    from real NULL groups."""
    (orders,) = _t(spark, sf_dir, "orders")
    return orders.rollup("o_orderstatus", "o_orderpriority").agg(
        F.grouping("o_orderstatus").cast("long").alias("is_status_total"),
        F.grouping("o_orderpriority").cast("long").alias("is_prio_total"),
        F.count(F.lit(1)).alias("n_orders"),
    )


SQL_ROLLUP_GROUPING = """
SELECT o_orderstatus, o_orderpriority,
       CAST(GROUPING(o_orderstatus) AS BIGINT) AS is_status_total,
       CAST(GROUPING(o_orderpriority) AS BIGINT) AS is_prio_total,
       COUNT(*) AS n_orders
FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
"""


def q_any_value_dependent(spark, sf_dir):
    """any_value over a functionally-dependent column (nation name per
    nation key after the join) — deterministic because every value in
    the group is identical; avoids carrying the dimension through the
    aggregate's shuffle."""
    customer, nation = _t(spark, sf_dir, "customer", "nation")
    return (
        customer.join(
            F.broadcast(nation),
            customer.c_nationkey == nation.n_nationkey,
        )
        .groupBy("c_nationkey")
        .agg(
            F.any_value("n_name").alias("nation_name"),
            F.count(F.lit(1)).alias("n_customers"),
        )
    )


SQL_ANY_VALUE = """
SELECT c_nationkey, any_value(n_name) AS nation_name,
       COUNT(*) AS n_customers
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY c_nationkey
"""


def build(helpers: dict) -> dict:
    """Return {name: (fn, oracle_sql)} for the decision-support surface."""
    _helpers.update(helpers)
    R = helpers["R"]
    return {
        "subquery_exists": (q_subquery_exists, SQL_SUBQ_EXISTS),
        "custdist": (q_custdist, SQL_CUSTDIST),
        "small_qty_revenue": (
            q_small_qty_revenue,
            SQL_SMALL_QTY.format(
                R_AVG_YEARLY=R("SUM(l_extendedprice) / 7.0")
            ),
        ),
        "late_shipment_flags": (q_late_shipment_flags, SQL_LATE_FLAGS),
        "unpivot_status_measures": (
            q_unpivot_status_measures,
            SQL_UNPIVOT.format(
                R_SUM=R("SUM(o_totalprice)"), R_AVG=R("AVG(o_totalprice)")
            ),
        ),
        "array_functions": (q_array_functions, SQL_ARRAY_FUNCS),
        "window_range_trailing": (
            q_window_range_trailing,
            SQL_WINDOW_RANGE.format(R_TRAIL=R("SUM(o_totalprice) OVER w")),
        ),
        "null_handling": (
            q_null_handling,
            SQL_NULL_HANDLING.format(
                R_NEG=R("LEAST(c_acctbal, 0.0)"),
                R_POS=R("GREATEST(c_acctbal, 0.0)"),
                R_BAL=R("c_acctbal"),
            ),
        ),
        "nation_pair_volume": (
            q_nation_pair_volume,
            SQL_NATION_PAIR.format(
                R_VOL=R("SUM(l_extendedprice * (1 - l_discount))")
            ),
        ),
        "returned_item_customers": (
            q_returned_item_customers,
            SQL_RETURNED_ITEMS.format(
                R_REV=R("SUM(l_extendedprice * (1 - l_discount))")
            ),
        ),
        "forecast_revenue_change": (
            q_forecast_revenue_change,
            SQL_FORECAST.format(
                R_CHG=R("SUM(l_extendedprice * l_discount)")
            ),
        ),
        "argminmax_orders": (
            q_argminmax_orders,
            SQL_ARGMINMAX.format(
                R_MAX=R("MAX(o_totalprice)"), R_MIN=R("MIN(o_totalprice)")
            ),
        ),
        "agg_corr_covar": (
            q_agg_corr_covar,
            SQL_CORR_COVAR.format(
                R_CORR=R("corr(l_quantity, l_extendedprice)", 6),
                R_CS=R("covar_samp(l_quantity, l_extendedprice)"),
                R_CP=R("covar_pop(l_quantity, l_extendedprice)"),
            ),
        ),
        "agg_regression": (
            q_agg_regression,
            SQL_REGRESSION.format(
                R_SLOPE=R("regr_slope(l_extendedprice, l_quantity)", 4),
                R_ICEPT=R("regr_intercept(l_extendedprice, l_quantity)"),
                R_R2=R("regr_r2(l_extendedprice, l_quantity)", 6),
            ),
        ),
        "agg_bitwise": (q_agg_bitwise, SQL_BITWISE),
        "try_cast_safe": (q_try_cast_safe, SQL_TRY_CAST),
        "events_json_surface": (q_events_json_surface, SQL_JSON_SURFACE),
        "percentile_disc_qty": (q_percentile_disc, SQL_PDISC_DUCK),
        "tokens_with_position": (
            q_tokens_with_position,
            SQL_TOKENS_POS.format(TOKS=helpers["TOKS"]),
        ),
        "window_nth_lag": (
            q_window_nth_lag,
            SQL_NTH_LAG.format(R_LAG=R("lag(o_totalprice, 2, 0.0) OVER w")),
        ),
        "window_ntile": (q_window_ntile, SQL_NTILE),
        "rollup_grouping_markers": (
            q_rollup_grouping_markers,
            SQL_ROLLUP_GROUPING,
        ),
        "any_value_dependent": (q_any_value_dependent, SQL_ANY_VALUE),
        "setop_intersect_all": (q_setop_intersect_all, SQL_INTERSECT_ALL),
        "setop_except_all": (q_setop_except_all, SQL_EXCEPT_ALL),
        "date_spine_months": (q_date_spine_months, SQL_DATE_SPINE),
        "regexp_surface": (q_regexp_surface, SQL_REGEXP),
    }
