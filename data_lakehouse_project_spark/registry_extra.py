"""Extended query surface: windows (rank/lead/ntile), statistical
aggregates, pivot, grouping sets, subqueries, full-outer/cross joins,
scalar math/string functions, and SQL-API parity queries.

Same determinism rules as registry.py (shared ``_rn``/``R`` helpers).
The ``*_sql`` queries are implemented by feeding Spark the *same SQL
string* the DuckDB oracle runs — demonstrating the engine's spark.sql
entry point and cross-dialect ANSI compliance in one shot.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from data_lakehouse_project_spark.sources.readers import load_testdata

# populated by registry.py to avoid a circular import
_helpers: dict = {}


def _r2(col):
    return _helpers["_rn"](col, 2)


def _rn(col, n):
    return _helpers["_rn"](col, n)


def _t(spark, sf_dir, *names):
    tables = load_testdata(spark, sf_dir, names=names)
    return [tables[n] for n in names]


def _sql(spark, sf_dir, query):
    load_testdata(spark, sf_dir, register_views=True)
    return spark.sql(query)


# --- windows -------------------------------------------------------------

def q_window_rank_dense(spark, sf_dir):
    """rank/dense_rank with ties (same o_totalprice ⇒ same rank)."""
    (orders,) = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"))
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.rank().over(w).cast("long").alias("price_rank"),
        F.dense_rank().over(w).cast("long").alias("price_dense_rank"),
    )


SQL_WINDOW_RANK = """
SELECT o_custkey, o_orderkey,
       rank() OVER w AS price_rank,
       dense_rank() OVER w AS price_dense_rank
FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC)
"""


def q_window_lead_ntile(spark, sf_dir):
    """lead() and ntile() with fully-deterministic ordering."""
    (orders,) = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wt = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.col("o_orderkey")
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.lead(F.to_date("o_orderdate")).over(w).alias("next_order_date"),
        F.ntile(4).over(wt).cast("long").alias("price_quartile"),
    )


SQL_WINDOW_LEAD = """
SELECT o_custkey, o_orderkey,
       lead(CAST(o_orderdate AS DATE)) OVER
         (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
         AS next_order_date,
       ntile(4) OVER
         (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
         AS price_quartile
FROM orders
"""

# --- statistical aggregates ---------------------------------------------

def q_agg_stats(spark, sf_dir):
    """min/max/stddev/count-distinct over lineitem."""
    (lineitem,) = _t(spark, sf_dir, "lineitem")
    return lineitem.agg(
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
        _r2(F.stddev_samp("l_extendedprice")).alias("stddev_price"),
        F.countDistinct("l_suppkey").alias("n_suppliers"),
        F.countDistinct("l_returnflag", "l_linestatus").alias("n_flag_combos"),
        _rn(F.avg("l_discount"), 4).alias("avg_discount"),
    )


def _R(expr, digits=2):
    return _helpers["R"](expr, digits)


def q_agg_median(spark, sf_dir):
    """Exact median / percentile (percentile_cont interpolation) via
    the bounded-memory counts-grain straddle
    (``registry_r6.grouped_quantiles_exact`` — bit-identical to the
    holistic ``F.percentile`` without its per-group every-row buffer).
    Two value columns -> two count-grain passes joined on the 3-group
    key (broadcast)."""
    from data_lakehouse_project_spark.registry_r6 import (
        grouped_quantiles_exact,
    )

    (lineitem,) = _t(spark, sf_dir, "lineitem")
    med = grouped_quantiles_exact(
        lineitem.select("l_returnflag", "l_quantity"),
        ["l_returnflag"], "l_quantity", {"mq": 0.5},
    ).select("l_returnflag", "mq")
    p90 = grouped_quantiles_exact(
        lineitem.select("l_returnflag", "l_extendedprice"),
        ["l_returnflag"], "l_extendedprice", {"p9": 0.9},
    ).select("l_returnflag", "p9")
    return med.join(F.broadcast(p90), "l_returnflag").select(
        "l_returnflag",
        _r2(F.col("mq")).alias("median_qty"),
        _r2(F.col("p9")).alias("p90_price"),
    )


def q_agg_collect_set(spark, sf_dir):
    """Array aggregate: sorted distinct statuses per priority."""
    (orders,) = _t(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.array_join(
            F.sort_array(F.collect_set("o_orderstatus")), ","
        ).alias("statuses"),
        F.count(F.lit(1)).alias("n_orders"),
    )


# statuses joined to a scalar string: the driver's pandas canonicalizer
# cannot hash list cells, so oracle-checked queries never emit arrays
SQL_AGG_COLLECT = """
SELECT o_orderpriority,
       array_to_string(list_sort(list_distinct(list(o_orderstatus))), ',')
         AS statuses,
       COUNT(*) AS n_orders
FROM orders GROUP BY o_orderpriority
"""

# --- pivot / grouping sets ----------------------------------------------

_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]


def q_pivot_status_priority(spark, sf_dir):
    """Pivot: order counts, status rows × priority columns.

    Explicit pivot values — never let Spark run the distinct-scan job to
    discover them (an extra pass over the fact table at scale).
    """
    (orders,) = _t(spark, sf_dir, "orders")
    out = (
        orders.groupBy("o_orderstatus")
        .pivot("o_orderpriority", _PRIORITIES)
        .agg(F.count(F.lit(1)))
        .na.fill(0, _PRIORITIES)
    )
    return out


SQL_PIVOT = """
SELECT o_orderstatus,
       COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS "1-URGENT",
       COUNT(*) FILTER (WHERE o_orderpriority = '2-HIGH') AS "2-HIGH",
       COUNT(*) FILTER (WHERE o_orderpriority = '3-MEDIUM') AS "3-MEDIUM",
       COUNT(*) FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED')
         AS "4-NOT SPECIFIED",
       COUNT(*) FILTER (WHERE o_orderpriority = '5-LOW') AS "5-LOW"
FROM orders GROUP BY o_orderstatus
"""

SQL_GROUPING_SETS = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS order_count
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
"""


def q_grouping_sets_sql(spark, sf_dir):
    """GROUPING SETS via the spark.sql surface (same string as oracle)."""
    return _sql(spark, sf_dir, SQL_GROUPING_SETS)

# --- subqueries -----------------------------------------------------------

SQL_SUBQ_SCALAR = """
SELECT o_orderkey, o_totalprice FROM orders
WHERE o_totalprice > 1.5 * (SELECT AVG(o_totalprice) FROM orders)
"""


def q_subquery_scalar_sql(spark, sf_dir):
    """Scalar subquery in a predicate — Catalyst plans one extra agg job;
    the comparison value is broadcast into the filter."""
    return _sql(spark, sf_dir, SQL_SUBQ_SCALAR)


SQL_SUBQ_IN = """
SELECT c_custkey, c_acctbal FROM customer
WHERE c_custkey IN
  (SELECT o_custkey FROM orders GROUP BY o_custkey HAVING COUNT(*) > 12)
"""


def q_subquery_in_sql(spark, sf_dir):
    """IN-subquery (decorrelated to a semi-join by Catalyst)."""
    return _sql(spark, sf_dir, SQL_SUBQ_IN)

# --- more join families ---------------------------------------------------

def q_join_full_outer(spark, sf_dir):
    """Full outer join of two disjoint-date aggregates: order revenue by
    day vs event value by day — exercises null fill on both sides."""
    orders, events = _t(spark, sf_dir, "orders", "events")
    rev = orders.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        _r2(F.sum("o_totalprice")).alias("order_rev")
    )
    ev = events.groupBy(F.to_date("ts").alias("d")).agg(
        _r2(F.sum("value")).alias("event_val")
    )
    return (
        rev.join(ev, "d", "full_outer")
        .select(
            F.col("d").alias("day"),
            "order_rev",
            "event_val",
        )
    )


SQL_JOIN_FULL = f"""
SELECT COALESCE(r.d, e.d) AS day, order_rev, event_val
FROM (SELECT CAST(o_orderdate AS DATE) d, {{R_SUM_PRICE}} order_rev
      FROM orders GROUP BY 1) r
FULL OUTER JOIN
     (SELECT CAST(ts AS DATE) d, {{R_SUM_VALUE}} event_val
      FROM events GROUP BY 1) e
ON r.d = e.d
"""


def q_join_cross(spark, sf_dir):
    """Explicit cartesian product of two tiny dimension sets."""
    region, orders = _t(spark, sf_dir, "region", "orders")
    statuses = orders.select("o_orderstatus").distinct()
    return region.crossJoin(statuses).select("r_name", "o_orderstatus")


SQL_JOIN_CROSS = """
SELECT r_name, o_orderstatus
FROM region CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders)
"""

# --- scalar math / string / conditional functions -------------------------

def q_scalar_math_string(spark, sf_dir):
    """Math + string scalar surface on part."""
    (part,) = _t(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.abs(F.col("p_size") - 10).cast("long").alias("size_dist"),
        F.ceil(F.sqrt("p_retailprice")).alias("ceil_sqrt_price"),
        _rn(F.sqrt("p_retailprice"), 4).alias("sqrt_price"),
        F.substring("p_name", 1, 4).alias("name_prefix"),
        F.upper("p_type").alias("type_upper"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_slug"),
        F.length("p_name").cast("long").alias("name_len"),
        F.greatest(F.col("p_size"), F.lit(10)).cast("long").alias("size_floor10"),
    )


SQL_SCALAR_MATH = """
SELECT p_partkey,
       CAST(abs(p_size - 10) AS BIGINT) AS size_dist,
       CAST(ceil(sqrt(p_retailprice)) AS BIGINT) AS ceil_sqrt_price,
       {R_SQRT} AS sqrt_price,
       substring(p_name, 1, 4) AS name_prefix,
       upper(p_type) AS type_upper,
       concat_ws(':', p_brand, p_type) AS brand_type,
       replace(p_type, ' ', '_') AS type_slug,
       length(p_name) AS name_len,
       CAST(greatest(p_size, 10) AS BIGINT) AS size_floor10
FROM part
"""


def q_case_when_buckets(spark, sf_dir):
    """CASE WHEN bucketing + conditional aggregation."""
    (customer,) = _t(spark, sf_dir, "customer")
    bucket = (
        F.when(F.col("c_acctbal") < 0, "negative")
        .when(F.col("c_acctbal") < 1000, "low")
        .when(F.col("c_acctbal") < 5000, "mid")
        .otherwise("high")
    )
    return customer.groupBy(bucket.alias("balance_bucket")).agg(
        F.count(F.lit(1)).alias("n_customers"),
        _r2(F.avg("c_acctbal")).alias("avg_bal"),
    )


SQL_CASE_WHEN = """
SELECT CASE WHEN c_acctbal < 0 THEN 'negative'
            WHEN c_acctbal < 1000 THEN 'low'
            WHEN c_acctbal < 5000 THEN 'mid'
            ELSE 'high' END AS balance_bucket,
       COUNT(*) AS n_customers,
       {R_AVG_BAL} AS avg_bal
FROM customer GROUP BY 1
"""

def q_join_right_outer(spark, sf_dir):
    """Right outer join (orders ⟕ mirrored): every customer kept."""
    orders, customer = _t(spark, sf_dir, "orders", "customer")
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey, "right")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            _r2(F.coalesce(F.sum("o_totalprice"), F.lit(0.0))).alias("revenue"),
        )
    )


SQL_JOIN_RIGHT = """
SELECT c_custkey, COUNT(o_orderkey) AS n_orders,
       {R_REV} AS revenue
FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
GROUP BY c_custkey
"""


def q_window_first_last(spark, sf_dir):
    """first_value/last_value with explicit full-partition frames."""
    (orders,) = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.first_value("o_orderkey").over(w).alias("first_order"),
        F.last_value("o_orderkey").over(w).alias("last_order"),
    )


SQL_WINDOW_FIRST_LAST = """
SELECT o_custkey, o_orderkey,
       first_value(o_orderkey) OVER w AS first_order,
       last_value(o_orderkey) OVER w AS last_order
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""


def q_histogram_totalprice(spark, sf_dir):
    """Fixed-width histogram via arithmetic binning (identical floor
    expression on both engines — no engine histogram function needed)."""
    (orders,) = _t(spark, sf_dir, "orders")
    bucket = F.floor(F.col("o_totalprice") / 50000).cast("long")
    return (
        orders.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            _r2(F.min("o_totalprice")).alias("bucket_min"),
            _r2(F.max("o_totalprice")).alias("bucket_max"),
        )
    )


SQL_HISTOGRAM = """
SELECT CAST(FLOOR(o_totalprice / 50000) AS BIGINT) AS bucket,
       COUNT(*) AS n_orders,
       {R_MIN} AS bucket_min,
       {R_MAX} AS bucket_max
FROM orders GROUP BY 1
"""


def q_window_percentiles(spark, sf_dir):
    """percent_rank / cume_dist over a deterministic total order."""
    (orders,) = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.desc("o_totalprice"), F.col("o_orderkey")
    )
    return orders.select(
        "o_orderkey",
        "o_orderstatus",
        F.percent_rank().over(w).alias("price_pct_rank"),
        F.cume_dist().over(w).alias("price_cume_dist"),
    )


SQL_WINDOW_PCT = """
SELECT o_orderkey, o_orderstatus,
       percent_rank() OVER w AS price_pct_rank,
       cume_dist() OVER w AS price_cume_dist
FROM orders
WINDOW w AS (PARTITION BY o_orderstatus
             ORDER BY o_totalprice DESC, o_orderkey)
"""


def q_agg_string_concat(spark, sf_dir):
    """Ordered string aggregation (array_join over sorted collect_list)."""
    (orders,) = _t(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.array_join(
            F.array_sort(F.collect_set("o_orderstatus")), "|"
        ).alias("statuses_joined")
    )


SQL_STRING_CONCAT = """
SELECT o_orderpriority,
       string_agg(DISTINCT o_orderstatus, '|' ORDER BY o_orderstatus)
         AS statuses_joined
FROM orders GROUP BY o_orderpriority
"""

def q_date_arithmetic(spark, sf_dir):
    """Date arithmetic surface: add/sub, month boundaries, day diffs."""
    (orders,) = _t(spark, sf_dir, "orders")
    d = F.to_date("o_orderdate")
    return orders.select(
        "o_orderkey",
        F.date_add(d, 30).alias("due_date"),
        F.date_sub(d, 7).alias("week_before"),
        F.last_day(d).alias("month_end"),
        F.datediff(F.lit("2000-01-01").cast("date"), d)
        .cast("long")
        .alias("days_to_y2k"),
        F.trunc(d, "month").alias("month_start"),
    )


SQL_DATE_ARITH = """
SELECT o_orderkey,
       CAST(o_orderdate AS DATE) + 30 AS due_date,
       CAST(o_orderdate AS DATE) - 7 AS week_before,
       last_day(CAST(o_orderdate AS DATE)) AS month_end,
       date_diff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01')
         AS days_to_y2k,
       date_trunc('month', CAST(o_orderdate AS DATE)) AS month_start
FROM orders
"""


def q_string_functions(spark, sf_dir):
    """Advanced string surface: pad/translate/reverse/edit distance."""
    (part,) = _t(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.lpad("p_brand", 10, "#").alias("brand_padded"),
        F.rpad("p_name", 12, ".").alias("name_padded"),
        F.translate("p_type", "aeiou", "AEIOU").alias("type_translated"),
        F.reverse("p_name").alias("name_reversed"),
        F.levenshtein("p_name", F.lit("red widget")).cast("long").alias(
            "dist_to_red_widget"
        ),
        F.split(F.col("p_name"), " ").getItem(0).alias("first_word"),
    )


SQL_STRING_FUNCS = """
SELECT p_partkey,
       lpad(p_brand, 10, '#') AS brand_padded,
       rpad(p_name, 12, '.') AS name_padded,
       translate(p_type, 'aeiou', 'AEIOU') AS type_translated,
       reverse(p_name) AS name_reversed,
       levenshtein(p_name, 'red widget') AS dist_to_red_widget,
       string_split(p_name, ' ')[1] AS first_word
FROM part
"""

# --- union-all lineage ----------------------------------------------------

def q_union_all_tagged(spark, sf_dir):
    """UNION ALL with a source tag (unionByName)."""
    orders, lineitem = _t(spark, sf_dir, "orders", "lineitem")
    a = orders.select(
        F.col("o_orderkey").alias("key"),
        F.to_date("o_orderdate").alias("d"),
        F.lit("order").alias("src"),
    )
    b = lineitem.select(
        F.col("l_orderkey").alias("key"),
        F.to_date("l_shipdate").alias("d"),
        F.lit("lineitem").alias("src"),
    )
    return a.unionByName(b)


SQL_UNION_ALL = """
SELECT o_orderkey AS key, CAST(o_orderdate AS DATE) AS d, 'order' AS src
FROM orders
UNION ALL
SELECT l_orderkey, CAST(l_shipdate AS DATE), 'lineitem' FROM lineitem
"""

# --- SQL-API parity -------------------------------------------------------

def q_pricing_summary_sql(spark, sf_dir):
    """The TPC-H Q1 shape through spark.sql — the exact string the DuckDB
    oracle runs, proving ANSI parity of the SQL entry point."""
    return _sql(spark, sf_dir, _helpers["SQL_PRICING"])


def build(helpers: dict) -> dict:
    """Return {name: (fn, oracle_sql)} for the extended surface.

    ``helpers`` carries registry.py's determinism helpers (R, _rn) and the
    shared SQL_PRICING text.
    """
    _helpers.update(helpers)
    R = helpers["R"]

    sql_stats = f"""
SELECT MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty,
       {R('STDDEV_SAMP(l_extendedprice)')} AS stddev_price,
       COUNT(DISTINCT l_suppkey) AS n_suppliers,
       COUNT(DISTINCT (l_returnflag, l_linestatus)) AS n_flag_combos,
       {R('AVG(l_discount)', 4)} AS avg_discount
FROM lineitem
"""
    sql_median = f"""
SELECT l_returnflag,
       {R('MEDIAN(l_quantity)')} AS median_qty,
       {R('QUANTILE_CONT(l_extendedprice, 0.9)')} AS p90_price
FROM lineitem GROUP BY l_returnflag
"""
    sql_full = SQL_JOIN_FULL.format(
        R_SUM_PRICE=R("SUM(o_totalprice)"), R_SUM_VALUE=R("SUM(value)")
    )
    sql_math = SQL_SCALAR_MATH.format(R_SQRT=R("sqrt(p_retailprice)", 4))
    sql_case = SQL_CASE_WHEN.format(R_AVG_BAL=R("AVG(c_acctbal)"))

    return {
        "window_rank_dense": (q_window_rank_dense, SQL_WINDOW_RANK),
        "window_lead_ntile": (q_window_lead_ntile, SQL_WINDOW_LEAD),
        "agg_stats": (q_agg_stats, sql_stats),
        "agg_median_percentile": (q_agg_median, sql_median),
        "agg_collect_set": (q_agg_collect_set, SQL_AGG_COLLECT),
        "pivot_status_priority": (q_pivot_status_priority, SQL_PIVOT),
        "grouping_sets_sql": (q_grouping_sets_sql, SQL_GROUPING_SETS),
        "subquery_scalar": (q_subquery_scalar_sql, SQL_SUBQ_SCALAR),
        "subquery_in": (q_subquery_in_sql, SQL_SUBQ_IN),
        "join_full_outer": (q_join_full_outer, sql_full),
        "join_cross": (q_join_cross, SQL_JOIN_CROSS),
        "scalar_math_string": (q_scalar_math_string, sql_math),
        "case_when_buckets": (q_case_when_buckets, sql_case),
        "union_all_tagged": (q_union_all_tagged, SQL_UNION_ALL),
        "pricing_summary_sql": (q_pricing_summary_sql, helpers["SQL_PRICING"]),
        "join_right_outer": (
            q_join_right_outer,
            SQL_JOIN_RIGHT.format(R_REV=R("COALESCE(SUM(o_totalprice), 0.0)")),
        ),
        "window_first_last": (q_window_first_last, SQL_WINDOW_FIRST_LAST),
        "agg_string_concat": (q_agg_string_concat, SQL_STRING_CONCAT),
        "date_arithmetic": (q_date_arithmetic, SQL_DATE_ARITH),
        "string_functions": (q_string_functions, SQL_STRING_FUNCS),
        "window_percentiles": (q_window_percentiles, SQL_WINDOW_PCT),
        "histogram_totalprice": (
            q_histogram_totalprice,
            SQL_HISTOGRAM.format(
                R_MIN=R("MIN(o_totalprice)"), R_MAX=R("MAX(o_totalprice)")
            ),
        ),
    }
