"""Classic decision-support shapes, batch 2 (TPC-H Q2/Q5/Q8/Q9/Q14/Q15/
Q18/Q19/Q22 adaptations) + array higher-order-function and extended
string surfaces.

The reference repo contains no joins or subqueries at all (SURVEY §2.9;
verified over all of ``spark/jobs/``), so none of these are ports — they
are the engine-design query surface the star-schema testdata exists to
exercise, adapted to the slim testdata columns (no partsupp table, no
l_receiptdate / p_container).

Scale notes (local[32] tests, 1000-executor design):

- Q5/Q8/Q9 shapes: only the genuinely-small dimensions (region, nation,
  supplier) are explicitly broadcast; customer joins shuffle on the key
  so the plan survives a customer table that is itself fact-sized at
  100 TB. Date/type filters sit directly on the scans so Catalyst pushes
  them into the Parquet readers before any join.
- Q15/Q18 shapes: aggregate FIRST, then join the (much smaller) winner
  set back to the dimension tables — the join input is |suppliers| or
  |qualifying orders| rows, never raw lineitem.
- Q22 shape: the scalar average is attached via a broadcast cross-join
  of a 1-row aggregate, not a driver-side ``collect()`` — the whole
  query stays one distributed plan.
- Q19 shape: the disjunction spans both tables, so it cannot be fully
  pushed; Spark still pushes the extracted per-table IN/range residuals
  into both scans and evaluates the cross-table OR post-join.

Determinism rules are shared with registry.py: every aggregated double
is floor-rounded identically on both engines (``_rn`` / ``R``); ratio
outputs round at 6 digits (same tolerance as corr/covar, which verified
clean at both SFs).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from data_lakehouse_project_spark.functions.scalar import normalize_text
from data_lakehouse_project_spark.sources.readers import load_testdata

# populated by registry.py via build() (same pattern as registry_dss)
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


def _rev():
    # built lazily: Column construction needs an active SparkContext
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


_REV_SQL = "l_extendedprice * (1 - l_discount)"


# --- Q5 shape: local-supplier volume --------------------------------------

def q_local_supplier_volume(spark, sf_dir):
    """TPC-H Q5: revenue by nation where the supplier is in the SAME
    nation as the ordering customer, restricted to one region and one
    order-date year.

    The c_nationkey = s_nationkey constraint rides inside the supplier
    join condition, so it is evaluated during the (broadcast) join
    rather than as a post-join filter over the full row explosion.
    """
    lineitem, orders, customer, supplier, nation, region = _t(
        spark, sf_dir, "lineitem", "orders", "customer", "supplier", "nation", "region"
    )
    asia = region.where(F.col("r_name") == "ASIA")
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .where(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(supplier),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(asia), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(_r2(F.sum(_rev())).alias("revenue"))
    )


SQL_LOCAL_SUPPLIER = """
SELECT n_name, {R_REV} AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name
"""


# --- Q8 shape: market share -----------------------------------------------

def q_market_share(spark, sf_dir):
    """TPC-H Q8: NATION_12's share of PROMO-part revenue sold into the
    ASIA customer market, per order year.

    nation joins twice under different roles (customer's nation for the
    region filter, supplier's nation for the share flag) — the classic
    double-dimension-role pattern.
    """
    lineitem, orders, customer, supplier, nation, region, part = _t(
        spark, sf_dir,
        "lineitem", "orders", "customer", "supplier", "nation", "region", "part",
    )
    asia = region.where(F.col("r_name") == "ASIA")
    cust_nation = nation.select(
        F.col("n_nationkey").alias("cn_nationkey"),
        F.col("n_regionkey").alias("cn_regionkey"),
    )
    supp_nation = nation.select(
        F.col("n_nationkey").alias("sn_nationkey"),
        F.col("n_name").alias("supp_nation"),
    )
    promo_parts = part.where(F.col("p_type") == "PROMO").select("p_partkey")
    joined = (
        lineitem.join(F.broadcast(promo_parts), F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(cust_nation), F.col("c_nationkey") == F.col("cn_nationkey"))
        .join(F.broadcast(asia), F.col("cn_regionkey") == F.col("r_regionkey"))
        .join(F.broadcast(supp_nation), F.col("s_nationkey") == F.col("sn_nationkey"))
    )
    return (
        joined.select(
            F.year("o_orderdate").alias("o_year"),
            _rev().alias("volume"),
            F.col("supp_nation"),
        )
        .groupBy("o_year")
        .agg(
            _rn(
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_12", F.col("volume")).otherwise(
                        F.lit(0.0)
                    )
                )
                / F.sum("volume"),
                6,
            ).alias("mkt_share")
        )
    )


SQL_MARKET_SHARE = """
SELECT o_year, {R_SHARE} AS mkt_share
FROM (
  SELECT EXTRACT(year FROM o_orderdate) AS o_year,
         l_extendedprice * (1 - l_discount) AS volume,
         n2.n_name AS supp_nation
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region ON n1.n_regionkey = r_regionkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'ASIA' AND p_type = 'PROMO'
) all_nations
GROUP BY o_year
"""


# --- Q9 shape: product-line profit by supplier nation × year ---------------

def q_supplier_nation_profit(spark, sf_dir):
    """TPC-H Q9 (no partsupp in testdata, so profit = discounted
    revenue): widget-part revenue grouped by the supplier's nation and
    the order year."""
    lineitem, orders, supplier, nation, part = _t(
        spark, sf_dir, "lineitem", "orders", "supplier", "nation", "part"
    )
    widget_parts = part.where(F.col("p_name").like("%widget%")).select("p_partkey")
    # sum over decimal-cast terms: exact, order-independent accumulation —
    # a plain double sum differs between engines by addition order on
    # exactly-boundary groups (observed: one cent on one group at sf0.01)
    term = _rev().cast("decimal(18,6)")
    return (
        lineitem.join(F.broadcast(widget_parts), F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(_r2(F.sum(term).cast("double")).alias("sum_profit"))
    )


SQL_NATION_PROFIT = """
SELECT n_name AS nation,
       EXTRACT(year FROM o_orderdate) AS o_year,
       {R_DEC} AS sum_profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_name LIKE '%widget%'
GROUP BY n_name, EXTRACT(year FROM o_orderdate)
"""


# --- Q14 shape: promo revenue ratio ---------------------------------------

def q_promo_revenue_ratio(spark, sf_dir):
    """TPC-H Q14: percentage of revenue from PROMO-type parts, per
    ship month of 1996."""
    lineitem, part = _t(spark, sf_dir, "lineitem", "part")
    part_types = part.select("p_partkey", "p_type")
    return (
        lineitem.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(F.broadcast(part_types), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.date_format("l_shipdate", "yyyy-MM").alias("ship_month"))
        .agg(
            _rn(
                F.lit(100.0)
                * F.sum(
                    F.when(F.col("p_type") == "PROMO", _rev()).otherwise(F.lit(0.0))
                )
                / F.sum(_rev()),
                6,
            ).alias("promo_revenue_pct")
        )
    )


SQL_PROMO_RATIO = """
SELECT strftime(l_shipdate, '%Y-%m') AS ship_month, {R_PCT} AS promo_revenue_pct
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY strftime(l_shipdate, '%Y-%m')
"""


# --- Q15 shape: top supplier (agg → scalar max → join back) ----------------

def q_supplier_value_concentration(spark, sf_dir):
    """TPC-H Q11 shape (testdata carries no partsupp, so value =
    shipped revenue per supplier): GROUP BY supplier HAVING SUM(rev) >
    global_sum * fraction — the decorrelated uncorrelated-scalar
    HAVING. The global threshold is a 1-row broadcast scalar
    (crossJoin, O(n) BNLJ); both sides are rounded to cents before the
    compare so the cut resolves identically on both engines."""
    lineitem, supplier = _t(spark, sf_dir, "lineitem", "supplier")
    per_supp = lineitem.groupBy("l_suppkey").agg(
        _r2(F.sum(_rev())).alias("supp_revenue")
    )
    total = per_supp.agg(
        _r2(F.sum("supp_revenue") * F.lit(0.011)).alias("threshold")
    )
    return (
        per_supp.crossJoin(F.broadcast(total))
        .where(F.col("supp_revenue") > F.col("threshold"))
        .join(
            F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey")
        )
        .select("s_suppkey", "s_name", "supp_revenue")
    )


SQL_VALUE_CONCENTRATION = """
WITH ps AS (
  SELECT l_suppkey, {R_REV} AS supp_revenue
  FROM lineitem GROUP BY l_suppkey),
t AS (SELECT {R_THR} AS threshold FROM ps)
SELECT s_suppkey, s_name, supp_revenue
FROM ps
CROSS JOIN t
JOIN supplier ON s_suppkey = l_suppkey
WHERE supp_revenue > threshold
"""


def q_top_supplier_revenue(spark, sf_dir):
    """TPC-H Q15: supplier(s) with the maximum shipped revenue in
    1996Q1. Revenue is rounded to cents BEFORE the max comparison so
    ties resolve identically on both engines."""
    lineitem, supplier = _t(spark, sf_dir, "lineitem", "supplier")
    revenue = (
        lineitem.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(_r2(F.sum(_rev())).alias("total_revenue"))
    )
    # unpartitioned max over the tiny post-agg set (|suppliers| rows)
    w = Window.partitionBy()
    return (
        revenue.withColumn("max_rev", F.max("total_revenue").over(w))
        .where(F.col("total_revenue") == F.col("max_rev"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


SQL_TOP_SUPPLIER = """
WITH revenue AS (
  SELECT l_suppkey, {R_REV} AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = l_suppkey
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
"""


# --- Q18 shape: large-order customers (HAVING → join back) -----------------

def q_large_order_customers(spark, sf_dir):
    """TPC-H Q18: orders whose total quantity exceeds 250, joined back
    to orders + customer. The HAVING filter runs on the aggregate
    BEFORE any join, so the join input is only the qualifying keys."""
    lineitem, orders, customer = _t(spark, sf_dir, "lineitem", "orders", "customer")
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(_r2(F.sum("l_quantity")).alias("total_qty"))
        .where(F.col("total_qty") > 250.0)
    )
    return (
        big.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("o_orderdate"),
            "o_totalprice",
            "total_qty",
        )
    )


SQL_LARGE_ORDERS = """
SELECT c_name, c_custkey, o_orderkey,
       CAST(o_orderdate AS DATE) AS o_orderdate, o_totalprice, total_qty
FROM (
  SELECT l_orderkey, {R_QTY} AS total_qty
  FROM lineitem GROUP BY l_orderkey
) big
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE total_qty > 250.0
"""


# --- Q19 shape: disjunctive multi-band predicate ---------------------------

def q_disjunctive_filter_revenue(spark, sf_dir):
    """TPC-H Q19: OR-of-ANDs predicate spanning both join sides (brand ×
    size × quantity bands). Catalyst extracts the per-table residuals of
    the disjunction into the scans; the cross-table OR evaluates after
    the broadcast join."""
    lineitem, part = _t(spark, sf_dir, "lineitem", "part")
    j = lineitem.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    band = (
        (
            (F.col("p_brand") == "Brand#11")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#15")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#19")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return j.where(band).agg(_r2(F.sum(_rev())).alias("revenue"))


SQL_DISJUNCTIVE = """
SELECT {R_REV} AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 25
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#19' AND p_size BETWEEN 1 AND 35
       AND l_quantity BETWEEN 20 AND 30)
"""


# --- Q22 shape: above-average balances with no orders ----------------------

def q_waiting_customers(spark, sf_dir):
    """TPC-H Q22: customers whose balance exceeds the positive-balance
    average and who have placed no order since 2000, grouped by nation
    (the testdata's order history is dense enough that "never ordered"
    is empty; "inactive since" keeps the shape non-trivial). The scalar
    average attaches via a broadcast cross-join of a 1-row aggregate
    (no driver collect); the no-recent-orders condition is a left-anti
    join whose date filter pushes into the orders scan."""
    customer, orders = _t(spark, sf_dir, "customer", "orders")
    recent = orders.where(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    avg_bal = customer.where(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    return (
        customer.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            _r2(F.sum("c_acctbal")).alias("totacctbal"),
        )
    )


SQL_WAITING_CUSTOMERS = """
SELECT c_nationkey, COUNT(*) AS numcust, {R_BAL} AS totacctbal
FROM customer
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY c_nationkey
"""


# --- Q2 shape: min-per-group join-back -------------------------------------

def q_min_price_part_per_brand(spark, sf_dir):
    """TPC-H Q2 shape (correlated min subquery): parts priced at their
    brand's minimum retail price. Aggregate-then-broadcast-join replaces
    the per-row correlated rescan; equality compares raw stored doubles
    (no arithmetic), so both engines agree exactly."""
    (part,) = _t(spark, sf_dir, "part")
    min_price = part.groupBy(F.col("p_brand").alias("mb_brand")).agg(
        F.min("p_retailprice").alias("min_price")
    )
    return (
        part.join(
            F.broadcast(min_price),
            (F.col("p_brand") == F.col("mb_brand"))
            & (F.col("p_retailprice") == F.col("min_price")),
        )
        .select("p_brand", "p_partkey", "p_name", "p_retailprice")
    )


SQL_MIN_PRICE_PART = """
SELECT p_brand, p_partkey, p_name, p_retailprice
FROM part
WHERE p_retailprice = (
  SELECT min(p_retailprice) FROM part p2 WHERE p2.p_brand = part.p_brand
)
"""


# --- Array higher-order functions (documents tokens) -----------------------

def q_array_hof_surface(spark, sf_dir):
    """transform / filter / exists / aggregate / slice over token arrays
    — the Spark HOFs stay JVM-side (no Python in the loop); DuckDB's
    list_* lambda family is the oracle."""
    (documents,) = _t(spark, sf_dir, "documents")
    toks = F.split(normalize_text(F.col("text")), " ")
    return documents.select(
        "doc_id",
        F.size(F.filter(toks, lambda t: F.length(t) > 5)).cast("long").alias(
            "long_tokens"
        ),
        F.aggregate(
            toks, F.lit(0), lambda acc, t: acc + F.length(t)
        ).cast("long").alias("total_token_chars"),
        F.exists(toks, lambda t: t == F.lit("data")).alias("has_data"),
        # joined to a scalar string — driver canonicalizer can't hash lists
        F.array_join(
            F.transform(F.slice(toks, 1, 3), lambda t: F.upper(t)), ","
        ).alias("first3_upper"),
    )


SQL_ARRAY_HOF = """
SELECT doc_id,
       CAST(len(list_filter({TOKS}, t -> length(t) > 5)) AS BIGINT) AS long_tokens,
       CAST(list_sum(list_transform({TOKS}, t -> length(t))) AS BIGINT)
         AS total_token_chars,
       list_contains({TOKS}, 'data') AS has_data,
       array_to_string(list_transform(({TOKS})[1:3], t -> upper(t)), ',')
         AS first3_upper
FROM documents
"""


# --- Extended string surface 2 ---------------------------------------------

def q_string_surface2(spark, sf_dir):
    """split_part / lpad / translate / reverse / left / right / locate /
    levenshtein / md5 / sha256 — hash functions double as the content-
    fingerprinting primitives of the dedup family."""
    (customer,) = _t(spark, sf_dir, "customer")
    return customer.select(
        "c_custkey",
        F.split_part(F.col("c_name"), F.lit("#"), F.lit(2)).alias("cust_num"),
        F.lpad(F.col("c_custkey").cast("string"), 12, "0").alias("padded_key"),
        F.translate(F.col("c_mktsegment"), "AEIOU", "aeiou").alias("deVoweled"),
        F.reverse(F.col("c_name")).alias("rev_name"),
        F.expr("left(c_name, 8)").alias("left8"),
        F.expr("right(c_name, 4)").alias("right4"),
        F.locate("0", F.col("c_name")).cast("long").alias("zero_pos"),
        F.levenshtein(F.col("c_mktsegment"), F.lit("BUILDING")).cast("long").alias(
            "lev_building"
        ),
        F.md5(F.col("c_name")).alias("name_md5"),
        F.sha2(F.col("c_name"), 256).alias("name_sha256"),
    )


SQL_STRING2 = """
SELECT c_custkey,
       split_part(c_name, '#', 2) AS cust_num,
       lpad(CAST(c_custkey AS VARCHAR), 12, '0') AS padded_key,
       translate(c_mktsegment, 'AEIOU', 'aeiou') AS "deVoweled",
       reverse(c_name) AS rev_name,
       left(c_name, 8) AS left8,
       right(c_name, 4) AS right4,
       CAST(strpos(c_name, '0') AS BIGINT) AS zero_pos,
       CAST(levenshtein(c_mktsegment, 'BUILDING') AS BIGINT) AS lev_building,
       md5(c_name) AS name_md5,
       sha256(c_name) AS name_sha256
FROM customer
"""


# --- IGNORE NULLS window fill ----------------------------------------------

def q_window_ignore_nulls(spark, sf_dir):
    """first_value/last_value with IGNORE NULLS: forward-fill a
    sparsely-null measure within each order — the window analogue of
    the time-series gap fill in streaming/events.py."""
    (lineitem,) = _t(spark, sf_dir, "lineitem")
    maybe = F.when(F.col("l_discount") > 0.05, F.lit(None)).otherwise(
        F.col("l_extendedprice")
    )
    # (l_orderkey, l_linenumber) is NOT unique in the synthetic testdata,
    # so the fill order needs value tiebreakers to be a total order —
    # otherwise the two engines visit ties differently and diverge
    w = Window.partitionBy("l_orderkey").orderBy(
        "l_linenumber", "l_extendedprice", "l_partkey", "l_suppkey", "l_discount"
    )
    return lineitem.select(
        "l_orderkey",
        "l_linenumber",
        maybe.alias("maybe_price"),
        F.last(maybe, ignorenulls=True)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("filled_price"),
        F.first(maybe, ignorenulls=True)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
        .alias("first_nonnull"),
    )


SQL_IGNORE_NULLS = """
SELECT l_orderkey, l_linenumber,
       CASE WHEN l_discount > 0.05 THEN NULL ELSE l_extendedprice END
         AS maybe_price,
       last_value(CASE WHEN l_discount > 0.05 THEN NULL ELSE l_extendedprice END
                  IGNORE NULLS)
         OVER (PARTITION BY l_orderkey
               ORDER BY l_linenumber, l_extendedprice, l_partkey,
                        l_suppkey, l_discount
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         AS filled_price,
       first_value(CASE WHEN l_discount > 0.05 THEN NULL ELSE l_extendedprice END
                   IGNORE NULLS)
         OVER (PARTITION BY l_orderkey
               ORDER BY l_linenumber, l_extendedprice, l_partkey,
                        l_suppkey, l_discount
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
         AS first_nonnull
FROM lineitem
"""


# --- Q16 shape: distinct-supplier counts with NOT IN exclusion -------------

def q_supplier_part_counts(spark, sf_dir):
    """TPC-H Q16: distinct suppliers per (brand, type, size) for selected
    sizes, excluding one brand and any supplier with a negative balance
    (NOT IN → left-anti join on the non-null key)."""
    lineitem, part, supplier = _t(spark, sf_dir, "lineitem", "part", "supplier")
    sel_parts = part.where(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    bad_suppliers = supplier.where(F.col("s_acctbal") < 0.0).select("s_suppkey")
    return (
        lineitem.join(
            F.broadcast(bad_suppliers),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .join(F.broadcast(sel_parts), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


SQL_SUPPLIER_PART_COUNTS = """
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1'
  AND p_size IN (1, 4, 9, 16, 25, 36, 49)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
GROUP BY p_brand, p_type, p_size
"""


# --- Q20 shape: per-group share-of-total (correlated agg in HAVING) --------

def q_dominant_part_suppliers(spark, sf_dir):
    """TPC-H Q20 shape: suppliers who shipped more than TWICE their fair
    share (2 × total/n_suppliers) of some widget part. The correlated
    scalar aggregate in HAVING decorrelates to a join of two
    aggregations on l_partkey — per-(supplier, part) quantity vs
    per-part total + supplier count — with the widget filter applied
    FIRST through a broadcast semi-join so both aggregations only see
    the selected parts' rows. The fair-share threshold is scale-free
    (an absolute share constant would go empty as supplier count grows);
    both engines evaluate the identical double expression, so the
    comparison is deterministic."""
    lineitem, part, supplier = _t(spark, sf_dir, "lineitem", "part", "supplier")
    widget = part.where(F.col("p_name").like("%widget%")).select("p_partkey")
    li = lineitem.join(
        F.broadcast(widget), F.col("l_partkey") == F.col("p_partkey")
    ).select("l_partkey", "l_suppkey", "l_quantity")
    from pyspark.sql.window import Window

    per_sp = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum("l_quantity").alias("sp_qty")
    )
    # part totals as an unordered window over the finer aggregate — ONE
    # lineitem scan and no self-join (Spark does not dedupe the two
    # identical per_sp subtrees a join formulation produces), and the
    # countDistinct collapses to count(*) because per_sp is already
    # distinct at (part, supplier) grain
    w = Window.partitionBy("l_partkey")
    dominant = (
        per_sp.withColumn("pt_qty", F.sum("sp_qty").over(w))
        .withColumn("n_supp", F.count(F.lit(1)).over(w))
        .where(F.col("sp_qty") > 2.0 * F.col("pt_qty") / F.col("n_supp"))
        .select("l_suppkey")
        .distinct()
    )
    return dominant.join(
        F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey")
    ).select("s_suppkey", "s_name")


SQL_DOMINANT_SUPPLIERS = """
WITH li AS (
  SELECT l_partkey, l_suppkey, l_quantity
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_name LIKE '%widget%'
), per_sp AS (
  SELECT l_partkey, l_suppkey, SUM(l_quantity) AS sp_qty
  FROM li GROUP BY l_partkey, l_suppkey
), per_part AS (
  SELECT l_partkey, SUM(l_quantity) AS pt_qty,
         COUNT(DISTINCT l_suppkey) AS n_supp
  FROM li GROUP BY l_partkey
)
SELECT s_suppkey, s_name
FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey FROM per_sp JOIN per_part USING (l_partkey)
  WHERE sp_qty > 2.0 * pt_qty / n_supp
)
"""


# --- Q21 shape: sole late supplier in multi-supplier orders ----------------

def q_sole_late_supplier(spark, sf_dir):
    """TPC-H Q21 shape: per supplier, the number of multi-supplier orders
    where THEY were the only supplier shipping >60 days after the order
    date. Two aggregation grains (order×supplier flags, then per-order
    rollup) joined back — the decorrelated form of Q21's double
    EXISTS/NOT EXISTS."""
    lineitem, orders = _t(spark, sf_dir, "lineitem", "orders")
    from pyspark.sql.window import Window

    flags = (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.max(
                F.when(
                    F.col("l_shipdate")
                    > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"),
                    1,
                ).otherwise(0)
            ).alias("is_late")
        )
    )
    # per-order rollup as an unordered window over the flags instead of a
    # second aggregate joined back: one exchange on l_orderkey replaces
    # an aggregate exchange PLUS a join re-exchange
    w = Window.partitionBy("l_orderkey")
    return (
        flags.withColumn("n_supp", F.count(F.lit(1)).over(w))
        .withColumn("n_late", F.sum("is_late").over(w))
        .where(
            (F.col("n_supp") >= 2)
            & (F.col("n_late") == 1)
            & (F.col("is_late") == 1)
        )
        .groupBy(F.col("l_suppkey").alias("s_suppkey"))
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


SQL_SOLE_LATE = """
WITH flags AS (
  SELECT l_orderkey, l_suppkey,
         MAX(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                  THEN 1 ELSE 0 END) AS is_late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY l_orderkey, l_suppkey
), per_order AS (
  SELECT l_orderkey, COUNT(*) AS n_supp, SUM(is_late) AS n_late
  FROM flags GROUP BY l_orderkey
)
SELECT f.l_suppkey AS s_suppkey, COUNT(*) AS numwait
FROM flags f JOIN per_order p ON f.l_orderkey = p.l_orderkey
WHERE p.n_supp >= 2 AND p.n_late = 1 AND f.is_late = 1
GROUP BY f.l_suppkey
"""


def build(helpers: dict) -> dict:
    """Wire query + oracle pairs; called by registry.py after its own
    helpers exist (mirrors registry_dss.build)."""
    _helpers.update(helpers)
    R = helpers["R"]
    TOKS = helpers["TOKS"]
    return {
        "local_supplier_volume": (
            q_local_supplier_volume,
            SQL_LOCAL_SUPPLIER.format(R_REV=R(f"SUM({_REV_SQL})")),
        ),
        "market_share": (
            q_market_share,
            SQL_MARKET_SHARE.format(
                R_SHARE=R(
                    "SUM(CASE WHEN supp_nation = 'NATION_12' THEN volume"
                    " ELSE 0.0 END) / SUM(volume)",
                    6,
                )
            ),
        ),
        "supplier_nation_profit": (
            q_supplier_nation_profit,
            SQL_NATION_PROFIT.format(
                R_DEC=R(
                    "CAST(SUM(CAST(l_extendedprice * (1 - l_discount)"
                    " AS DECIMAL(18,6))) AS DOUBLE)"
                )
            ),
        ),
        "promo_revenue_ratio": (
            q_promo_revenue_ratio,
            SQL_PROMO_RATIO.format(
                R_PCT=R(
                    "100.0 * SUM(CASE WHEN p_type = 'PROMO' THEN"
                    f" {_REV_SQL} ELSE 0.0 END) / SUM({_REV_SQL})",
                    6,
                )
            ),
        ),
        "top_supplier_revenue": (
            q_top_supplier_revenue,
            SQL_TOP_SUPPLIER.format(R_REV=R(f"SUM({_REV_SQL})")),
        ),
        "supplier_value_concentration": (
            q_supplier_value_concentration,
            SQL_VALUE_CONCENTRATION.format(
                R_REV=R(f"SUM({_REV_SQL})"),
                R_THR=R("SUM(supp_revenue) * 0.011"),
            ),
        ),
        "large_order_customers": (
            q_large_order_customers,
            SQL_LARGE_ORDERS.format(R_QTY=R("SUM(l_quantity)")),
        ),
        "disjunctive_filter_revenue": (
            q_disjunctive_filter_revenue,
            SQL_DISJUNCTIVE.format(R_REV=R(f"SUM({_REV_SQL})")),
        ),
        "waiting_customers": (
            q_waiting_customers,
            SQL_WAITING_CUSTOMERS.format(R_BAL=R("SUM(c_acctbal)")),
        ),
        "min_price_part_per_brand": (q_min_price_part_per_brand, SQL_MIN_PRICE_PART),
        "supplier_part_counts": (q_supplier_part_counts, SQL_SUPPLIER_PART_COUNTS),
        "dominant_part_suppliers": (q_dominant_part_suppliers, SQL_DOMINANT_SUPPLIERS),
        "sole_late_supplier": (q_sole_late_supplier, SQL_SOLE_LATE),
        "array_hof_surface": (q_array_hof_surface, SQL_ARRAY_HOF.format(TOKS=TOKS)),
        "string_surface2": (q_string_surface2, SQL_STRING2),
        "window_ignore_nulls": (q_window_ignore_nulls, SQL_IGNORE_NULLS),
    }
