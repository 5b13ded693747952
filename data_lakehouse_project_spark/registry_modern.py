"""Modern SQL surface, batch 4: recursive CTEs, VARIANT semi-structured
values, GROUP BY ALL / ORDER BY ALL, try_* safe arithmetic, approximate
percentiles.

These are the Spark 3.4–4.x SQL-surface features a user migrating from
the reference's hand-rolled job scripts gains for free from the engine
being a thin layer over Spark SQL. Where the feature exists verbatim in
DuckDB (recursive CTE, GROUP BY ALL), the oracle runs the IDENTICAL SQL
string — the strongest form of ANSI parity the driver can check.

Parity notes:
- The recursive ladder is integer-only (month indexes, not DATE +
  INTERVAL): Spark's date+interval yields DATE while DuckDB's yields
  TIMESTAMP, so interval arithmetic inside a shared SQL string would
  diverge; integer arithmetic is identical.
- ``try_divide(a, b)`` ≡ ``a / NULLIF(b, 0)`` — DuckDB has no try_*
  family, so the oracle spells the NULL-on-zero contract explicitly.
- VARIANT extraction oracles through DuckDB's JSON operators (the
  testdata's ``events.props`` is single-key JSON).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_lakehouse_project_spark.sources.readers import load_testdata

_helpers: dict = {}


def _rn(col, n):
    if "_rn" not in _helpers:
        from data_lakehouse_project_spark import registry  # noqa: F401
    return _helpers["_rn"](col, n)


def _t(spark, sf_dir, *names):
    tables = load_testdata(spark, sf_dir, names=names)
    return [tables[n] for n in names]


def _sql(spark, sf_dir, query):
    load_testdata(spark, sf_dir, register_views=True)
    return spark.sql(query)


# --- recursive CTE (identical SQL on both engines) -------------------------

# month-index ladder (0 .. 79 covers the testdata's 1995-01..2001-08
# order range) LEFT JOINed to per-month order counts: the recursive
# anchor/step shape plus a demonstration that missing months survive
SQL_RECURSIVE_MONTHS = """
WITH RECURSIVE months(m) AS (
  SELECT 0
  UNION ALL
  SELECT m + 1 FROM months WHERE m < 79
),
monthly AS (
  SELECT (EXTRACT(year FROM o_orderdate) - 1995) * 12
         + EXTRACT(month FROM o_orderdate) - 1 AS m,
         COUNT(*) AS n_orders
  FROM orders
  GROUP BY 1
)
SELECT months.m AS month_index, COALESCE(n_orders, 0) AS n_orders
FROM months LEFT JOIN monthly ON months.m = monthly.m
"""


def q_recursive_cte_sql(spark, sf_dir):
    """WITH RECURSIVE through spark.sql — the exact string the oracle
    runs. Spark 4 evaluates the recursion as an iterative union plan."""
    return _sql(spark, sf_dir, SQL_RECURSIVE_MONTHS)


# --- VARIANT ---------------------------------------------------------------

def q_events_variant_extract(spark, sf_dir):
    """Semi-structured pipeline on the VARIANT type (Spark 4): parse the
    JSON props column once, extract a typed path, round-trip to
    canonical JSON text. VARIANT keeps the parsed form in a binary
    encoding, so repeated path extraction doesn't re-parse the string."""
    (events,) = _t(spark, sf_dir, "events")
    v = F.parse_json(F.col("props"))
    return events.select(
        "event_id",
        F.variant_get(v, "$.k", "bigint").alias("k_val"),
        F.to_json(v).alias("props_canonical"),
    )


SQL_VARIANT = """
SELECT event_id,
       CAST(props ->> 'k' AS BIGINT) AS k_val,
       CAST(json(props) AS VARCHAR) AS props_canonical
FROM events
"""


# --- GROUP BY ALL / ORDER BY ALL (identical SQL) ---------------------------

SQL_GROUP_BY_ALL = """
SELECT o_orderstatus, o_orderpriority,
       COUNT(*) AS n_orders,
       {R_TOT} AS total_price
FROM orders
GROUP BY ALL
ORDER BY ALL
"""


def q_group_by_all_sql(spark, sf_dir):
    """GROUP BY ALL + ORDER BY ALL through spark.sql — same string as
    the oracle (grouping keys inferred from the non-aggregate columns)."""
    return _sql(spark, sf_dir, _helpers["SQL_GROUP_BY_ALL_FMT"])


# --- try_* safe arithmetic -------------------------------------------------

def q_try_arithmetic(spark, sf_dir):
    """try_divide / try_add: NULL instead of error/Inf on bad input.
    The divisor floor(l_discount*10+0.5) is 0 for zero-discount rows,
    so the NULL-on-zero path is exercised on real data."""
    (lineitem,) = _t(spark, sf_dir, "lineitem")
    divisor = F.floor(F.col("l_discount") * 10 + F.lit(0.5))
    return lineitem.select(
        "l_orderkey",
        "l_linenumber",
        _rn(F.try_divide(F.col("l_extendedprice"), divisor), 4).alias(
            "price_per_decidiscount"
        ),
        _rn(F.try_add(F.col("l_quantity"), F.col("l_tax")), 4).alias(
            "qty_plus_tax"
        ),
    )


SQL_TRY_ARITH = """
SELECT l_orderkey, l_linenumber,
       {R_DIV} AS price_per_decidiscount,
       {R_ADD} AS qty_plus_tax
FROM lineitem
"""


# --- Python UDTF (lateral table function) ----------------------------------

def q_text_udtf_bigrams(spark, sf_dir):
    """Positional bigrams via a Python UDTF in a LATERAL join — the
    row→rows extension point. Deliberately the Python twin of the
    JVM-side ``text_top_bigrams``: the oracle hash-checks the generator
    against a pure-SQL lateral; plan-audit exempts it as the one
    sanctioned row-at-a-time Python site (API coverage, not hot path)."""
    from data_lakehouse_project_spark.functions.scalar import normalize_text
    from data_lakehouse_project_spark.functions.table_functions import (
        register_table_functions,
    )

    (documents,) = _t(spark, sf_dir, "documents")
    register_table_functions(spark)
    documents.select(
        "doc_id", normalize_text(F.col("text")).alias("text_norm")
    ).createOrReplaceTempView("_docs_norm")
    return spark.sql(
        "SELECT doc_id, ngram, pos FROM _docs_norm, LATERAL ngrams(text_norm, 2)"
    )


SQL_UDTF_BIGRAMS = """
SELECT doc_id,
       toks[i] || ' ' || toks[i + 1] AS ngram,
       CAST(i - 1 AS INT) AS pos
FROM (SELECT doc_id, {TOKS} AS toks FROM documents),
     LATERAL unnest(generate_series(1, len(toks) - 1)) AS u(i)
"""


# --- benchmark contamination (LLM decontamination primitive) ---------------

def q_contamination_report(spark, sf_dir):
    """Word-4-gram collisions between the training split (all sources
    but one) and a held-out benchmark source — the decontamination
    report every LLM data pipeline runs before training. Benchmark-side
    grams broadcast (eval suites are tiny vs a 100 TB corpus), so the
    check is a map-side join over the train scan."""
    from data_lakehouse_project_spark.ext.dedup import ngram_contamination

    (documents,) = _t(spark, sf_dir, "documents")
    train = documents.where(F.col("source") != "src19")
    bench = documents.where(F.col("source") == "src19")
    return ngram_contamination(train, bench, n=4)


SQL_CONTAMINATION = """
WITH toks AS (SELECT doc_id, source, {TOKS} AS t FROM documents),
grams AS (
  SELECT DISTINCT doc_id, source,
         list_aggregate(t[i:i + 3], 'string_agg', ' ') AS g
  FROM toks, LATERAL unnest(generate_series(1, len(t) - 3)) AS u(i)
)
SELECT a.doc_id,
       COUNT(DISTINCT a.g) AS shared_grams,
       COUNT(DISTINCT b.doc_id) AS bench_docs
FROM grams a
JOIN grams b ON a.g = b.g
WHERE a.source <> 'src19' AND b.source = 'src19'
GROUP BY a.doc_id
"""


# --- approximate percentile (rows-only: sketch-based) ----------------------

def q_agg_approx_percentile(spark, sf_dir):
    """approx_percentile via the built-in quantile sketch — one pass, no
    global sort, mergeable across partitions (the 100 TB path where
    exact percentile_cont's total sort is unaffordable). Accuracy vs
    the exact percentile is asserted in tests; the driver records a
    rows-only check (sketch results are not bit-identical to DuckDB)."""
    (lineitem,) = _t(spark, sf_dir, "lineitem")
    return lineitem.groupBy("l_returnflag").agg(
        F.approx_percentile("l_extendedprice", F.lit(0.5), F.lit(10000)).alias(
            "p50_approx"
        ),
        F.approx_percentile("l_extendedprice", F.lit(0.95), F.lit(10000)).alias(
            "p95_approx"
        ),
    )


# --- SQL pipe syntax (Spark 4) + parameterized SQL -------------------------

# the same logical query three ways: Spark runs the PIPE form and a
# named-parameter form; DuckDB oracles the equivalent ANSI text. Shape:
# filtered scan → per-status aggregate → projection → order.
SQL_PIPE_SPARK = """
FROM orders
|> WHERE o_totalprice > :minprice
|> AGGREGATE COUNT(*) AS n, SUM(o_totalprice) AS total
   GROUP BY o_orderstatus
|> SELECT o_orderstatus, n, {R_TOT} AS total
|> ORDER BY o_orderstatus
"""

SQL_PIPE_ORACLE = """
SELECT o_orderstatus, COUNT(*) AS n, {R_TOT} AS total
FROM orders
WHERE o_totalprice > 50000.0
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


def q_pipe_syntax_orders(spark, sf_dir):
    """Spark 4 SQL PIPE syntax (`|>` chained relational steps) PLUS
    named-parameter binding (`:minprice` via spark.sql args) — the
    modern composable-SQL surface; the oracle proves the pipe program ≡
    the ANSI form. Same plan shape as any filtered agg: pushed filter,
    partial/final HashAggregate."""
    load_testdata(spark, sf_dir, register_views=True)
    return spark.sql(
        _helpers["SQL_PIPE_SPARK_FMT"], args={"minprice": 50000.0}
    )


def build(helpers: dict) -> dict:
    _helpers.update(helpers)
    R = helpers["R"]
    gball = SQL_GROUP_BY_ALL.format(R_TOT=R("SUM(o_totalprice)"))
    _helpers["SQL_GROUP_BY_ALL_FMT"] = gball
    _helpers["SQL_PIPE_SPARK_FMT"] = SQL_PIPE_SPARK.format(
        R_TOT=R("total", 2)
    )
    return {
        "pipe_syntax_orders": (
            q_pipe_syntax_orders,
            SQL_PIPE_ORACLE.format(R_TOT=R("SUM(o_totalprice)", 2)),
        ),
        "recursive_cte_sql": (q_recursive_cte_sql, SQL_RECURSIVE_MONTHS),
        "events_variant_extract": (q_events_variant_extract, SQL_VARIANT),
        "group_by_all_sql": (q_group_by_all_sql, gball),
        "try_arithmetic": (
            q_try_arithmetic,
            SQL_TRY_ARITH.format(
                R_DIV=R(
                    "l_extendedprice / NULLIF(FLOOR(l_discount * 10 + 0.5), 0)",
                    4,
                ),
                R_ADD=R("l_quantity + l_tax", 4),
            ),
        ),
        "agg_approx_percentile": (q_agg_approx_percentile, None),
        "text_udtf_bigrams": (
            q_text_udtf_bigrams,
            SQL_UDTF_BIGRAMS.format(TOKS=helpers["TOKS"]),
        ),
        "contamination_report": (
            q_contamination_report,
            SQL_CONTAMINATION.format(TOKS=helpers["TOKS"]),
        ),
    }
