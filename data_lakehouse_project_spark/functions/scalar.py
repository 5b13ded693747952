"""Scalar function surface — SURVEY §2.4 (F1-F5) plus the engine's own
normalization helpers.

The reference uses exactly: lower (``silver_transformation.py:53``),
to_date (``mysql_gold_aggregation.py:119``), to_timestamp
(``api_silver_transformation.py:33``), date_format 'yyyy-MM'
(``api_gold_aggregation.py:87``), and imports year/month without calling
them (``api_gold_aggregation.py:6``). All map 1:1 to ``pyspark.sql.
functions`` — JVM-side, codegen-friendly, never Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# name -> builtin, the reference's full scalar surface (SURVEY §2.4)
SCALAR_FUNCTIONS = {
    "lower": F.lower,  # F1
    "to_date": F.to_date,  # F2
    "to_timestamp": F.to_timestamp,  # F3
    "date_format": F.date_format,  # F4
    "year": F.year,  # F5 (dead import in reference; live here)
    "month": F.month,  # F5
}


def lit_double_array(values) -> Column:
    """``array<double>`` literal built as ONE parsed SQL expression.

    ``F.array(*[F.lit(float(v)) for v in values])`` costs one py4j
    round trip per element (~1-2 ms each): a 64-dim query vector is
    ~100 ms and an 8x64 hyperplane set ~1 s of pure DRIVER time spent
    building the plan, before anything executes (measured on
    ann_lsh_probe_topk: 0.91 s plan build vs 0.22 s execution — guide
    §5, the driver should do almost no work). One ``F.expr`` string is
    one round trip; the JVM parses it locally.

    Bit-exactness: ``repr(float)`` is the shortest string that
    round-trips to the same IEEE double, and both Python and Java parse
    decimal strings to the nearest double, so ``CAST('<repr>' AS
    DOUBLE)`` yields the identical value ``F.lit`` would have shipped
    (non-finite values spelled in Spark's cast vocabulary)."""

    def _d(v) -> str:
        v = float(v)
        if v != v:
            return "CAST('NaN' AS DOUBLE)"
        if v == float("inf"):
            return "CAST('Infinity' AS DOUBLE)"
        if v == float("-inf"):
            return "CAST('-Infinity' AS DOUBLE)"
        return f"CAST('{v!r}' AS DOUBLE)"

    return F.expr("array(" + ",".join(_d(v) for v in values) + ")")


def month_bucket(ts: Column) -> Column:
    """'yyyy-MM' month key (ref api_gold_aggregation.py:87)."""
    return F.date_format(ts, "yyyy-MM")


def normalize_text(text: Column) -> Column:
    """Canonical text form shared by dedup/fingerprint ops (ext/):
    lowercase, collapse whitespace, trim. Pure JVM expressions."""
    return F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))
