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


def month_bucket(ts: Column) -> Column:
    """'yyyy-MM' month key (ref api_gold_aggregation.py:87)."""
    return F.date_format(ts, "yyyy-MM")


def normalize_text(text: Column) -> Column:
    """Canonical text form shared by dedup/fingerprint ops (ext/):
    lowercase, collapse whitespace, trim. Pure JVM expressions."""
    return F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))
