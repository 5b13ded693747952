"""Privacy batch: k-anonymity and l-diversity release-risk reports
(ext/privacy.py) over the customer table.

North-star surface past the reference (SURVEY §2.9): the reference
pipeline publishes customer-grain gold tables with no re-identification
review at all; these are the structured-column companions of the
free-text PII redaction already in the registry
(``redact_pii_documents``).

Oracle parity notes: quasi-identifiers are exact columns plus a
deterministic generalization band (floor(acctbal / 2000)) computed with
identical integer arithmetic on both engines; counts are exact, and the
one float (suppressed fraction) uses the shared floor-rounding helper.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_lakehouse_project_spark.ext import privacy as X_priv
from data_lakehouse_project_spark.sources.readers import load_testdata

_helpers: dict = {}


def _t(spark, sf_dir, *names):
    tables = load_testdata(spark, sf_dir, names=names)
    return [tables[n] for n in names]


def _banded(customer):
    return customer.select(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 2000).cast("long").alias("bal_band"),
    )


def q_k_anonymity_classes(spark, sf_dir):
    """QI equivalence classes (nation, segment, acctbal band) with
    k=10 verdicts (ext/privacy.py::k_anonymity_classes)."""
    (customer,) = _t(spark, sf_dir, "customer")
    return X_priv.k_anonymity_classes(
        _banded(customer), ["c_nationkey", "c_mktsegment", "bal_band"], k=10
    )


def q_k_anonymity_summary(spark, sf_dir):
    """One-row release-risk report over QI (nation, segment): class
    count, sub-k rows, smallest class, suppression fraction
    (ext/privacy.py::k_anonymity_summary)."""
    (customer,) = _t(spark, sf_dir, "customer")
    return X_priv.k_anonymity_summary(
        customer, ["c_nationkey", "c_mktsegment"], k=10
    )


def q_l_diversity_classes(spark, sf_dir):
    """l-diversity of the acctbal band within QI (nation, segment)
    classes: a full-size class whose members share one balance band
    still leaks it (ext/privacy.py::l_diversity_classes). The band is
    the SENSITIVE attribute here, not a QI."""
    (customer,) = _t(spark, sf_dir, "customer")
    return X_priv.l_diversity_classes(
        _banded(customer),
        ["c_nationkey", "c_mktsegment"],
        "bal_band",
        l_threshold=3,
        k=10,
    )


SQL_K_ANON_CLASSES = """
SELECT c_nationkey, c_mktsegment,
       CAST(FLOOR(c_acctbal / 2000) AS BIGINT) AS bal_band,
       COUNT(*) AS class_size,
       (COUNT(*) >= 10) AS meets_k
FROM customer
GROUP BY 1, 2, 3
"""

SQL_K_ANON_SUMMARY = """
WITH cls AS (
  SELECT COUNT(*) AS class_size
  FROM customer GROUP BY c_nationkey, c_mktsegment
)
SELECT COUNT(*) AS n_classes,
       CAST(SUM(class_size) AS BIGINT) AS n_rows,
       MIN(class_size) AS min_class_size,
       CAST(SUM(CASE WHEN class_size < 10 THEN class_size ELSE 0 END)
            AS BIGINT) AS rows_below_k,
       {FRAC} AS suppressed_frac
FROM cls
"""

SQL_L_DIVERSITY = """
SELECT c_nationkey, c_mktsegment,
       COUNT(*) AS class_size,
       COUNT(DISTINCT bal_band) AS distinct_sensitive,
       (COUNT(*) >= 10) AS meets_k,
       (COUNT(DISTINCT bal_band) >= 3) AS meets_l
FROM (
  SELECT c_nationkey, c_mktsegment,
         CAST(FLOOR(c_acctbal / 2000) AS BIGINT) AS bal_band
  FROM customer
)
GROUP BY 1, 2
"""


def build(helpers: dict) -> dict:
    _helpers.update(helpers)
    R = helpers["R"]
    return {
        "k_anonymity_classes": (q_k_anonymity_classes, SQL_K_ANON_CLASSES),
        "k_anonymity_summary": (
            q_k_anonymity_summary,
            SQL_K_ANON_SUMMARY.format(
                FRAC=R(
                    "SUM(CASE WHEN class_size < 10 THEN class_size"
                    " ELSE 0 END) * 1.0 / SUM(class_size)",
                    6,
                )
            ),
        ),
        "l_diversity_classes": (q_l_diversity_classes, SQL_L_DIVERSITY),
    }
