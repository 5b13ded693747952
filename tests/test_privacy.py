"""k-anonymity / l-diversity (ext/privacy.py). Oracle parity is held
by tools/selfcheck.py; these pin the definitions on hand-built data."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_lakehouse_project_spark.ext import privacy as X_priv


def _toy(spark):
    # QI (city, sex): class A has 3 rows (2 diseases), class B has 1 row
    rows = [
        (1, "oslo", "f", "flu"),
        (2, "oslo", "f", "flu"),
        (3, "oslo", "f", "cold"),
        (4, "bern", "m", "flu"),
    ]
    return spark.createDataFrame(
        rows, "id LONG, city STRING, sex STRING, dx STRING"
    )


def test_k_anonymity_classes_sizes_and_verdicts(spark):
    out = {
        (r["city"], r["sex"]): r
        for r in X_priv.k_anonymity_classes(
            _toy(spark), ["city", "sex"], k=2
        ).collect()
    }
    assert out[("oslo", "f")]["class_size"] == 3
    assert out[("oslo", "f")]["meets_k"]
    assert out[("bern", "m")]["class_size"] == 1
    assert not out[("bern", "m")]["meets_k"]


def test_k_anonymity_summary_suppression_math(spark):
    row = X_priv.k_anonymity_summary(
        _toy(spark), ["city", "sex"], k=2
    ).first()
    assert row["n_classes"] == 2
    assert row["n_rows"] == 4
    assert row["min_class_size"] == 1
    assert row["rows_below_k"] == 1
    assert abs(row["suppressed_frac"] - 0.25) < 1e-9


def test_l_diversity_flags_homogeneous_class(spark):
    # make the big class homogeneous: all flu
    df = _toy(spark).withColumn(
        "dx", F.when(F.col("city") == "oslo", "flu").otherwise(F.col("dx"))
    )
    out = {
        (r["city"], r["sex"]): r
        for r in X_priv.l_diversity_classes(
            df, ["city", "sex"], "dx", l_threshold=2, k=2
        ).collect()
    }
    big = out[("oslo", "f")]
    assert big["meets_k"] and big["distinct_sensitive"] == 1
    assert not big["meets_l"]  # k-anonymous yet leaking the diagnosis


def test_summary_consistent_with_classes(testdata):
    customer = testdata["customer"]
    qi = ["c_nationkey", "c_mktsegment"]
    classes = X_priv.k_anonymity_classes(customer, qi, k=10)
    summary = X_priv.k_anonymity_summary(customer, qi, k=10).first()
    agg = classes.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("class_size").alias("rows"),
        F.sum(
            F.when(~F.col("meets_k"), F.col("class_size")).otherwise(0)
        ).alias("below"),
    ).first()
    assert summary["n_classes"] == agg["n"]
    assert summary["n_rows"] == agg["rows"]
    assert summary["rows_below_k"] == agg["below"]
    assert summary["n_rows"] == customer.count()
