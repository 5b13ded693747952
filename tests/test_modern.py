"""Batch 4 (registry_modern): accuracy and semantics checks for the
modern SQL surface."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_lakehouse_project_spark import registry_modern as M
from data_lakehouse_project_spark.sources.readers import load_testdata
from tests.conftest import SF_DIR


def test_approx_percentile_within_tolerance(spark):
    """The sketch median must land within 2% of the exact percentile —
    the accuracy contract that justifies skipping the global sort."""
    approx = {
        r.l_returnflag: (r.p50_approx, r.p95_approx)
        for r in M.q_agg_approx_percentile(spark, SF_DIR).collect()
    }
    li = load_testdata(spark, SF_DIR)["lineitem"]
    exact = {
        r.l_returnflag: (r.p50, r.p95)
        for r in li.groupBy("l_returnflag")
        .agg(
            F.expr("percentile(l_extendedprice, 0.5)").alias("p50"),
            F.expr("percentile(l_extendedprice, 0.95)").alias("p95"),
        )
        .collect()
    }
    assert set(approx) == set(exact)
    for flag in exact:
        for a, e in zip(approx[flag], exact[flag]):
            assert abs(a - e) / e < 0.02, (flag, a, e)


def test_try_divide_null_on_zero_divisor(spark):
    """Rows with zero discount must yield NULL, never Inf or an error."""
    out = M.q_try_arithmetic(spark, SF_DIR)
    li = load_testdata(spark, SF_DIR)["lineitem"]
    n_zero = li.where(F.floor(F.col("l_discount") * 10 + 0.5) == 0).count()
    assert n_zero > 0, "testdata should contain zero-discount rows"
    assert out.where(F.col("price_per_decidiscount").isNull()).count() == n_zero


def test_variant_extract_matches_string_path(spark):
    """variant_get over parse_json must agree with the classic
    get_json_object string path for every row."""
    out = M.q_events_variant_extract(spark, SF_DIR)
    events = load_testdata(spark, SF_DIR)["events"]
    legacy = events.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("bigint").alias("k_legacy"),
    )
    mismatches = (
        out.join(legacy, "event_id")
        .where(
            (F.col("k_val") != F.col("k_legacy"))
            | (F.col("k_val").isNull() != F.col("k_legacy").isNull())
        )
        .count()
    )
    assert mismatches == 0


def test_recursive_cte_covers_every_month(spark):
    """80 ladder rows; the sum over joined counts equals |orders|."""
    rows = M.q_recursive_cte_sql(spark, SF_DIR).collect()
    assert len(rows) == 80
    n_orders = load_testdata(spark, SF_DIR)["orders"].count()
    assert sum(r.n_orders for r in rows) == n_orders


def test_udtf_bigrams_matches_jvm_ngrams(spark):
    """The Python UDTF generator and a JVM transform expression must
    produce identical (doc_id, ngram, pos) multisets — two independent
    implementations of the same semantics."""
    from data_lakehouse_project_spark.functions.scalar import normalize_text

    out = M.q_text_udtf_bigrams(spark, SF_DIR)
    docs = load_testdata(spark, SF_DIR)["documents"]
    jvm = (
        docs.select(
            "doc_id", F.split(normalize_text(F.col("text")), " ").alias("toks")
        )
        .where(F.size("toks") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(toks) - 2), i -> "
                    "struct(concat(toks[i], ' ', toks[i + 1]) AS ngram, "
                    "i AS pos))"
                )
            ).alias("s"),
        )
        .select("doc_id", "s.ngram", "s.pos")
    )
    key = ["doc_id", "ngram", "pos"]
    mismatches = (
        out.groupBy(*key).agg(F.count(F.lit(1)).alias("ca"))
        .join(
            jvm.groupBy(*key).agg(F.count(F.lit(1)).alias("cb")),
            key,
            "full_outer",
        )
        .where(
            F.col("ca").isNull()
            | F.col("cb").isNull()
            | (F.col("ca") != F.col("cb"))
        )
        .count()
    )
    assert mismatches == 0


def test_observed_write_metrics_in_single_pass(spark, tmp_path, testdata):
    """observed_write returns metrics gathered DURING the write — values
    must equal a separate aggregation, with no verification re-read."""
    from data_lakehouse_project_spark.operators.sinks import observed_write

    orders = testdata["orders"]
    got = observed_write(
        orders,
        str(tmp_path / "obs_orders"),
        {
            "n_rows": F.count(F.lit(1)),
            "total_price": F.sum("o_totalprice"),
            "null_custkeys": F.count(F.when(F.col("o_custkey").isNull(), 1)),
        },
    )
    want = orders.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("o_totalprice").alias("t"),
    ).collect()[0]
    assert got["n_rows"] == want["n"]
    assert abs(got["total_price"] - want["t"]) < 1e-6
    assert got["null_custkeys"] == 0
    assert spark.read.parquet(str(tmp_path / "obs_orders")).count() == want["n"]


def test_ansi_mode_posture(spark):
    """The engine runs with ANSI semantics (Spark 4 default): raw
    division by zero is an error; the sanctioned safe path is try_*."""
    import pytest

    assert spark.conf.get("spark.sql.ansi.enabled") == "true"
    with pytest.raises(Exception):
        spark.sql("SELECT 1/0 AS boom").collect()
    assert spark.sql("SELECT try_divide(1, 0) AS d").collect()[0].d is None


def test_csv_json_function_surface(spark):
    """from_csv / to_csv / schema_of_json / from_json round-trips — the
    embedded-record toolkit for string columns carrying structured data."""
    df = spark.createDataFrame(
        [("1,alpha", '{"a": 1, "b": "x"}')], "csv_s string, json_s string"
    )
    out = df.select(
        F.from_csv("csv_s", "id INT, name STRING").alias("c"),
        F.from_json("json_s", "a INT, b STRING").alias("j"),
        F.schema_of_json(F.lit('{"a": 1, "b": "x"}')).alias("js"),
    ).select("c.id", "c.name", "j.a", "j.b", "js")
    r = out.collect()[0]
    assert (r.id, r.name, r.a, r.b) == (1, "alpha", 1, "x")
    assert "a" in r.js and "b" in r.js
    back = (
        spark.createDataFrame([(2, "beta")], "id int, name string")
        .select(F.to_csv(F.struct("id", "name")).alias("s"))
        .collect()[0]
        .s
    )
    assert back == "2,beta"


def test_polymorphic_udtf_analyze_schema(spark):
    """split_fields: static analyze() derives the output schema from
    the constant column-name argument at plan time."""
    from data_lakehouse_project_spark.functions.table_functions import (
        register_table_functions,
    )

    register_table_functions(spark)
    df = spark.sql(
        "SELECT s.* FROM split_fields('a|b|c', 'x, y', '|') s"
    )
    assert df.columns == ["x", "y"]  # schema from the constant
    assert df.head() == ("a", "b")  # extra field dropped
    short = spark.sql(
        "SELECT s.* FROM split_fields('only', 'p,q,r', '|') s"
    ).head()
    assert short == ("only", None, None)  # missing fields null-padded

    import pytest
    from pyspark.errors import AnalysisException

    with pytest.raises(AnalysisException):
        # non-constant name list must be rejected at ANALYSIS time
        spark.sql(
            "SELECT s.* FROM (SELECT 'x' AS names) t,"
            " LATERAL split_fields('a', t.names, '|') s"
        ).collect()
