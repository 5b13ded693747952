"""Negative controls for the driver-mirrored canonicalizer in
tools/selfcheck.py.

Round-1 lesson: the selfcheck fetched oracle rows as Python scalars
(fetchall) while the grading driver canonicalizes through pandas, so
two whole failure classes passed locally and failed in the driver:
DuckDB HUGEINT → float64 rendering ('0.0' vs '0'), and array-typed
output columns (pandas sort_values can't hash list cells). These tests
pin the canonicalizer to the driver's behavior.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)
from selfcheck import canon_lines, cell, table_hash  # noqa: E402


def test_uncast_hugeint_sum_diverges_from_bigint():
    """An un-cast SUM over ints reaches pandas as float64 and must NOT
    hash-match an int64 zero — the dq_orders_report round-1 failure."""
    con = duckdb.connect()
    hug = con.execute("SELECT COALESCE(SUM(x - 1), 0) AS v FROM (SELECT 1 AS x)").df()
    big = con.execute(
        "SELECT CAST(COALESCE(SUM(x - 1), 0) AS BIGINT) AS v FROM (SELECT 1 AS x)"
    ).df()
    assert str(hug["v"].dtype) in ("float64", "object")  # HUGEINT coercion
    assert table_hash(canon_lines(hug)) != table_hash(canon_lines(big))
    assert cell(hug["v"][0]) == "0.0"
    assert cell(big["v"][0]) == "0"


def test_array_column_raises_like_driver():
    """List cells must raise inside canonicalization (driver harness
    error), not silently pass — the embedding_label_centroids failure."""
    pdf = pd.DataFrame({"label": ["a", "b"], "centroid": [[1.0, 2.0], [3.0]]})
    with pytest.raises(TypeError):
        canon_lines(pdf)


def test_midnight_timestamp_normalizes_to_date():
    """DuckDB .df() widens DATE to midnight Timestamp; the driver passes
    date-valued queries, so the canonicalizer must render both forms
    identically (calibrated against r01 green rows)."""
    import datetime

    assert cell(pd.Timestamp("1997-02-17")) == "1997-02-17"
    assert cell(datetime.date(1997, 2, 17)) == "1997-02-17"
    assert cell(pd.Timestamp("1997-02-17 10:30:00")) == "1997-02-17T10:30:00"


def test_int_float_and_null_rendering():
    assert cell(2) == "2"
    assert cell(2.0) == "2.0"
    assert cell(None) == "∅"
    assert cell(float("nan")) == "∅"
