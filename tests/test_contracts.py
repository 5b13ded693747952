"""Schema contract classification (operators/contracts.py)."""

from __future__ import annotations

import pytest
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from data_lakehouse_project_spark.operators.contracts import (
    diff_schemas,
    enforce_contract,
)


def _st(*fields):
    return StructType([StructField(n, t, nullable) for n, t, nullable in fields])


def test_additive_nullable_is_compatible():
    old = _st(("a", LongType(), True))
    new = _st(("a", LongType(), True), ("b", StringType(), True))
    d = diff_schemas(old, new)
    assert d.compatible and d.added == ["b"]


def test_widening_is_compatible_narrowing_breaks():
    old = _st(("x", IntegerType(), True))
    wide = _st(("x", LongType(), True))
    assert diff_schemas(old, wide).widened == [("x", "integer", "long")]
    assert diff_schemas(old, wide).compatible
    back = diff_schemas(wide, old)
    assert back.narrowed == [("x", "long", "integer")]
    assert not back.compatible


def test_breaking_changes_listed_and_raise():
    old = _st(("a", LongType(), True), ("b", StringType(), True))
    new = _st(("a", DoubleType(), False), ("c", StringType(), False))
    d = diff_schemas(old, new)
    assert not d.compatible
    kinds = {v.split(":")[0] for v in d.breaking}
    assert kinds == {"removed", "added-required", "tightened"}
    assert d.widened == [("a", "long", "double")]
    with pytest.raises(ValueError, match="removed:b"):
        enforce_contract(old, new)


def test_column_order_is_not_contractual():
    old = _st(("a", LongType(), True), ("b", StringType(), True))
    new = _st(("b", StringType(), True), ("a", LongType(), True))
    d = diff_schemas(old, new)
    assert d.compatible and not d.added and not d.removed
