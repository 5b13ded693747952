"""Gold layer: aggregate summary tables.

Ref semantics (SURVEY §2.5):
- A1 daily_sales_summary: groupBy(to_date(ts)) + sum→double + count
  (``mysql_gold_aggregation.py:117-125``)
- A2 product_category_summary: groupBy(cat) + count + avg→decimal(10,2)
  (``gold_aggregation.py:97-104``)
- A3 monthly_user_growth: groupBy(date_format 'yyyy-MM') + count + orderBy
  (``api_gold_aggregation.py:86-92``)

All three are partial+final HashAggregate pairs around one shuffle on the
group key — Spark plans the map-side combine automatically, so cardinality
reduction happens before the exchange; at 100 TB the shuffle carries only
|groups| × |partitions| rows.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class AggSpec:
    """Generic gold aggregation: group_by expressions + named aggregates.

    group_by: {output_name: Column expression}
    aggregates: {output_name: Column aggregate expression}
    order_by: output column names for the final (optional) total sort
    """

    group_by: dict[str, Column]
    aggregates: dict[str, Column]
    order_by: list[str] = field(default_factory=list)


def aggregate_gold(df: DataFrame, spec: AggSpec) -> DataFrame:
    keys = [expr.alias(name) for name, expr in spec.group_by.items()]
    aggs = [expr.alias(name) for name, expr in spec.aggregates.items()]
    out = df.groupBy(*keys).agg(*aggs)
    if spec.order_by:
        out = out.orderBy(*spec.order_by)
    return out


def daily_summary(
    df: DataFrame, date_col: str, amount_col: str, id_col: str
) -> DataFrame:
    """A1 shape: per-day total + count (mysql_gold_aggregation.py:117-125).

    Matches the reference exactly: expression group key (to_date), sum cast
    to double, count of the id column.
    """
    return aggregate_gold(
        df,
        AggSpec(
            group_by={"transaction_date": F.to_date(F.col(date_col))},
            aggregates={
                "total_amount": F.sum(amount_col).cast("double"),
                "transaction_count": F.count(id_col),
            },
        ),
    )


def group_summary(
    df: DataFrame, category_col: str, id_col: str, value_col: str
) -> DataFrame:
    """A2 shape: per-category count + avg→decimal(10,2)
    (gold_aggregation.py:97-104)."""
    return aggregate_gold(
        df,
        AggSpec(
            group_by={category_col: F.col(category_col)},
            aggregates={
                "product_count": F.count(id_col),
                "average_price": F.avg(value_col).cast("decimal(10,2)"),
            },
        ),
    )


def monthly_rollup(df: DataFrame, ts_col: str, count_name: str) -> DataFrame:
    """A3 shape: per-month row count, ascending (api_gold_aggregation.py:86-92)."""
    return aggregate_gold(
        df,
        AggSpec(
            group_by={"year_month": F.date_format(F.col(ts_col), "yyyy-MM")},
            aggregates={count_name: F.count(F.lit(1))},
            order_by=["year_month"],
        ),
    )
