"""Runnable end-to-end medallion demo: all three reference pipelines.

Reproduces the reference's EP1/EP2/EP3 (SURVEY.md §3) on its seed data
(FIXTURES.md) through this engine's declarative Pipeline runner —
bronze → silver → gold with real layer writes, catalog registration, and
the hand-computable golden outputs printed at the end.

    python examples/medallion_demo.py [output_dir]
"""

from __future__ import annotations

import datetime
import os
import sys
import tempfile
from decimal import Decimal

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_lakehouse_project_spark import get_spark
from data_lakehouse_project_spark.operators import (
    SilverSpec,
    daily_summary,
    group_summary,
    ingest_bronze,
    monthly_rollup,
    transform_silver,
)
from data_lakehouse_project_spark.plans import Pipeline, Stage


def transactions_pipeline(spark, root):
    """EP1: MySQL transactions → daily_sales_summary (golden: FIXTURES §1)."""
    seed = [
        ("txn_001", 1, "cust_a", Decimal("29.99"), datetime.datetime(2025, 8, 15, 10)),
        ("txn_002", 2, "cust_b", Decimal("15.50"), datetime.datetime(2025, 8, 15, 11)),
        ("txn_003", 1, "cust_c", Decimal("29.99"), datetime.datetime(2025, 8, 15, 12)),
        ("txn_004", 4, "cust_a", Decimal("89.99"), datetime.datetime(2025, 8, 16, 9)),
        ("txn_005", 5, "cust_d", Decimal("5.75"), datetime.datetime(2025, 8, 16, 10)),
        ("txn_006", 6, "cust_b", Decimal("32.45"), datetime.datetime(2025, 8, 16, 11)),
    ]
    src = spark.createDataFrame(
        seed,
        "transaction_id string, product_id int, customer_id string, "
        "transaction_amount decimal(10,2), transaction_date timestamp",
    )
    pipe = Pipeline(
        source=lambda s: src,
        stages=[
            Stage("bronze", lambda df: ingest_bronze(df, "mysql", "transactions"),
                  path=f"{root}/bronze/transactions"),
            Stage(
                "silver",
                lambda df: transform_silver(
                    df,
                    SilverSpec(
                        casts={"transaction_amount": "decimal(10,2)",
                               "transaction_date": "date"},
                        drop_null_subset=["transaction_amount", "transaction_date"],
                    ),
                ),
                path=f"{root}/silver/transactions",
            ),
            Stage(
                "gold",
                lambda df: daily_summary(
                    df, "transaction_date", "transaction_amount", "transaction_id"
                ),
                path=f"{root}/gold/daily_sales_summary",
                single_file=True,
                register_as=("lakehouse", "daily_sales_summary"),
            ),
        ],
    )
    return pipe.run(spark, verify=True)


def products_pipeline(spark, root):
    """EP2: CSV products → partitioned silver → category summary."""
    seed = [
        (1, "Laptop", "Electronics", 29.99, datetime.datetime(2025, 8, 1, 10)),
        (2, "Mouse", "Accessories", 15.50, datetime.datetime(2025, 8, 1, 10)),
        (3, "Desk", "Furniture", 45.00, datetime.datetime(2025, 8, 2, 9)),
        (4, "Monitor", "Displays", 89.99, datetime.datetime(2025, 8, 2, 9)),
        (5, "Cable", "Cables", 5.75, datetime.datetime(2025, 8, 3, 8)),
        (6, "Stand", "Gadgets", 32.45, datetime.datetime(2025, 8, 3, 8)),
    ]
    src = spark.createDataFrame(
        seed,
        "product_id int, product_name string, category string, price double, "
        "last_updated timestamp",
    )
    pipe = Pipeline(
        source=lambda s: src,
        stages=[
            Stage("bronze",
                  lambda df: ingest_bronze(df, "csv", "products",
                                           ingestion_date="2025-08-03"),
                  path=f"{root}/bronze/products"),
            Stage(
                "silver",
                lambda df: transform_silver(
                    df,
                    SilverSpec(casts={"price": "decimal(10,2)"},
                               lower_columns=["category"]),
                ),
                path=f"{root}/silver/products",
                partition_by=["ingestion_date"],
            ),
            Stage("gold",
                  lambda df: group_summary(df, "category", "product_id", "price"),
                  path=f"{root}/gold/product_category_summary",
                  single_file=True,
                  register_as=("lakehouse", "product_category_summary")),
        ],
    )
    return pipe.run(spark, verify=True)


def users_pipeline(spark, root):
    """EP3: API users → monthly_user_growth."""
    seed = [
        (1, "Ada", "L", "a@x.io", datetime.datetime(2025, 1, 5, 10)),
        (2, "Bob", "M", "b@x.io", datetime.datetime(2025, 1, 12, 11)),
        (3, "Cat", "N", "c@x.io", datetime.datetime(2025, 2, 20, 12)),
    ]
    src = spark.createDataFrame(
        seed,
        "id int, first_name string, last_name string, email string, "
        "created_at timestamp",
    )
    pipe = Pipeline(
        source=lambda s: src,
        stages=[
            Stage("bronze", lambda df: ingest_bronze(df, "api", "users"),
                  path=f"{root}/bronze/users"),
            Stage("gold",
                  lambda df: monthly_rollup(df, "created_at", "monthly_user_count"),
                  path=f"{root}/gold/monthly_user_growth",
                  single_file=True,
                  register_as=("lakehouse", "monthly_user_growth")),
        ],
    )
    return pipe.run(spark, verify=True)


def main() -> None:
    root = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="medallion_")
    spark = get_spark(app_name="medallion-demo")

    print("== EP1 daily_sales_summary (expect 2025-08-15: 75.48/3, 2025-08-16: 128.19/3)")
    transactions_pipeline(spark, root).orderBy("transaction_date").show()

    print("== EP2 product_category_summary")
    products_pipeline(spark, root).orderBy("category").show()

    print("== EP3 monthly_user_growth (expect 2025-01: 2, 2025-02: 1)")
    users_pipeline(spark, root).show()

    print("== catalog tables registered:")
    spark.sql("SHOW TABLES IN lakehouse").show()
    print(f"layer files under: {root}")
    spark.stop()


if __name__ == "__main__":
    main()
