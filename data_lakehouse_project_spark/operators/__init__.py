from data_lakehouse_project_spark.operators.bronze import ingest_bronze  # noqa: F401
from data_lakehouse_project_spark.operators.silver import (  # noqa: F401
    SilverSpec,
    transform_silver,
)
from data_lakehouse_project_spark.operators.gold import (  # noqa: F401
    AggSpec,
    aggregate_gold,
    daily_summary,
    group_summary,
    monthly_rollup,
)
from data_lakehouse_project_spark.operators.sinks import write_table  # noqa: F401
