from data_lakehouse_project_spark.plans.pipeline import (  # noqa: F401
    Pipeline,
    Stage,
)
