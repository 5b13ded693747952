from data_lakehouse_project_spark.functions.scalar import (  # noqa: F401
    SCALAR_FUNCTIONS,
    month_bucket,
    normalize_text,
)
from data_lakehouse_project_spark.functions.quantiles import (  # noqa: F401
    grouped_median_exact,
    grouped_quantiles_exact,
)
