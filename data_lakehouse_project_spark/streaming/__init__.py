from data_lakehouse_project_spark.streaming.events import (  # noqa: F401
    hourly_rollup,
    parse_props,
    sessionize,
    streaming_hourly_rollup,
)
