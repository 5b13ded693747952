from data_lakehouse_project_spark.sources.readers import (  # noqa: F401
    load_testdata,
    read_csv,
    read_delta,
    read_delta_changes,
    read_iceberg,
    read_iceberg_changes,
    read_jdbc,
    read_json,
    read_orc,
    read_parquet,
    read_table,
    read_xml,
)
