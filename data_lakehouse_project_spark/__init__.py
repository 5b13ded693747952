"""data_lakehouse_project_spark — a PySpark-native lakehouse analytics engine.

A from-scratch rebuild of the query & data-processing capabilities of the
reference medallion lakehouse (``Noureddineblbli/data-lakehouse-project``,
surveyed in ``SURVEY.md``), re-expressed as a reusable Spark-first engine:

- ``session``   — SparkSession factory (AQE, Arrow, UTC, tuned shuffle).
- ``schemas``   — central StructType registry (SURVEY §1.3: the reference
  inlines per-job StructType literals; we centralize them).
- ``sources``   — readers: parquet/csv/json/jdbc/xml/table (SURVEY §2.1).
- ``operators`` — medallion stages (bronze/silver/gold), sinks, catalog,
  and the general relational query surface (SURVEY §2.2-§2.7, §2.9).
- ``functions`` — scalar function surface (SURVEY §2.4).
- ``plans``     — declarative pipeline runner (SURVEY §3 "new-engine
  lifecycle": Source → Bronze → Silver → Gold → Sink → Catalog).
- ``streaming`` — event analytics: batch windows + Structured Streaming.
- ``ext``       — LLM-data-pipeline extensions (SURVEY §2.8): dedup,
  similarity search, text analysis, multimodal columns.

Everything is plain DataFrame-API PySpark: no custom Catalyst rules are
needed (SURVEY §4), so Catalyst/Tungsten/AQE provide pushdown, pruning,
partial aggregation, and whole-stage codegen for free.
"""

__version__ = "0.1.0"

from data_lakehouse_project_spark.session import get_spark  # noqa: F401
