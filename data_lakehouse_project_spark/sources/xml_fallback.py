"""Pure-Python XML fallback reader.

Replaces the reference's external ``com.databricks:spark-xml`` dependency
(``airflow/dags/xml_bronze_dag.py:46``) when neither Spark 4's native XML
source nor the jar is available. Parses on the driver with ``xml.etree``
and mimics spark-xml's type inference (long → double → boolean → string),
then distributes via ``createDataFrame``.

Driver-side parsing is only acceptable because XML in this architecture is
a small-config source (the reference's feed is 4 observations); the native
``format("xml")`` path in ``readers.read_xml`` handles large files.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def _infer_value(raw: str | None):
    if raw is None:
        return None
    s = raw.strip()
    if s == "":
        return None
    try:
        return int(s)
    except ValueError:
        pass
    try:
        return float(s)
    except ValueError:
        pass
    if s.lower() in ("true", "false"):
        return s.lower() == "true"
    return s


def _spark_type(values):
    types = {type(v) for v in values if v is not None}
    if types == {int}:
        return LongType()
    if types <= {int, float} and float in types:
        return DoubleType()
    if types == {bool}:
        return BooleanType()
    return StringType()


def parse_xml_to_dataframe(
    spark: SparkSession,
    path: str,
    row_tag: str,
    schema: StructType | None = None,
) -> DataFrame:
    """One DataFrame row per ``<row_tag>`` element; children become columns."""
    root = ET.parse(path).getroot()
    elems = root.iter(row_tag)
    rows: list[dict] = []
    columns: list[str] = []
    for elem in elems:
        row: dict = {}
        for child in elem:
            if child.tag not in columns:
                columns.append(child.tag)
            row[child.tag] = _infer_value(child.text)
        for k, v in elem.attrib.items():
            key = f"_{k}"
            if key not in columns:
                columns.append(key)
            row[key] = _infer_value(v)
        rows.append(row)

    if schema is None:
        fields = []
        for c in columns:
            vals = [r.get(c) for r in rows]
            fields.append(StructField(c, _spark_type(vals), True))
        schema = StructType(fields)

    # normalize inferred ints to float when the column is DoubleType
    names = [f.name for f in schema.fields]
    data = []
    for r in rows:
        rec = []
        for f in schema.fields:
            v = r.get(f.name)
            if v is not None and isinstance(f.dataType, DoubleType):
                v = float(v)
            if v is not None and isinstance(f.dataType, StringType):
                v = str(v)
            rec.append(v)
        data.append(tuple(rec))
    return spark.createDataFrame(data, schema) if data else spark.createDataFrame(
        [], schema
    )
