"""Source readers: all three schema modes of SURVEY §1.3 + fixture data
replicating the reference's sources (FIXTURES.md §1-§4)."""

from __future__ import annotations

import textwrap

import pytest
from pyspark.sql.types import DoubleType, LongType, StringType

from data_lakehouse_project_spark import schemas
from data_lakehouse_project_spark.sources import (
    read_csv,
    read_json,
    read_parquet,
    read_xml,
)
from data_lakehouse_project_spark.sources.readers import jdbc_reader_options

# reference seed data (data/products.csv:2-7)
PRODUCTS_CSV = textwrap.dedent(
    """\
    product_id,product_name,category,price,last_updated
    1,Laptop,Electronics,29.99,2025-08-01T10:00:00Z
    2,Mouse,Accessories,15.50,2025-08-01T10:00:00Z
    3,Desk,Furniture,45.00,2025-08-02T09:00:00Z
    4,Monitor,Displays,89.99,2025-08-02T09:30:00Z
    5,Cable,Cables,5.75,2025-08-03T08:00:00Z
    6,Stand,Gadgets,32.45,2025-08-03T08:15:00Z
    """
)

# reference API payload shape (api/main.py:6-28)
USERS_JSON = textwrap.dedent(
    """\
    [
      {"id": 1, "first_name": "Ada", "last_name": "L", "email": "a@x.io",
       "created_at": "2025-01-05T10:00:00Z"},
      {"id": 2, "first_name": "Bob", "last_name": "M", "email": "b@x.io",
       "created_at": "2025-01-12T11:00:00Z"},
      {"id": 3, "first_name": "Cat", "last_name": "N", "email": "c@x.io",
       "created_at": "2025-01-20T12:00:00Z"}
    ]
    """
)

# reference weather feed shape (data/weather.xml:3-10)
WEATHER_XML = textwrap.dedent(
    """\
    <observations>
      <observation>
        <timestamp>2025-08-10T00:00:00Z</timestamp>
        <station_id>ST01</station_id>
        <temperature>21.5</temperature>
        <humidity>60.0</humidity>
        <wind_speed>3.4</wind_speed>
        <conditions>clear</conditions>
      </observation>
      <observation>
        <timestamp>2025-08-10T01:00:00Z</timestamp>
        <station_id>ST02</station_id>
        <temperature>19.0</temperature>
        <humidity>72.5</humidity>
        <wind_speed>1.1</wind_speed>
        <conditions>cloudy</conditions>
      </observation>
    </observations>
    """
)


def test_csv_inferred_schema(spark, tmp_path):
    """S2: header + inference (bronze_ingestion.py:23-26)."""
    p = tmp_path / "products.csv"
    p.write_text(PRODUCTS_CSV)
    df = read_csv(spark, str(p))
    assert df.count() == 6
    types = dict((f.name, f.dataType) for f in df.schema.fields)
    assert isinstance(types["product_id"], (LongType,)) or types[
        "product_id"
    ].simpleString() in ("int", "bigint")
    assert isinstance(types["price"], DoubleType)


def test_csv_explicit_schema(spark, tmp_path):
    """S2 with enforced schema — no inference pass."""
    p = tmp_path / "products.csv"
    p.write_text(PRODUCTS_CSV)
    df = read_csv(spark, str(p), schema=schemas.PRODUCTS, infer_schema=False)
    assert [f.name for f in df.schema.fields] == [
        f.name for f in schemas.PRODUCTS.fields
    ]
    assert df.count() == 6


def test_json_schema_enforced(spark, tmp_path):
    """S3 (api_bronze_ingestion.py:12-26): multiline JSON array + StructType."""
    p = tmp_path / "users.json"
    p.write_text(USERS_JSON)
    df = read_json(spark, str(p), schema=schemas.USERS)
    rows = df.collect()
    assert len(rows) == 3
    assert {r.first_name for r in rows} == {"Ada", "Bob", "Cat"}
    assert df.schema["created_at"].dataType.simpleString() == "timestamp"


def test_xml_rowtag(spark, tmp_path):
    """S4 (xml_bronze_ingestion.py:27-30): one row per <observation>."""
    p = tmp_path / "weather.xml"
    p.write_text(WEATHER_XML)
    df = read_xml(spark, str(p), row_tag="observation")
    rows = df.collect()
    assert len(rows) == 2
    r = {row.station_id: row for row in rows}
    assert r["ST01"].temperature == pytest.approx(21.5)
    assert r["ST02"].conditions == "cloudy"
    # numeric columns parsed as numbers, not strings (FIXTURES.md §4)
    assert df.schema["temperature"].dataType.simpleString() in ("double",)


def test_xml_fallback_parser(spark, tmp_path):
    """etree fallback used when format('xml') is unavailable."""
    from data_lakehouse_project_spark.sources.xml_fallback import (
        parse_xml_to_dataframe,
    )

    p = tmp_path / "weather.xml"
    p.write_text(WEATHER_XML)
    df = parse_xml_to_dataframe(spark, str(p), "observation")
    assert df.count() == 2
    assert df.schema["humidity"].dataType.simpleString() == "double"
    assert df.schema["station_id"].dataType.simpleString() == "string"


def test_parquet_schema_enforced(spark, tmp_path, testdata):
    """S6 (silver_transformation.py:41-44): declared schema overrides footer."""
    path = str(tmp_path / "orders_pq")
    testdata["orders"].write.mode("overwrite").parquet(path)
    df = read_parquet(spark, path, schema=schemas.ORDERS)
    assert df.count() == testdata["orders"].count()
    assert df.schema["o_orderkey"].dataType.simpleString() == "bigint"


def test_jdbc_option_plumbing():
    """S1 options (mysql_bronze_ingestion.py:42-56) — unit-tested without a
    live database (SURVEY §7 step 3)."""
    opts = jdbc_reader_options(
        "jdbc:mysql://h:3306/sales",
        "transactions",
        "com.mysql.cj.jdbc.Driver",
        "u",
        "p",
    )
    assert opts["useSSL"] == "false"
    assert opts["serverTimezone"] == "UTC"
    assert opts["dbtable"] == "transactions"


def test_jdbc_partitioned_requires_bounds(spark):
    from data_lakehouse_project_spark.sources import read_jdbc

    with pytest.raises(ValueError):
        read_jdbc(
            spark,
            "jdbc:mysql://h/d",
            "t",
            partition_column="id",
            num_partitions=None,
        )


def test_parquet_schema_evolution_merge(spark, tmp_path):
    """Appended batches may add nullable columns; merge_schema=True reads
    the superset schema with NULL padding for old files — the
    schema-evolution posture plain parquet can express."""
    from data_lakehouse_project_spark.sources.readers import read_parquet

    path = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "a")], "id long, v string").write.mode(
        "overwrite"
    ).parquet(path)
    spark.createDataFrame(
        [(2, "b", 9.5)], "id long, v string, score double"
    ).write.mode("append").parquet(path)

    merged = read_parquet(spark, path, merge_schema=True)
    assert set(merged.columns) == {"id", "v", "score"}
    rows = {r.id: r.score for r in merged.collect()}
    assert rows[1] is None and rows[2] == 9.5


def test_orc_roundtrip_pushdown_and_evolution(spark, tmp_path):
    """ORC completes the columnar format matrix: write via the sink's
    fmt passthrough, read back identically, predicate pushdown reaches
    the ORC scan, and mergeSchema unions evolved appends."""
    from pyspark.sql import functions as F

    from data_lakehouse_project_spark.operators.sinks import write_table
    from data_lakehouse_project_spark.sources import read_orc

    path = str(tmp_path / "orc_tbl")
    df = spark.range(0, 1000).select(
        F.col("id"), (F.col("id") % 7).alias("v")
    )
    write_table(df, path, fmt="orc")
    back = read_orc(spark, path)
    assert back.count() == 1000
    assert [f.name for f in back.schema.fields] == ["id", "v"]

    plan = (
        back.where(F.col("id") > 990)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters" in plan and "id" in plan  # pushdown reaches scan

    # schema evolution across appends, parquet-posture parity
    df2 = df.withColumn("extra", F.lit("x"))
    df2.write.mode("append").format("orc").save(path)
    evolved = read_orc(spark, path, merge_schema=True)
    assert "extra" in evolved.columns
    assert evolved.count() == 2000
    assert evolved.where(F.col("extra").isNull()).count() == 1000


def test_s3a_conf_shape():
    """S3A conf block (X5): reference wiring (endpoint/keys/path-style,
    mysql_bronze_ingestion.py:22-26) plus the magic-committer settings a
    real object-store deployment needs. Pure-dict unit test — no AWS in
    the harness (SURVEY §2.7)."""
    from data_lakehouse_project_spark.session import s3a_conf

    c = s3a_conf(
        endpoint="http://minio:9000",
        access_key="ak",
        secret_key="sk",
        path_style_access=True,
    )
    assert c["spark.hadoop.fs.s3a.endpoint"] == "http://minio:9000"
    assert c["spark.hadoop.fs.s3a.access.key"] == "ak"
    assert c["spark.hadoop.fs.s3a.secret.key"] == "sk"
    assert c["spark.hadoop.fs.s3a.path.style.access"] == "true"
    assert c["spark.hadoop.fs.s3a.committer.name"] == "magic"

    # production default: no explicit keys → provider chain untouched
    prod = s3a_conf()
    assert "spark.hadoop.fs.s3a.access.key" not in prod
    assert prod["spark.hadoop.fs.s3a.path.style.access"] == "false"
    # temporary creds flip the provider to the session-token chain
    tmp = s3a_conf(access_key="a", secret_key="s", session_token="t")
    assert tmp["spark.hadoop.fs.s3a.aws.credentials.provider"].endswith(
        "TemporaryAWSCredentialsProvider"
    )
    # committer can be opted out for HDFS-style rename-capable stores
    plain = s3a_conf(magic_committer=False)
    assert "spark.hadoop.fs.s3a.committer.name" not in plain


def test_glue_catalog_conf_shape():
    """Glue-as-metastore conf block: the reference's hive-site.xml
    factory-class + region wiring (spark/conf/hive-site.xml:4-15)
    expressed as session conf. Config-shape unit test — no AWS in the
    harness; metastore SEMANTICS are covered against a real (Derby)
    Hive metastore in test_hive_catalog.py."""
    from data_lakehouse_project_spark.session import glue_catalog_conf

    c = glue_catalog_conf(region="eu-west-1", catalog_id="123456789012")
    assert c[
        "spark.hadoop.hive.metastore.client.factory.class"
    ].endswith("AWSGlueDataCatalogHiveClientFactory")
    assert c["spark.hadoop.hive.metastore.glue.aws.region"] == "eu-west-1"
    assert (
        c["spark.hadoop.hive.metastore.glue.catalogid"] == "123456789012"
    )
    # minimal block: factory class only — region from the provider chain
    assert list(glue_catalog_conf()) == [
        "spark.hadoop.hive.metastore.client.factory.class"
    ]
