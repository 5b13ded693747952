"""Central schema registry.

The reference declares ``StructType`` literals inline per job
(``spark/jobs/api_bronze_ingestion.py:12-18``,
``spark/jobs/silver_transformation.py:25-32``); we centralize them so
every layer reads/enforces one canonical definition (SURVEY §1.3 mode 2).
Also registers the driver testdata star schema so query builders can
validate column references early.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    DateType,
    DecimalType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# --- Reference pipeline schemas (FIXTURES.md §1-§4) ---------------------

# transactions: db/init.sql:4-10 ; silver casts mysql_silver_transformation.py:60-61
TRANSACTIONS = StructType(
    [
        StructField("transaction_id", StringType()),
        StructField("product_id", IntegerType()),
        StructField("customer_id", StringType()),
        StructField("transaction_amount", DecimalType(10, 2)),
        StructField("transaction_date", TimestampType()),
    ]
)

# products: data/products.csv:1 ; enforced re-read silver_transformation.py:25-32
PRODUCTS = StructType(
    [
        StructField("product_id", IntegerType()),
        StructField("product_name", StringType()),
        StructField("category", StringType()),
        StructField("price", DoubleType()),
        StructField("last_updated", TimestampType()),
    ]
)

# users: api_bronze_ingestion.py:12-18
USERS = StructType(
    [
        StructField("id", IntegerType()),
        StructField("first_name", StringType()),
        StructField("last_name", StringType()),
        StructField("email", StringType()),
        StructField("created_at", TimestampType()),
    ]
)

# weather: data/weather.xml:3-10 as spark-xml would infer (xml_bronze_ingestion.py:27-30)
WEATHER = StructType(
    [
        StructField("timestamp", StringType()),
        StructField("station_id", StringType()),
        StructField("temperature", DoubleType()),
        StructField("humidity", DoubleType()),
        StructField("wind_speed", DoubleType()),
        StructField("conditions", StringType()),
    ]
)

# --- Driver testdata star schema (TESTDATA.md / FIXTURES.md §5) ---------

REGION = StructType(
    [StructField("r_regionkey", IntegerType()), StructField("r_name", StringType())]
)

NATION = StructType(
    [
        StructField("n_nationkey", IntegerType()),
        StructField("n_name", StringType()),
        StructField("n_regionkey", IntegerType()),
    ]
)

CUSTOMER = StructType(
    [
        StructField("c_custkey", LongType()),
        StructField("c_name", StringType()),
        StructField("c_nationkey", IntegerType()),
        StructField("c_acctbal", DoubleType()),
        StructField("c_mktsegment", StringType()),
    ]
)

SUPPLIER = StructType(
    [
        StructField("s_suppkey", LongType()),
        StructField("s_name", StringType()),
        StructField("s_nationkey", IntegerType()),
        StructField("s_acctbal", DoubleType()),
    ]
)

PART = StructType(
    [
        StructField("p_partkey", LongType()),
        StructField("p_name", StringType()),
        StructField("p_brand", StringType()),
        StructField("p_type", StringType()),
        StructField("p_size", IntegerType()),
        StructField("p_retailprice", DoubleType()),
    ]
)

ORDERS = StructType(
    [
        StructField("o_orderkey", LongType()),
        StructField("o_custkey", LongType()),
        StructField("o_orderstatus", StringType()),
        StructField("o_totalprice", DoubleType()),
        StructField("o_orderdate", TimestampType()),
        StructField("o_orderpriority", StringType()),
    ]
)

LINEITEM = StructType(
    [
        StructField("l_orderkey", LongType()),
        StructField("l_partkey", LongType()),
        StructField("l_suppkey", LongType()),
        StructField("l_linenumber", IntegerType()),
        StructField("l_quantity", DoubleType()),
        StructField("l_extendedprice", DoubleType()),
        StructField("l_discount", DoubleType()),
        StructField("l_tax", DoubleType()),
        StructField("l_returnflag", StringType()),
        StructField("l_linestatus", StringType()),
        StructField("l_shipdate", TimestampType()),
    ]
)

EVENTS = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)

DOCUMENTS = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ]
)

EMBEDDINGS = StructType(
    [
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(FloatType())),
        StructField("label", IntegerType()),
    ]
)

# props JSON payload inside events.props — from_json schema (SURVEY §2.8)
EVENT_PROPS = StructType([StructField("k", IntegerType())])

TESTDATA_TABLES = {
    "region": REGION,
    "nation": NATION,
    "customer": CUSTOMER,
    "supplier": SUPPLIER,
    "part": PART,
    "orders": ORDERS,
    "lineitem": LINEITEM,
    "events": EVENTS,
    "documents": DOCUMENTS,
    "embeddings": EMBEDDINGS,
}

REFERENCE_TABLES = {
    "transactions": TRANSACTIONS,
    "products": PRODUCTS,
    "users": USERS,
    "weather": WEATHER,
}

# Bronze metadata columns appended on ingest (mysql_bronze_ingestion.py:85-88)
BRONZE_METADATA_COLUMNS = ("ingestion_timestamp", "source_system", "source_table")
# Silver metadata columns (mysql_silver_transformation.py:65-67)
SILVER_METADATA_COLUMNS = ("transformation_timestamp", "data_quality_check")
