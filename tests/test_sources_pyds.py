"""Python DataSource API (format("xml_py")): distributed XML source."""

from __future__ import annotations

import pytest

XML_ONE = """<observations>
  <observation>
    <station_id>S1</station_id>
    <temperature>21.5</temperature>
    <humidity>60</humidity>
    <ok>true</ok>
  </observation>
  <observation>
    <station_id>S2</station_id>
    <temperature>19.0</temperature>
    <humidity>71</humidity>
    <ok>false</ok>
  </observation>
</observations>
"""

XML_TWO = """<observations>
  <observation>
    <station_id>S3</station_id>
    <temperature>25.25</temperature>
    <humidity>44</humidity>
    <ok>true</ok>
  </observation>
</observations>
"""


@pytest.fixture()
def xml_dir(tmp_path):
    (tmp_path / "a.xml").write_text(XML_ONE)
    (tmp_path / "b.xml").write_text(XML_TWO)
    return str(tmp_path)


def test_xml_py_source_reads_directory(spark, xml_dir):
    from data_lakehouse_project_spark.sources.python_datasource import (
        register_python_datasources,
    )

    register_python_datasources(spark)
    df = (
        spark.read.format("xml_py")
        .option("rowTag", "observation")
        .load(xml_dir)
    )
    rows = {r.station_id: r for r in df.collect()}
    assert set(rows) == {"S1", "S2", "S3"}
    assert rows["S3"].temperature == 25.25
    assert rows["S2"].humidity == 71
    assert rows["S1"].ok is True
    # inference ladder: double / long / boolean / string
    dtypes = dict(df.dtypes)
    assert dtypes["temperature"] == "double"
    assert dtypes["humidity"] == "bigint"
    assert dtypes["ok"] == "boolean"
    assert dtypes["station_id"] == "string"


def test_xml_py_matches_driver_side_fallback(spark, xml_dir):
    """Executor-side DataSource and driver-side etree fallback must agree
    on a single file."""
    from data_lakehouse_project_spark.sources.python_datasource import (
        register_python_datasources,
    )
    from data_lakehouse_project_spark.sources.xml_fallback import (
        parse_xml_to_dataframe,
    )

    register_python_datasources(spark)
    path = f"{xml_dir}/a.xml"
    via_ds = (
        spark.read.format("xml_py")
        .option("rowTag", "observation")
        .load(path)
    )
    via_fallback = parse_xml_to_dataframe(spark, path, row_tag="observation")
    a = {tuple(r) for r in via_ds.select(sorted(via_ds.columns)).collect()}
    b = {
        tuple(r)
        for r in via_fallback.select(sorted(via_fallback.columns)).collect()
    }
    assert a == b


def test_xml_py_distributes_one_partition_per_file(spark, xml_dir):
    from data_lakehouse_project_spark.sources.python_datasource import (
        register_python_datasources,
    )

    register_python_datasources(spark)
    df = (
        spark.read.format("xml_py")
        .option("rowTag", "observation")
        .load(xml_dir)
    )
    assert df.rdd.getNumPartitions() == 2


def test_jsonl_python_datasource_write_round_trip(spark, tmp_path):
    """Writer half of the Python DataSource API: partitioned JSONL
    write with two-phase commit (_SUCCESS only after all partitions),
    readable back by the native JSON reader; overwrite clears."""
    import os

    from pyspark.sql import functions as F

    from data_lakehouse_project_spark.sources.python_datasource import (
        register_python_datasources,
    )

    register_python_datasources(spark)
    out = str(tmp_path / "jsonl_out")
    df = spark.range(0, 100).select(
        F.col("id"), (F.col("id") % 3).cast("string").alias("tag")
    ).repartition(4)
    df.write.format("jsonl_py").option("path", out).mode("append").save()

    files = os.listdir(out)
    assert "_SUCCESS" in files
    assert sum(f.endswith(".jsonl") for f in files) == 4  # one per partition
    assert open(os.path.join(out, "_SUCCESS")).read() == "100"

    back = spark.read.json(out)
    assert back.count() == 100
    assert {r.id for r in back.collect()} == set(range(100))

    # overwrite replaces prior contents
    spark.range(0, 7).select(
        F.col("id"), F.lit("x").alias("tag")
    ).write.format("jsonl_py").option("path", out).mode("overwrite").save()
    assert spark.read.json(out).count() == 7


def test_jsonl_stream_reader_exactly_once(spark, tmp_path):
    """Streaming Python DataSource (SimpleDataSourceStreamReader):
    tail an append-only JSONL dir; a restart from the same checkpoint
    must consume ONLY files added since the last committed offset."""
    import json

    from data_lakehouse_project_spark.sources.python_datasource import (
        register_python_datasources,
    )

    register_python_datasources(spark)
    src = tmp_path / "stream_src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")

    def _emit(name, rows):
        p = src / f"{name}.jsonl.tmp"
        with open(p, "w") as fh:
            for r in rows:
                fh.write(json.dumps(r) + "\n")
        p.rename(src / f"{name}.jsonl")

    _emit("a", [{"id": 1, "v": "x"}, {"id": 2, "v": "y"}])
    _emit("b", [{"id": 3, "v": "z"}])

    seen: list[tuple] = []

    def _run_once():
        got: list[tuple] = []
        q = (
            spark.readStream.format("jsonl_stream")
            .schema("id long, v string")
            .option("path", str(src))
            .load()
            .writeStream.foreachBatch(
                lambda df, _eid: got.extend(
                    sorted((r.id, r.v) for r in df.collect())
                )
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        seen.append(tuple(got))

    _run_once()
    assert seen[-1] == ((1, "x"), (2, "y"), (3, "z"))

    # restart with one new file: offset replay must skip a and b
    _emit("c", [{"id": 4, "v": "w"}])
    _run_once()
    assert seen[-1] == ((4, "w"),)

    # nothing new: the next restart sees an empty batch (or none at all)
    _run_once()
    assert seen[-1] == ()
