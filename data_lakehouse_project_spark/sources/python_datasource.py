"""Custom Python DataSource (Spark 4 DataSource API): distributed XML.

Third implementation tier of the SURVEY §2.1 S4 XML source, completing
the ladder:

1. ``format("xml")``      — Spark 4 native (preferred, JVM-side),
2. ``format("xml_py")``   — THIS module: executor-side Python parsing,
   one input partition per file, so a directory of many XML feeds scales
   across the cluster (each executor parses its own files),
3. ``xml_fallback``       — driver-side etree parse + createDataFrame,
   small-config feeds only.

Unlike the driver-side fallback, this source implements Spark's
``DataSource`` / ``DataSourceReader`` contract: schema inference runs
once on the driver against a sample file, then each file is parsed
independently inside the executors' Python workers — no single-process
bottleneck and no full materialization on the driver.

Type inference mirrors ``xml_fallback`` (long → double → boolean →
string, spark-xml's ladder), so the two paths produce identical frames
on identical input (asserted in tests/test_sources_pyds.py).
"""

from __future__ import annotations

import glob as _glob
import os
import xml.etree.ElementTree as ET

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from data_lakehouse_project_spark.sources.xml_fallback import (
    _infer_value,
    _spark_type,
)


def _expand_paths(path: str) -> list[str]:
    if os.path.isdir(path):
        return sorted(_glob.glob(os.path.join(path, "*.xml")))
    expanded = sorted(_glob.glob(path))
    return expanded or [path]


def _parse_records(path: str, row_tag: str) -> list[dict]:
    root = ET.parse(path).getroot()
    records = []
    for elem in root.iter(row_tag):
        rec = {child.tag: _infer_value(child.text) for child in elem}
        rec.update(
            {f"_{k}": _infer_value(v) for k, v in elem.attrib.items()}
        )
        records.append(rec)
    return records


def _coerce(value, dtype):
    if value is None:
        return None
    if isinstance(dtype, DoubleType):
        return float(value)
    if isinstance(dtype, LongType):
        return int(value)
    if isinstance(dtype, BooleanType):
        return bool(value)
    if isinstance(dtype, StringType):
        return str(value)
    return value


class _XMLFilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class XMLPythonDataSource(DataSource):
    """``spark.read.format("xml_py").option("rowTag", t).load(path)``."""

    @classmethod
    def name(cls) -> str:
        return "xml_py"

    def schema(self) -> StructType:
        # infer on the driver from the FIRST file only (cheap); pass an
        # explicit .schema(...) to skip inference entirely
        path = self.options.get("path")
        row_tag = self.options.get("rowtag", "row")
        first = _expand_paths(path)[0]
        records = _parse_records(first, row_tag)
        fields: dict[str, list] = {}
        for rec in records:
            for k, v in rec.items():
                fields.setdefault(k, []).append(v)
        return StructType(
            [StructField(k, _spark_type(vs), True) for k, vs in fields.items()]
        )

    def reader(self, schema: StructType) -> DataSourceReader:
        return _XMLReader(
            schema,
            self.options.get("path"),
            self.options.get("rowtag", "row"),
        )


class _XMLReader(DataSourceReader):
    def __init__(self, schema: StructType, path: str, row_tag: str):
        self._schema = schema
        self._path = path
        self._row_tag = row_tag

    def partitions(self):
        # one partition per file: executor-side parallelism over feeds
        return [_XMLFilePartition(p) for p in _expand_paths(self._path)]

    def read(self, partition: _XMLFilePartition):
        names = [f.name for f in self._schema.fields]
        types = {f.name: f.dataType for f in self._schema.fields}
        for rec in _parse_records(partition.path, self._row_tag):
            yield tuple(_coerce(rec.get(n), types[n]) for n in names)


def register_python_datasources(spark) -> None:
    """Idempotently register all custom Python data sources."""
    from data_lakehouse_project_spark.sources.delta_stream import (
        DeltaStreamDataSource,
    )
    from data_lakehouse_project_spark.sources.iceberg_stream import (
        IcebergStreamDataSource,
    )

    spark.dataSource.register(XMLPythonDataSource)
    spark.dataSource.register(JSONLPythonDataSource)
    spark.dataSource.register(JSONLStreamDataSource)
    spark.dataSource.register(DeltaStreamDataSource)
    spark.dataSource.register(IcebergStreamDataSource)


# ---------------------------------------------------------------------
# Writer side of the Spark 4 Python DataSource API: a JSONL sink
# (format("jsonl_py")). Each executor's Python worker serializes its
# partition to a uniquely-named part file; the driver-side commit drops
# a _SUCCESS marker only after every partition reported success, so a
# half-written job is detectable (the same two-phase contract the JVM
# FileOutputCommitter gives parquet writes). Exists to cover the WRITE
# half of the custom-datasource surface the XML source covers for reads.
# ---------------------------------------------------------------------

import json as _json
import uuid as _uuid

from pyspark.sql.datasource import DataSourceWriter, WriterCommitMessage


class _JSONLCommit(WriterCommitMessage):
    def __init__(self, path: str, rows: int):
        self.path = path
        self.rows = rows


class JSONLPythonDataSource(DataSource):
    """``df.write.format("jsonl_py").option("path", p).save()`` — one
    JSON object per line, UTF-8, one file per partition."""

    @classmethod
    def name(cls) -> str:
        return "jsonl_py"

    def writer(self, schema, overwrite: bool):
        path = self.options.get("path")
        if not path:
            raise ValueError("jsonl_py requires option('path', ...)")
        # driver-side: prepare the target dir; overwrite clears it
        if overwrite and os.path.isdir(path):
            for f in os.listdir(path):
                os.remove(os.path.join(path, f))
        os.makedirs(path, exist_ok=True)
        return _JSONLWriter(path, [f.name for f in schema.fields])


class _JSONLWriter(DataSourceWriter):
    def __init__(self, path: str, columns: list[str]):
        self.path = path
        self.columns = columns

    def write(self, iterator):  # executor-side, one call per partition
        out = os.path.join(self.path, f"part-{_uuid.uuid4().hex}.jsonl")
        n = 0
        with open(out, "w", encoding="utf-8") as fh:
            for row in iterator:
                fh.write(
                    _json.dumps(
                        {c: row[c] for c in self.columns}, default=str
                    )
                )
                fh.write("\n")
                n += 1
        return _JSONLCommit(out, n)

    def commit(self, messages):  # driver-side, after ALL partitions
        total = sum(m.rows for m in messages if m is not None)
        with open(os.path.join(self.path, "_SUCCESS"), "w") as fh:
            fh.write(str(total))

    def abort(self, messages):  # driver-side on job failure
        for m in messages:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)


# ---------------------------------------------------------------------
# STREAMING read side of the Spark 4 Python DataSource API
# (``spark.readStream.format("jsonl_stream")``): an append-only JSONL
# directory tailed as a micro-batch stream. Covers the third quadrant
# of the custom-datasource surface (batch read = xml_py, batch write =
# jsonl_py, streaming read = this; streaming write is foreachBatch's
# domain). Offsets are exactly-once by construction: the offset is a
# FILENAME WATERMARK — every file whose basename sorts ≤ the watermark
# counts as consumed — so ``readBetweenOffsets(start, end)`` re-reads
# exactly the files in (start, end] after a crash regardless of what
# arrived since. (A consumed-file COUNT is subtly wrong: one new file
# that happens to sort before an already-consumed name shifts every
# index and replay returns the wrong slice.) Producers must therefore
# emit monotonically-sorting names (timestamps/sequence numbers — the
# standard log-file convention); a name at-or-below the watermark is
# treated as already consumed and skipped. Files must be added
# atomically (write + rename) and never mutated.
# ---------------------------------------------------------------------

from pyspark.sql.datasource import SimpleDataSourceStreamReader
from pyspark.sql.types import _parse_datatype_string


class JSONLStreamDataSource(DataSource):
    """``spark.readStream.format("jsonl_stream").schema(ddl)
    .option("path", p).load()`` — tail an append-only JSONL directory.

    Schema: pass ``.schema(...)`` explicitly (streaming sources should
    not re-infer per batch); without one, every field of the first
    file's first record is read as string.
    """

    @classmethod
    def name(cls) -> str:
        return "jsonl_stream"

    def schema(self):
        first = sorted(_expand_paths(self.options.get("path")))
        if first:
            with open(first[0], encoding="utf-8") as fh:
                line = fh.readline()
            if line.strip():
                keys = list(_json.loads(line).keys())
                return StructType(
                    [StructField(k, _parse_datatype_string("string"), True)
                     for k in keys]
                )
        raise ValueError(
            "jsonl_stream: pass .schema(...) or point at a non-empty dir"
        )

    def simpleStreamReader(self, schema: StructType):
        return _JSONLStreamReader(schema, self.options.get("path"))


class _JSONLStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, schema: StructType, path: str):
        if not path:
            raise ValueError("jsonl_stream requires option('path', ...)")
        self._schema = schema
        self._path = path

    def _files(self) -> list[str]:
        if not os.path.isdir(self._path):
            return []
        return sorted(
            os.path.join(self._path, f)
            for f in os.listdir(self._path)
            if f.endswith(".jsonl")
        )

    def initialOffset(self) -> dict:
        return {"last": ""}

    def _rows_of(self, files: list[str]):
        names = [f.name for f in self._schema.fields]
        types = {f.name: f.dataType for f in self._schema.fields}
        for p in files:
            with open(p, encoding="utf-8") as fh:
                for line in fh:
                    if not line.strip():
                        continue
                    rec = _json.loads(line)
                    yield tuple(
                        _coerce(rec.get(n), types[n]) for n in names
                    )

    def read(self, start: dict):
        # a LIST iterator, not a generator: Spark's prefetcher caches
        # and copy.copy()s the returned iterator for replay (list
        # iterators pickle/copy; generators don't), and latestOffset
        # calls next() on it (so a bare list fails too)
        last = start.get("last", "")
        new = [
            p for p in self._files() if os.path.basename(p) > last
        ]
        nxt = {"last": os.path.basename(new[-1]) if new else last}
        return iter(list(self._rows_of(new))), nxt

    def readBetweenOffsets(self, start: dict, end: dict):
        # deterministic replay after restart: (start, end] names the
        # same file set whenever producers emit monotonically-sorting
        # names — late early-sorting arrivals are ≤ the watermark and
        # excluded on both the first read and the replay
        lo, hi = start.get("last", ""), end.get("last", "")
        files = [
            p
            for p in self._files()
            if lo < os.path.basename(p) <= hi
        ]
        return iter(list(self._rows_of(files)))

    def commit(self, end: dict) -> None:
        # no source-side state to clean: offsets live in the query WAL
        pass
