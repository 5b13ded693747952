"""The foreign readers' high-file-count fast path
(sources/arrow_scan.py): per-file arrow partitions instead of Spark's
O(files) driver InMemoryFileIndex.  Every test runs the SAME table
through both paths and requires identical rows — the fast path is an
execution strategy, never a semantics change."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from data_lakehouse_project_spark.operators.delta_export import (
    export_delta_snapshot,
)
from data_lakehouse_project_spark.operators.delta_reader import (
    read_delta_table,
)
from data_lakehouse_project_spark.operators.delta_writer import (
    delete_from_delta,
)
from data_lakehouse_project_spark.operators.iceberg_export import (
    export_iceberg_metadata,
)
from data_lakehouse_project_spark.operators.iceberg_reader import (
    read_iceberg_table,
)
from data_lakehouse_project_spark.operators.iceberg_writer import (
    append_to_iceberg,
    delete_from_iceberg,
)
from data_lakehouse_project_spark.operators.txnlog import TxnTable


def _rows(df):
    return sorted(map(tuple, df.collect()))


@pytest.fixture
def force_fast(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_ARROW_SCAN_FILES", "1")


def _both(monkeypatch, fn):
    monkeypatch.setenv("SPARK_GRAFT_ARROW_SCAN_FILES", "1")
    fast = fn()
    assert "graft_arrow_scan" in fast._jdf.queryExecution().toString()
    monkeypatch.setenv("SPARK_GRAFT_ARROW_SCAN_FILES", "10000000")
    slow = fn()
    assert "graft_arrow_scan" not in slow._jdf.queryExecution().toString()
    return fast, slow


def test_iceberg_fast_path_equals_jvm_path(spark, tmp_path, monkeypatch):
    t = TxnTable(str(tmp_path / "t"))
    df = spark.range(0, 300).selectExpr(
        "id", "CAST(id % 7 AS STRING) AS part", "CAST(id AS DOUBLE) AS v"
    )
    t.write(df, mode="overwrite", partition_by=["part"])
    export_iceberg_metadata(t, spark)
    delete_from_iceberg(spark, t.path, "id % 11 = 3")   # pos deletes
    append_to_iceberg(
        spark,
        spark.createDataFrame(
            [(900, "9", 1.5)], "id long, part string, v double"
        ),
        t.path,
    )
    fast, slow = _both(
        monkeypatch, lambda: read_iceberg_table(spark, t.path)
    )
    assert _rows(fast) == _rows(slow)
    # identity-partition consts surfaced (column absent from files)
    assert fast.where("part = '9'").count() == 1


def test_iceberg_fast_path_prune_reapplies(spark, tmp_path, force_fast):
    t = TxnTable(str(tmp_path / "t"))
    t.write(
        spark.range(0, 100).selectExpr(
            "id", "CAST(id % 3 AS STRING) AS part", "id * 2.0 AS v"
        ),
        mode="overwrite",
        partition_by=["part"],
    )
    export_iceberg_metadata(t, spark)
    got = read_iceberg_table(spark, t.path, prune=[("part", "=", "1")])
    assert got.count() == 33
    assert {r.part for r in got.select("part").distinct().collect()} == {
        "1"
    }


def test_delta_fast_path_equals_jvm_path(spark, tmp_path, monkeypatch):
    t = TxnTable(str(tmp_path / "src"))
    df = spark.range(0, 300).selectExpr(
        "id", "CAST(id % 5 AS STRING) AS part", "CAST(id AS DOUBLE) AS v"
    )
    t.write(df, mode="overwrite", partition_by=["part"])
    out = str(tmp_path / "mirror")
    export_delta_snapshot(spark, t.path, out)
    delete_from_delta(  # deletion vectors -> per-file dead positions
        spark, out, "id % 13 = 4", allow_protocol_upgrade=True
    )
    fast, slow = _both(
        monkeypatch, lambda: read_delta_table(spark, out)
    )
    assert _rows(fast) == _rows(slow)
    assert fast.count() == 277


def test_delta_fast_path_gates_on_partition_type(
    spark, tmp_path, force_fast
):
    """A timestamp-typed partition column (not in the coercible set)
    keeps the JVM path — gating, not silent misreads."""
    t = TxnTable(str(tmp_path / "src"))
    t.write(
        spark.range(0, 10).selectExpr(
            "id", "timestamp'2024-01-02 03:00:00' + make_interval("
            "0,0,0,0,id) AS ts"
        ),
        mode="overwrite",
        partition_by=["ts"],
    )
    out = str(tmp_path / "tsmirror")
    export_delta_snapshot(spark, t.path, out)
    got = read_delta_table(spark, out)
    assert "graft_arrow_scan" not in got._jdf.queryExecution().toString()
    assert got.count() == 10


def test_bundling_groups_small_files(spark, tmp_path, force_fast):
    """10 tiny files bundle into ONE task (far under 128 MB), and the
    rows still come back complete."""
    t = TxnTable(str(tmp_path / "t"))
    t.write(
        spark.range(0, 10).repartition(10).selectExpr(
            "id", "id * 1.0 AS v"
        ),
        mode="overwrite",
    )
    export_iceberg_metadata(t, spark)
    df = read_iceberg_table(spark, t.path)
    assert df.rdd.getNumPartitions() == 1
    assert sorted(r.id for r in df.collect()) == list(range(10))


def test_changelog_scans_route_through_arrow(
    spark, tmp_path, force_fast
):
    """read_iceberg_changelog's insert/delete branches take the arrow
    plan at high file counts (forced via the env gate here) and emit
    the same change rows as the JVM path — provenance columns
    (__ice_path/__ice_pos) join correctly."""
    import os as _os

    from data_lakehouse_project_spark.operators.iceberg_reader import (
        read_iceberg_changelog,
    )

    t = TxnTable(str(tmp_path / "t"))
    t.write(
        spark.range(0, 60).repartition(6).selectExpr(
            "id", "CAST(id % 3 AS STRING) AS part",
            "CAST(id AS DOUBLE) AS v",
        ),
        mode="overwrite",
        partition_by=["part"],
    )
    export_iceberg_metadata(t, spark)
    delete_from_iceberg(spark, t.path, "id % 7 = 2")
    fast = sorted(
        (r._change_type, r.id, r.part)
        for r in read_iceberg_changelog(spark, t.path).collect()
    )
    _os.environ["SPARK_GRAFT_ARROW_SCAN_FILES"] = "10000000"
    slow = sorted(
        (r._change_type, r.id, r.part)
        for r in read_iceberg_changelog(spark, t.path).collect()
    )
    assert fast == slow
    assert all(p is not None for _, _, p in fast)


def test_delta_cdf_plain_branch_routes_through_arrow(
    spark, tmp_path, force_fast
):
    """read_delta_changes' multi-file insert branch takes the arrow
    plan at the file-count gate — change rows identical to the JVM
    path, per-commit metadata attached through the emitted path."""
    import os as _os

    from data_lakehouse_project_spark.operators.delta_cdf import (
        read_delta_changes,
    )

    t = TxnTable(str(tmp_path / "src"))
    t.write(
        spark.range(0, 30).selectExpr(
            "id", "CAST(id % 3 AS STRING) AS part", "id * 1.0 AS v"
        ),
        mode="overwrite",
        partition_by=["part"],
    )
    out = str(tmp_path / "mirror")
    export_delta_snapshot(spark, t.path, out)
    delete_from_delta(
        spark, out, "id % 4 = 1", allow_protocol_upgrade=True
    )

    def _ch():
        return sorted(
            (r._commit_version, r._change_type, r.id, r.part)
            for r in read_delta_changes(spark, out).collect()
        )

    fast = _ch()
    _os.environ["SPARK_GRAFT_ARROW_SCAN_FILES"] = "10000000"
    slow = _ch()
    assert fast == slow
    assert all(p is not None for *_, p in fast)


# ---------------------------------------------------------------------------
# round 11: column pruning + advisory filter pushdown inside the source
# ---------------------------------------------------------------------------


def _direct_read(plan):
    """Drive _ArrowScanReader in-process (what a Spark python worker
    does), so monkeypatching pyarrow observes the executor-side IO."""
    from data_lakehouse_project_spark.sources.arrow_scan import (
        _ArrowScanReader,
    )

    reader = _ArrowScanReader(None, plan)
    parts = reader.partitions()
    import pyarrow as pa

    batches = [b for p in parts for b in reader.read(p)]
    return reader, pa.Table.from_batches(
        batches
    ) if batches else None


def _wide_file(tmp_path, n=100):
    import pyarrow as pa
    import pyarrow.parquet as pq

    cols = {f"c{i}": list(range(n)) for i in range(8)}
    cols["k"] = [i % 5 for i in range(n)]
    path = str(tmp_path / "wide.parquet")
    pq.write_table(pa.table(cols), path, row_group_size=20)
    return path


def test_arrow_scan_reads_only_declared_columns(tmp_path, monkeypatch):
    """A 9-column file with a 2-column declared schema must hit
    pyarrow with columns=<those 2> — the round-11 pruning contract."""
    import pyarrow.parquet as pq
    from pyspark.sql.types import (
        LongType,
        StructField,
        StructType,
    )

    path = _wide_file(tmp_path)
    schema = StructType(
        [StructField("c3", LongType()), StructField("k", LongType())]
    )
    plan = {
        "schema": schema.jsonValue(),
        "ids": {},
        "files": [{"path": path, "consts": {}, "dead": []}],
    }
    import pyarrow.dataset as pds

    seen = []
    orig_factory = pds.dataset

    class _Spy:
        def __init__(self, inner):
            self._inner = inner

        @property
        def schema(self):
            return self._inner.schema

        def count_rows(self, *a, **kw):
            return self._inner.count_rows(*a, **kw)

        def to_table(self, columns=None, **kw):
            seen.append(columns)
            return self._inner.to_table(columns=columns, **kw)

    monkeypatch.setattr(
        pds, "dataset", lambda *a, **kw: _Spy(orig_factory(*a, **kw))
    )
    _, out = _direct_read(plan)
    assert seen == [["c3", "k"]]
    assert out.column_names == ["c3", "k"]
    assert out.num_rows == 100


def test_arrow_scan_all_consts_projection_reads_no_columns(
    tmp_path, monkeypatch
):
    """Projection entirely satisfied by partition consts: only the
    footer is touched for the row count; no column IO."""
    import pyarrow.parquet as pq
    from pyspark.sql.types import StringType, StructField, StructType

    path = _wide_file(tmp_path)
    schema = StructType([StructField("part", StringType())])
    plan = {
        "schema": schema.jsonValue(),
        "ids": {},
        "files": [
            {"path": path, "consts": {"part": "a"}, "dead": [1, 2]}
        ],
    }
    import pyarrow.dataset as pds

    orig_factory = pds.dataset

    class _NoRead:
        def __init__(self, inner):
            self._inner = inner

        @property
        def schema(self):
            return self._inner.schema

        def count_rows(self, *a, **kw):
            return self._inner.count_rows(*a, **kw)

        def to_table(self, *a, **kw):
            raise AssertionError(
                "column IO on an all-consts projection"
            )

    monkeypatch.setattr(
        pds, "dataset",
        lambda *a, **kw: _NoRead(orig_factory(*a, **kw)),
    )
    _, out = _direct_read(plan)
    assert out.num_rows == 98  # 100 minus 2 dead positions
    assert out.column("part").to_pylist()[:2] == ["a", "a"]


def test_arrow_scan_pushed_filters_prune_rows(tmp_path):
    """Pushed filters applied arrow-side on the simple path (row-group
    stats + row filter) AND on the dead/emit_meta path (post-assembly);
    advisory contract means exact row-level filtering here."""
    from pyspark.sql.datasource import EqualTo, GreaterThan
    from pyspark.sql.types import (
        LongType,
        StructField,
        StructType,
    )
    from data_lakehouse_project_spark.sources.arrow_scan import (
        _ArrowScanReader,
    )

    path = _wide_file(tmp_path)
    schema = StructType(
        [StructField("c0", LongType()), StructField("k", LongType())]
    )
    plan = {
        "schema": schema.jsonValue(),
        "ids": {},
        "files": [{"path": path, "consts": {}, "dead": []}],
    }
    reader = _ArrowScanReader(None, plan)
    flt = [EqualTo(("k",), 2), GreaterThan(("c0",), 10)]
    returned = reader.pushFilters(flt)
    assert list(returned) == flt  # advisory: Spark re-applies all
    import pyarrow as pa

    out = pa.Table.from_batches(
        [b for p in reader.partitions() for b in reader.read(p)]
    )
    assert set(out.column("k").to_pylist()) == {2}
    assert min(out.column("c0").to_pylist()) > 10

    # dead-position path: filter applied AFTER masking, rows exact
    plan2 = dict(plan, files=[{"path": path, "consts": {},
                               "dead": [12, 17]}])
    reader2 = _ArrowScanReader(None, plan2)
    reader2.pushFilters([EqualTo(("k",), 2)])
    out2 = pa.Table.from_batches(
        [b for p in reader2.partitions() for b in reader2.read(p)]
    )
    got = sorted(out2.column("c0").to_pylist())
    want = sorted(
        i for i in range(100) if i % 5 == 2 and i not in (12, 17)
    )
    assert got == want


def test_arrow_scan_filter_translation_gap_is_safe(tmp_path):
    """An untranslatable filter (nested path) is skipped arrow-side —
    rows come back unfiltered and Spark's re-application handles it."""
    from pyspark.sql.datasource import EqualTo
    from pyspark.sql.types import LongType, StructField, StructType
    from data_lakehouse_project_spark.sources.arrow_scan import (
        _ArrowScanReader,
    )

    path = _wide_file(tmp_path)
    schema = StructType([StructField("k", LongType())])
    plan = {
        "schema": schema.jsonValue(),
        "ids": {},
        "files": [{"path": path, "consts": {}, "dead": []}],
    }
    reader = _ArrowScanReader(None, plan)
    reader.pushFilters([EqualTo(("a", "b"), 1)])  # nested: skip
    import pyarrow as pa

    out = pa.Table.from_batches(
        [b for p in reader.partitions() for b in reader.read(p)]
    )
    assert out.num_rows == 100


def test_arrow_scan_never_translates_float_filters(tmp_path):
    """r12 ADVICE fix: Spark NaN semantics (NaN > 5.0 is true, NaN = NaN
    is true) differ from pyarrow's IEEE comparisons, and a NaN row
    dropped arrow-side cannot be resurrected by Spark's re-applied
    filter. Float comparisons must therefore never translate — every
    row (including NaN) comes back and Spark decides."""
    import math

    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql.datasource import EqualTo, GreaterThan, In
    from pyspark.sql.types import DoubleType, StructField, StructType
    from data_lakehouse_project_spark.sources.arrow_scan import (
        _ArrowScanReader,
    )

    path = str(tmp_path / "nan.parquet")
    pq.write_table(
        pa.table({"v": pa.array([1.0, float("nan"), 9.0], pa.float64())}),
        path,
    )
    schema = StructType([StructField("v", DoubleType())])
    plan = {
        "schema": schema.jsonValue(),
        "ids": {},
        "files": [{"path": path, "consts": {}, "dead": [],
                   "size": 200}],
    }
    for flt in (
        [GreaterThan(("v",), 5.0)],
        [EqualTo(("v",), float("nan"))],
        [In(("v",), (1.0, 9.0))],
    ):
        reader = _ArrowScanReader(None, plan)
        assert list(reader.pushFilters(flt)) == flt
        out = pa.Table.from_batches(
            [b for p in reader.partitions() for b in reader.read(p)]
        )
        got = out.column("v").to_pylist()
        assert len(got) == 3 and any(math.isnan(x) for x in got)


def test_fast_path_filter_parity_through_spark(
    spark, tmp_path, monkeypatch
):
    """End-to-end through Spark with the session's filter-pushdown conf:
    a filtered narrow aggregate over the fast path equals the JVM
    path's answer."""
    t = TxnTable(str(tmp_path / "t"))
    t.write(
        spark.range(0, 400).selectExpr(
            "id",
            "CAST(id % 7 AS STRING) AS part",
            "CAST(id AS DOUBLE) AS v",
            "id % 13 AS w",
        ),
        mode="overwrite",
        partition_by=["part"],
    )
    export_iceberg_metadata(t, spark)
    delete_from_iceberg(spark, t.path, "id % 11 = 3")

    def q():
        return (
            read_iceberg_table(spark, t.path)
            .where((F.col("w") > 4) & (F.col("part") == "2"))
            .agg(
                F.sum("v").alias("sv"), F.count("*").alias("c")
            )
        )

    fast, slow = _both(monkeypatch, q)
    assert _rows(fast) == _rows(slow)


def test_read_iceberg_table_columns_projection(
    spark, tmp_path, monkeypatch
):
    """columns= narrows the fast path's declared schema (the only
    projection a Python data source sees) — both paths agree, consts
    columns project fine, prune columns scan-then-drop."""
    t = TxnTable(str(tmp_path / "t"))
    t.write(
        spark.range(0, 200).selectExpr(
            "id", "CAST(id % 5 AS STRING) AS part",
            "CAST(id AS DOUBLE) AS v", "id % 9 AS w",
        ),
        mode="overwrite",
        partition_by=["part"],
    )
    export_iceberg_metadata(t, spark)
    fast, slow = _both(
        monkeypatch,
        lambda: read_iceberg_table(
            spark, t.path, columns=["part", "v"],
            prune=[("w", ">", 3)],
        ),
    )
    assert fast.columns == ["part", "v"]
    assert _rows(fast) == _rows(slow)
    assert fast.count() == sum(1 for i in range(200) if i % 9 > 3)
    with pytest.raises(ValueError, match="nope"):
        read_iceberg_table(spark, t.path, columns=["nope"])


def test_read_delta_table_columns_projection(
    spark, tmp_path, monkeypatch
):
    t = TxnTable(str(tmp_path / "src"))
    t.write(
        spark.range(0, 200).selectExpr(
            "id", "CAST(id % 5 AS STRING) AS part",
            "CAST(id AS DOUBLE) AS v",
        ),
        mode="overwrite",
        partition_by=["part"],
    )
    out = str(tmp_path / "mirror")
    export_delta_snapshot(spark, t.path, out)
    delete_from_delta(
        spark, out, "id % 13 = 4", allow_protocol_upgrade=True
    )
    fast, slow = _both(
        monkeypatch,
        lambda: read_delta_table(spark, out, columns=["part", "v"]),
    )
    assert fast.columns == ["part", "v"]
    assert _rows(fast) == _rows(slow)
    with pytest.raises(ValueError, match="nope"):
        read_delta_table(spark, out, columns=["nope"])
