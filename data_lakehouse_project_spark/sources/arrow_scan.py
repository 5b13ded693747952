"""Executor-side BATCH scan over an explicit parquet file plan — the
foreign readers' high-file-count fast path.

Why: ``spark.read.parquet(*paths)`` builds a driver ``InMemoryFileIndex``
over N independent paths (listing + status per path) before the first
task runs — the repo's own probes (BASELINE.md round-9 decomposition,
``tools/probe_foreign_readers.py``) show it is ~90% of an 18-25 s
10k-file Iceberg/Delta batch scan, while the streaming sources' per-file
pyarrow partitions plan in ~0.2 s.  At 100 TB / 1M files the file index
IS the readers' bottleneck.  This module gives the batch readers the
same shape the streams already use: the snapshot's file list (already
materialized from manifests/txn log — no listing needed) becomes one
``InputPartition`` per file, and executors read with pyarrow.

Semantics carried per file (all the things the JVM scan path handles
via joins and per-file consts):

* field-id column resolution (Iceberg spec) with name fallback,
* identity-partition / Delta-partition CONSTANT substitution,
* already-dead row positions (position deletes / deletion vectors)
  masked executor-side,
* pre-evolution files surfacing added columns as null.

The plan ships via a JSON spill file (options are string-only), one
entry per data file.  Equality deletes are not applied INSIDE the
source — the readers compose their sequence-ruled anti-join on top of
the emitted provenance columns (``emit_meta``), so they ride this
path too (round 11).

Scan-side IO reduction (round 11):

* **column pruning** — each file's parquet FOOTER is read first and only
  the physical columns resolvable to the plan's declared schema are
  passed as ``columns=`` to the read.  A narrow rollup over a wide
  100 TB table now pays narrow IO on this path too (the JVM path always
  pruned; this path used to read full width and discard).
* **advisory filter pushdown** — ``pushFilters`` records the query's
  AND-of-leaf filters but RETURNS them all, so Spark re-applies every
  filter after the scan.  The recorded copy is translated per-file to a
  pyarrow dataset expression for row-group statistics pruning + early
  row filtering; because Spark re-checks, correctness never depends on
  the translation, and any arrow-side type mismatch falls back to an
  unfiltered read of that file.
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
)

# default file-count gate for the fast path (see module docstring)
ARROW_SCAN_FILE_THRESHOLD = 2000


def arrow_scan_threshold() -> int:
    try:
        return int(
            os.environ.get(
                "SPARK_GRAFT_ARROW_SCAN_FILES",
                ARROW_SCAN_FILE_THRESHOLD,
            )
        )
    except ValueError:
        return ARROW_SCAN_FILE_THRESHOLD


# bundling: one task per ~128 MB (or 256 files) keeps task-launch
# overhead off the tiny-file regime while preserving one-task-per-file
# granularity for large files (measured: 256-file bundles beat 64 at
# 4k tiny files — python-worker startup dominates below that)
BUNDLE_BYTES = 128 << 20
BUNDLE_FILES = 256


class _ArrowScanPartition(InputPartition):
    def __init__(
        self,
        files_json: str,
        schema_json: str,
        ids_json: str,
        emit_meta: bool = False,
    ):
        self.files_json = files_json  # [{path, consts, dead}, ...]
        self.schema_json = schema_json
        self.ids_json = ids_json
        self.emit_meta = emit_meta


class ArrowScanDataSource(DataSource):
    """``format("graft_arrow_scan").option("plan", <json path>)`` —
    see the module docstring.  The plan file holds the declared Spark
    schema, the name→field-id map, and the per-file entries."""

    @classmethod
    def name(cls) -> str:
        return "graft_arrow_scan"

    def _plan(self) -> dict:
        with open(self.options["plan"]) as fh:
            return json.load(fh)

    def schema(self):
        from pyspark.sql.types import (
            LongType,
            StringType,
            StructField,
            StructType,
        )

        plan = self._plan()
        out = StructType.fromJson(plan["schema"])
        if plan.get("emit_meta"):
            # the scan's provenance columns (original file path + row
            # position) — what the JVM path materializes from
            # _metadata; callers join deletes/stamps against these
            out = StructType(
                list(out.fields)
                + [
                    StructField("__ice_path", StringType()),
                    StructField("__ice_pos", LongType()),
                ]
            )
        return out

    def reader(self, schema):
        return _ArrowScanReader(schema, self._plan())


def _filters_to_expr(filters, resolve):
    """AND the translatable leaf filters into one pyarrow dataset
    expression; ``resolve`` maps a declared column name to the physical
    (or post-assembly) column name, or None when the column isn't
    addressable in this context.  Untranslatable filters are simply
    skipped — safe, because ``pushFilters`` returns every filter to
    Spark for re-evaluation (advisory pushdown)."""
    import pyarrow.dataset as pds

    from pyspark.sql.datasource import (
        EqualTo,
        GreaterThan,
        GreaterThanOrEqual,
        In,
        IsNotNull,
        IsNull,
        LessThan,
        LessThanOrEqual,
        Not,
    )

    def leaf(f):
        if isinstance(f, Not):
            c = leaf(f.child)
            return None if c is None else ~c
        attr = getattr(f, "attribute", None)
        if not attr or len(attr) != 1:
            return None  # nested column paths: let Spark handle
        col = resolve(attr[0])
        if col is None:
            return None
        fld = pds.field(col)
        if isinstance(f, IsNull):
            return fld.is_null()
        if isinstance(f, IsNotNull):
            return ~fld.is_null()
        if isinstance(f, In):
            vals = [v for v in f.value if v is not None]
            if len(vals) != len(f.value):
                return None  # null-in-list semantics: punt
            if any(isinstance(v, float) for v in vals):
                return None  # float semantics: see below
            return fld.isin(vals)
        v = getattr(f, "value", None)
        if v is None:
            return None
        if isinstance(v, float):
            # Spark NaN semantics (NaN = NaN is true, NaN > x is true)
            # differ from pyarrow's IEEE comparisons (both false), and
            # rows dropped HERE cannot be resurrected by Spark's
            # re-applied filter — so float comparisons are never
            # translated. A float literal is exactly the
            # float/double-column case: Catalyst casts the literal to
            # the column type before pushing. (r12, ADVICE fix.)
            return None
        if isinstance(f, EqualTo):
            return fld == v
        if isinstance(f, GreaterThan):
            return fld > v
        if isinstance(f, GreaterThanOrEqual):
            return fld >= v
        if isinstance(f, LessThan):
            return fld < v
        if isinstance(f, LessThanOrEqual):
            return fld <= v
        return None

    expr = None
    for f in filters:
        try:
            e = leaf(f)
        except Exception:
            e = None  # advisory: degrade to unfiltered, Spark re-checks
        if e is not None:
            expr = e if expr is None else (expr & e)
    return expr


class _ArrowScanReader(DataSourceReader):
    def __init__(self, schema, plan: dict):
        self._schema = schema
        self._plan = plan
        self._pushed = []

    def pushFilters(self, filters):
        """Advisory pushdown: keep a copy for arrow-side row-group
        pruning, but return EVERY filter so Spark re-applies them —
        correctness never rides on the arrow translation."""
        self._pushed = list(filters)
        return filters

    def partitions(self):
        plan = self._plan
        schema_json = json.dumps(plan["schema"])
        ids_json = json.dumps(plan.get("ids") or {})
        emit_meta = bool(plan.get("emit_meta"))
        out = []
        bundle: list[dict] = []
        nbytes = 0
        for f in plan["files"]:
            sz = int(f.get("size") or 0)
            if bundle and (
                nbytes + sz > BUNDLE_BYTES
                or len(bundle) >= BUNDLE_FILES
            ):
                out.append(
                    _ArrowScanPartition(
                        json.dumps(bundle), schema_json, ids_json,
                        emit_meta,
                    )
                )
                bundle, nbytes = [], 0
            bundle.append(f)
            nbytes += sz
        if bundle:
            out.append(
                _ArrowScanPartition(
                    json.dumps(bundle), schema_json, ids_json,
                    emit_meta,
                )
            )
        return out

    def read(self, partition: _ArrowScanPartition):
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark.sql.types import StructType as _ST

        from data_lakehouse_project_spark.operators.iceberg_reader import (
            _coerce_partition_value,
        )
        from data_lakehouse_project_spark.sources.delta_stream import (
            _arrow_type,
        )

        schema = _ST.fromJson(json.loads(partition.schema_json))
        ids = json.loads(partition.ids_json)
        target = pa.schema(
            [
                pa.field(f.name, _arrow_type(f.dataType))
                for f in schema.fields
            ]
        )
        emit_meta = getattr(partition, "emit_meta", False)
        pushed = getattr(self, "_pushed", None) or []
        for spec in json.loads(partition.files_json):
            consts = spec.get("consts") or {}
            dead = spec.get("dead") or []
            # Footer first: resolve the declared schema against the
            # file's physical columns so the read is column-pruned —
            # a narrow rollup over a wide table reads narrow IO.
            # One dataset handle = ONE footer parse for both the
            # schema and the (possibly filtered) read.
            import pyarrow.dataset as pds

            dset = pds.dataset(spec["path"], format="parquet")
            fschema = dset.schema
            by_id: dict[int, str] = {}
            if ids:  # only an ids-mapped plan (Iceberg) resolves by id
                for af in fschema:
                    fid = (af.metadata or {}).get(b"PARQUET:field_id")
                    if fid is not None:
                        by_id[int(fid)] = af.name
            src_of: dict[str, str] = {}  # declared name -> physical
            for f in target:
                if by_id:  # spec: columns resolve by FIELD ID
                    # (strict — a missing id means the column didn't
                    # exist at write time; a name fallback would
                    # misread renamed columns)
                    s = by_id.get(ids.get(f.name))
                elif f.name in fschema.names:  # name resolution
                    s = f.name
                else:
                    s = None
                if s is not None:
                    src_of[f.name] = s
            needed: list[str] = []
            for s in src_of.values():
                if s not in needed:
                    needed.append(s)
            simple = not dead and not emit_meta
            table = None
            if simple and pushed and needed:
                # row-group stats pruning + early row filter; Spark
                # re-applies every filter, so a translation gap or a
                # type-mismatch fallback can't change results
                expr = _filters_to_expr(
                    pushed, lambda name: src_of.get(name)
                )
                if expr is not None:
                    try:
                        table = dset.to_table(
                            columns=needed, filter=expr
                        )
                    except Exception:
                        table = None  # fall through: unfiltered read
            if table is None:
                if needed:
                    table = dset.to_table(columns=needed)
                else:  # all-consts/null projection: rows only
                    table = pa.table(
                        {
                            "__n": pa.nulls(
                                dset.count_rows(), pa.int8()
                            )
                        }
                    )
            positions = None
            if emit_meta:
                import numpy as np

                positions = np.arange(table.num_rows, dtype=np.int64)
            if dead:
                import numpy as np

                mask = np.ones(table.num_rows, dtype=bool)
                mask[np.asarray(dead, dtype=np.int64)] = False
                table = table.filter(pa.array(mask))
                if positions is not None:
                    positions = positions[mask]
            n = table.num_rows
            cols = []
            for f, sf in zip(target, schema.fields):
                src = src_of.get(f.name)
                if src is not None:
                    cols.append(table.column(src).cast(f.type))
                elif f.name in consts:
                    from data_lakehouse_project_spark.operators.iceberg_reader import (  # noqa: E501
                        UNSUPPORTED_DEFAULT,
                        _raise_unsupported_default,
                    )

                    if consts[f.name] == UNSUPPORTED_DEFAULT:
                        _raise_unsupported_default(f.name)
                    v = _coerce_partition_value(
                        consts[f.name], sf.dataType
                    )
                    cols.append(pa.array([v] * n, f.type))
                else:  # pre-evolution file: new column null
                    cols.append(pa.nulls(n, f.type))
            out = pa.table(cols, schema=target)
            if emit_meta:
                out = out.append_column(
                    "__ice_path",
                    pa.array([spec["path"]] * n, pa.string()),
                ).append_column("__ice_pos", pa.array(positions))
            if pushed and not simple:
                # positions already materialized — safe to drop rows
                # now; declared + const names are all real columns
                names = set(out.column_names)
                expr = _filters_to_expr(
                    pushed, lambda name: name if name in names else None
                )
                if expr is not None:
                    try:
                        out = out.filter(expr)
                    except Exception:
                        pass  # Spark re-applies the filters anyway
            yield from out.to_batches(max_chunksize=1 << 16)


def write_scan_plan(
    schema_json: dict,
    ids: dict[str, int] | None,
    files: list[dict],
    emit_meta: bool = False,
) -> str:
    """Spill a scan plan to a temp JSON file; returns its path.  The
    file outlives this call (lazy DataFrames re-read it at action
    time) and lands in the system temp dir."""
    import tempfile

    fd, path = tempfile.mkstemp(
        prefix="graft_arrow_scan_", suffix=".json"
    )
    with os.fdopen(fd, "w") as fh:
        json.dump(
            {
                "schema": schema_json,
                "ids": ids or {},
                "files": files,
                "emit_meta": emit_meta,
            },
            fh,
            default=str,  # date-typed partition consts -> ISO strings
            # (the executor re-coerces via _coerce_partition_value)
        )
    return path


def register_arrow_scan(spark) -> None:
    """Idempotently register the batch arrow-scan source."""
    spark.dataSource.register(ArrowScanDataSource)
