"""Streaming SOURCE over an Iceberg v1/v2 table (Spark 4 Python
DataSource API): ``spark.readStream.format("iceberg_stream")
.option("path", table).load()`` tails the snapshot chain the way
Spark's Iceberg ``SparkMicroBatchStream`` does — micro-batch offsets
are ``(snapshot-id, file-position)`` pairs over the table's ancestry
order, so exactly-once replay falls out of snapshot immutability (a
committed snapshot's ADDED-file list never changes).

Semantics (mirroring the published Iceberg streaming-read contract):

* Each micro-batch ships the data files ADDED by the snapshots in the
  offset range — manifest entries with status ADDED attributed to the
  snapshot (``entry.snapshot_id``, inherited from the manifest's
  ``added_snapshot_id`` when null, the same rule as
  ``read_iceberg_changes``).  One input partition per data file;
  executors read their own parquet via pyarrow (field-id resolution
  when the file carries parquet field ids, name fallback otherwise,
  pre-evolution files surface added columns as null).  The driver
  touches only metadata.
* ``replace`` snapshots (compaction / rewrite) are SKIPPED — the data
  did not logically change, exactly Iceberg's behavior.
* ``delete`` / ``overwrite`` snapshots REFUSE the stream (shipping
  their adds without their deletes would misstate the change set)
  unless ``skipDeleteSnapshots`` / ``skipOverwriteSnapshots`` (also
  spelled ``streaming-skip-delete-snapshots`` /
  ``streaming-skip-overwrite-snapshots``, Iceberg's option names) —
  then the WHOLE snapshot is skipped, Iceberg's documented caveat.
* ``startingSnapshotId`` (exclusive — that snapshot is treated as
  already consumed, matching ``start-snapshot-id`` of the incremental
  batch scan) or ``startingOffset`` = ``earliest`` (default: the full
  append history) / ``latest`` (only snapshots committed after the
  stream starts).
* Backpressure: ``maxFilesPerTrigger`` / ``maxRowsPerTrigger``
  (Iceberg's ``streaming-max-files-per-micro-batch`` /
  ``streaming-max-rows-per-micro-batch``) — soft caps; a batch may
  split MID-snapshot (the offset's ``pos`` is the count of that
  snapshot's added files already consumed) and always ships at least
  one file.

* ``readChangeFeed=true`` (round 9): CHANGELOG streaming — the
  streaming twin of ``read_iceberg_changelog`` and the Iceberg
  counterpart of the Delta stream's CDC relay.  ``delete`` and
  ``overwrite`` snapshots stream their ``delete`` rows (reconstructed
  executor-side from position-delete coordinates the driver resolves
  with the same O(deleted rows) accumulated walk as the batch
  changelog) plus their ``insert`` rows; output carries
  ``_change_type`` / ``_snapshot_id`` / ``_committed_at``; the
  skip/refuse options are moot (deletes are the point); backpressure
  budgets count CHANGE UNITS (insert files + per-target delete
  specs).

The batch halves of this surface are
``operators/iceberg_reader.py::read_iceberg_table`` (snapshot scans,
row-level deletes), ``read_iceberg_changes`` (bounded incremental
append scan), and ``read_iceberg_changelog`` (the CDF equivalent);
the Delta twin is ``sources/delta_stream.py``.
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

from data_lakehouse_project_spark.operators.iceberg_reader import (
    UnsupportedIcebergFeature,
    _current_schema,
    _snapshot_order,
    load_iceberg_metadata,
)

_SIMPLE_SPARK_TYPES = {
    "int": "integer",
    "long": "long",
    "float": "float",
    "double": "double",
    "string": "string",
    "boolean": "boolean",
    "date": "date",
    "timestamp": "timestamp",
    "timestamptz": "timestamp",
    "binary": "binary",
    "uuid": "string",
}


def _session_free_schema(md: dict) -> StructType:
    """Iceberg current schema -> StructType WITHOUT a SparkSession
    (DataSource.schema() may run on a thread with no active session,
    so ``StructType.fromDDL`` is off limits).  Field ids ride along in
    the field metadata for executor-side resolution."""
    import re

    from pyspark.sql import types as T

    fields = []
    for f in _current_schema(md)["fields"]:
        t = f["type"]
        if isinstance(t, str) and t in _SIMPLE_SPARK_TYPES:
            dt = getattr(
                T,
                {
                    "integer": "IntegerType",
                    "long": "LongType",
                    "float": "FloatType",
                    "double": "DoubleType",
                    "string": "StringType",
                    "boolean": "BooleanType",
                    "date": "DateType",
                    "timestamp": "TimestampType",
                    "binary": "BinaryType",
                }[_SIMPLE_SPARK_TYPES[t]],
            )()
        elif isinstance(t, str) and re.fullmatch(
            r"decimal\((\d+),\s*(\d+)\)", t
        ):
            m = re.fullmatch(r"decimal\((\d+),\s*(\d+)\)", t)
            dt = T.DecimalType(int(m.group(1)), int(m.group(2)))
        elif isinstance(t, str) and re.fullmatch(r"fixed\[\d+\]", t):
            dt = T.BinaryType()
        else:
            raise UnsupportedIcebergFeature(
                f"iceberg_stream: column type {t!r} is not supported"
            )
        fields.append(
            T.StructField(
                f["name"],
                dt,
                bool(f.get("required")) is False,
                metadata={"iceberg.field.id": int(f["id"])},
            )
        )
    return StructType(fields)


def _avro(path: str):
    """Pure-Python avro container decode (no SparkSession on the
    streaming driver thread; the JVM fallback is unavailable here —
    a container the Python decoder refuses is a hard error, stated
    rather than misread)."""
    from data_lakehouse_project_spark.operators.avro_decode import (
        read_avro_file,
    )

    return read_avro_file(path)


def _abs_path(table_path: str, p: str) -> str:
    for pref in ("file://", "file:"):
        if p.startswith(pref):
            p = p[len(pref):]
    return p if os.path.isabs(p) else os.path.join(table_path, p)


def _added_files_of_snapshot(
    table_path: str,
    snap: dict,
    *,
    skip_delete: bool,
    skip_overwrite: bool,
) -> list[tuple[str, int, dict, int | None]]:
    """The ``(abs data-file path, record_count, partition struct,
    manifest spec-id)`` list a stream ships for one snapshot, applying
    the skip/refuse policy.  Deterministic order (manifest order, then
    entry order) so offset positions are stable across restarts."""
    op = (snap.get("summary") or {}).get("operation", "append")
    sid = snap["snapshot-id"]
    if op == "replace":
        return []  # compaction: no logical data change — skipped
    if op == "delete":
        if skip_delete:
            return []
        raise UnsupportedIcebergFeature(
            f"snapshot {sid} is a 'delete'; set skipDeleteSnapshots "
            "to skip it (its removed rows cannot stream)"
        )
    if op in ("overwrite", "replace-partitions"):
        if skip_overwrite:
            return []
        raise UnsupportedIcebergFeature(
            f"snapshot {sid} is an '{op}'; set skipOverwriteSnapshots "
            "to skip it (shipping its adds without its deletes would "
            "misstate the change set)"
        )
    if op != "append":
        raise UnsupportedIcebergFeature(
            f"snapshot {sid} operation {op!r} is not streamable"
        )
    mlist = _abs_path(table_path, snap["manifest-list"])
    manifests, _ = _avro(mlist)
    out: list[tuple[str, int, dict, int | None]] = []
    for m in manifests:
        if m.get("content", 0) != 0:
            # a delete manifest CARRIED FORWARD from an older snapshot
            # (manifest lists re-list prior manifests verbatim) does
            # not make this snapshot non-append; only one ADDED here
            # does — its removed rows cannot stream
            if m.get("added_snapshot_id") == sid:
                raise UnsupportedIcebergFeature(
                    f"snapshot {sid} adds a delete manifest; not a "
                    "pure append"
                )
            continue
        entries, _ = _avro(_abs_path(table_path, m["manifest_path"]))
        for e in entries:
            if e.get("status") != 1:  # ADDED only
                continue
            esid = e.get("snapshot_id")
            if esid is None:
                esid = m.get("added_snapshot_id")
            if esid != sid:
                continue
            df_ = e["data_file"]
            if str(df_.get("file_format", "")).upper() != "PARQUET":
                raise UnsupportedIcebergFeature(
                    f"file format {df_.get('file_format')!r} is not "
                    "supported"
                )
            out.append(
                (
                    _abs_path(table_path, df_["file_path"]),
                    int(df_.get("record_count") or 0),
                    df_.get("partition") or {},
                    m.get("partition_spec_id"),
                )
            )
    return out


class _IcebergFilePartition(InputPartition):
    def __init__(
        self,
        path: str,
        schema_json: str,
        ids_json: str,
        consts_json: str = "{}",
        kind: str = "insert",
        positions_json: str = "null",
        stamp_json: str = "null",
    ):
        self.path = path
        self.schema_json = schema_json
        # logical column name -> iceberg field id (current schema);
        # files stamped with parquet field ids resolve through it
        self.ids_json = ids_json
        # identity-partition constants (spec: the partition value
        # replaces an absent source column); raw JSON values coerced
        # to the column type executor-side
        self.consts_json = consts_json
        # changelog mode: "insert" ships the whole file,
        # "delete_pos" ships exactly the listed row positions,
        # "delete_file" ships all rows EXCEPT the listed positions
        self.kind = kind
        self.positions_json = positions_json
        # {"_change_type": ..., "_snapshot_id": ..., "_committed_at":
        # ...} appended executor-side (null = plain append stream)
        self.stamp_json = stamp_json


class IcebergStreamDataSource(DataSource):
    """``spark.readStream.format("iceberg_stream")`` — see module
    doc."""

    @classmethod
    def name(cls) -> str:
        return "iceberg_stream"

    def _table(self) -> str:
        table = self.options.get("path")
        if not table:
            raise ValueError("iceberg_stream requires option('path', ...)")
        return table

    def _opt(self, *names: str, default: str = "") -> str:
        for n in names:
            v = self.options.get(n)
            if v is not None:
                return v
        return default

    def _cdf(self) -> bool:
        return self._opt(
            "readChangeFeed", "read-change-feed"
        ).lower() in ("true", "1", "yes")

    def schema(self) -> StructType:
        base = _session_free_schema(load_iceberg_metadata(self._table()))
        if not self._cdf():
            return base
        from pyspark.sql.types import LongType, StringType, StructField

        return StructType(
            list(base.fields)
            + [
                StructField("_change_type", StringType()),
                StructField("_snapshot_id", LongType()),
                StructField("_committed_at", LongType()),
            ]
        )

    def streamReader(self, schema: StructType):
        table = self._table()
        md = load_iceberg_metadata(table)
        snaps = {s["snapshot-id"]: s for s in md.get("snapshots", [])}
        order = [s for s in _snapshot_order(md) if s in snaps]
        start_sid = -1
        raw = self._opt("startingSnapshotId", "starting-snapshot-id")
        raw_ts = self._opt("startingTimestamp", "stream-from-timestamp")
        mode = self._opt(
            "startingOffset", "starting-offset", default="earliest"
        ).lower()
        if raw:
            sid = int(raw)
            if sid not in order:
                raise ValueError(
                    f"startingSnapshotId {sid} is not an ancestor of "
                    "the current snapshot"
                )
            start_sid = sid
        elif raw_ts:
            # Iceberg's stream-from-timestamp: ship snapshots committed
            # AT OR AFTER the timestamp; everything older is consumed.
            # A timestamp past the newest commit tails only the future.
            want = int(raw_ts)
            older = [
                sid
                for sid in order
                if snaps[sid]["timestamp-ms"] < want
            ]
            start_sid = older[-1] if older else -1
        elif mode == "latest":
            start_sid = order[-1] if order else -1
        elif mode != "earliest":
            raise ValueError(
                f"startingOffset {mode!r}: use 'earliest' or 'latest'"
            )
        truthy = ("true", "1", "yes")
        return _IcebergStreamReader(
            table,
            schema,
            start_sid,
            cdf=self._cdf(),
            skip_delete=self._opt(
                "skipDeleteSnapshots", "streaming-skip-delete-snapshots"
            ).lower()
            in truthy,
            skip_overwrite=self._opt(
                "skipOverwriteSnapshots",
                "streaming-skip-overwrite-snapshots",
            ).lower()
            in truthy,
            max_files=int(
                self._opt(
                    "maxFilesPerTrigger",
                    "streaming-max-files-per-micro-batch",
                    default="0",
                )
            ),
            max_rows=int(
                self._opt(
                    "maxRowsPerTrigger",
                    "streaming-max-rows-per-micro-batch",
                    default="0",
                )
            ),
        )


class _IcebergStreamReader(DataSourceStreamReader):
    def __init__(
        self,
        table: str,
        schema: StructType,
        start_sid: int,
        *,
        cdf: bool = False,
        skip_delete: bool,
        skip_overwrite: bool,
        max_files: int = 0,
        max_rows: int = 0,
    ):
        self._table = table
        self._schema = schema
        self._start_sid = start_sid
        self._cdf = cdf
        self._skip_delete = skip_delete
        self._skip_overwrite = skip_overwrite
        self._max_files = max_files
        self._max_rows = max_rows
        # snapshot-id -> ordered added-file list (snapshots are
        # immutable, so this cache never invalidates)
        self._files: dict[int, list[tuple[str, int]]] = {}
        # changelog mode: snapshot-id -> ordered change-unit list,
        # built strictly in ancestry order so the per-file dead-
        # position accumulator is exact (re-deletes emit once)
        self._units: dict[int, list[tuple]] = {}
        self._dead: dict[str, set[int]] = {}
        # data path -> (partition struct, spec id), recorded at ADD —
        # delete units of LATER snapshots carry their target file's
        # identity-partition consts from here
        self._fparts: dict[str, tuple] = {}
        # data path -> data sequence number (equality-delete rule)
        self._fseq: dict[str, int | None] = {}
        # highest offset already handed out (restart re-sync happens
        # in partitions(), same pattern as the Delta stream source)
        self._handed: dict | None = None

    # ---- offsets: {"snapshot_id": S, "pos": N} = everything before
    # S in ancestry order is consumed, plus S's first N added files
    # (N == len(files(S)) means S is fully consumed). ----

    def initialOffset(self) -> dict:
        if self._start_sid == -1:
            return {"snapshot_id": -1, "pos": 0}
        return {
            "snapshot_id": int(self._start_sid),
            "pos": len(self._items_of(self._start_sid)),
        }

    def _md(self) -> tuple[dict, dict, list[int]]:
        md = load_iceberg_metadata(self._table)
        snaps = {s["snapshot-id"]: s for s in md.get("snapshots", [])}
        order = [s for s in _snapshot_order(md) if s in snaps]
        self._snaps = snaps
        return md, snaps, order

    def _files_of(self, sid: int) -> list[tuple[str, int]]:
        if sid not in self._files:
            if not hasattr(self, "_snaps") or sid not in self._snaps:
                self._md()
            if sid not in self._snaps:
                raise ValueError(
                    f"snapshot {sid} expired from the metadata; the "
                    "stream cannot replay it"
                )
            self._files[sid] = _added_files_of_snapshot(
                self._table,
                self._snaps[sid],
                skip_delete=self._skip_delete,
                skip_overwrite=self._skip_overwrite,
            )
        return self._files[sid]

    def _units_of(self, sid: int) -> list[tuple]:
        """Change units for one snapshot (changelog mode), folding
        every EARLIER snapshot into the dead-position accumulator
        first — exactness over overlapping delete files requires the
        walk to be in ancestry order from the table start."""
        if sid in self._units:
            return self._units[sid]
        _, snaps, order = self._md()
        if sid not in snaps:
            raise ValueError(
                f"snapshot {sid} expired from the metadata; the "
                "stream cannot replay it"
            )
        for s in order:
            if s not in self._units:
                self._units[s] = _change_units_of_snapshot(
                    self._table, snaps[s], self._dead, self._fparts,
                    self._fseq,
                )
            if s == sid:
                break
        return self._units[sid]

    def _items_of(self, sid: int) -> list[tuple]:
        return self._units_of(sid) if self._cdf else self._files_of(sid)

    def _rows_of(self, item: tuple) -> int:
        return int(item[2]) if self._cdf else int(item[1])

    def _cursor(self, off: dict, order: list[int]) -> tuple[int, int]:
        """Offset -> (index into ``order`` of the snapshot the cursor
        sits in, files consumed there). -1 index = before history."""
        sid = off.get("snapshot_id", -1)
        if sid == -1:
            return -1, 0
        if sid not in order:
            raise ValueError(
                f"offset snapshot {sid} is no longer in the table's "
                "ancestry (expired or rolled back); cannot continue "
                "exactly-once"
            )
        return order.index(sid), int(off.get("pos", 0))

    def latestOffset(self) -> dict:
        _, _, order = self._md()
        cur = self._handed or self.initialOffset()
        idx, pos = self._cursor(cur, order)
        file_budget = self._max_files or float("inf")
        row_budget = self._max_rows or float("inf")
        out_idx, out_pos = idx, pos
        took_any = False
        # finish the partially-consumed snapshot first, then advance
        i = idx if idx >= 0 else 0
        while i < len(order):
            if took_any and (file_budget <= 0 or row_budget <= 0):
                break  # budget spent — don't even open the next manifest
            files = self._items_of(order[i])
            p = pos if i == idx else 0
            while p < len(files):
                if took_any and (file_budget <= 0 or row_budget <= 0):
                    break
                file_budget -= 1
                row_budget -= self._rows_of(files[p])
                p += 1
                took_any = True
            out_idx, out_pos = i, p
            if p < len(files):
                break
            i += 1
        if not took_any and out_idx == idx and out_pos == pos:
            self._handed = cur
            return cur
        off = {
            "snapshot_id": int(order[out_idx]) if out_idx >= 0 else -1,
            "pos": int(out_pos),
        }
        self._handed = off
        return off

    def partitions(self, start: dict, end: dict):
        md, _, order = self._md()
        self._handed = end  # restart re-sync for the budget bookkeeping
        s_idx, s_pos = self._cursor(start, order)
        e_idx, e_pos = self._cursor(end, order)
        schema_json = self._schema.json()
        ids = {
            f.name: int(f.metadata["iceberg.field.id"])
            for f in self._schema.fields
            if f.metadata and "iceberg.field.id" in f.metadata
        }
        ids_json = json.dumps(ids)
        # identity-partition constants per file (spec: the manifest's
        # partition value replaces an absent source column)
        from data_lakehouse_project_spark.operators.iceberg_reader import (
            _identity_partition_sources,
            _identity_sources_by_spec,
            _initial_defaults,
        )

        by_spec = _identity_sources_by_spec(md)
        default_ident = _identity_partition_sources(md)
        # v3 initial-defaults ride the consts: the executor fills a
        # const only when the column is physically absent from the
        # file — the spec's pre-evolution condition; ident values win
        dflt = _initial_defaults(md)
        id_of = {v: k for k, v in ids.items()}  # field id -> col name
        parts: list[_IcebergFilePartition] = []

        def _consts_of(part_struct, spec_id) -> str:
            ident = by_spec.get(spec_id, default_ident)
            return json.dumps(
                dict(dflt) | {
                    id_of[fid]: part_struct.get(pname)
                    for fid, pname in ident.items()
                    if fid in id_of and pname in part_struct
                },
                default=str,
            )

        for i in range(max(s_idx, 0), e_idx + 1):
            items = self._items_of(order[i])
            lo = s_pos if i == s_idx else 0
            hi = e_pos if i == e_idx else len(items)
            if not self._cdf:
                for path, _n, part_struct, spec_id in items[lo:hi]:
                    parts.append(
                        _IcebergFilePartition(
                            path, schema_json, ids_json,
                            _consts_of(part_struct, spec_id),
                        )
                    )
                continue
            sid = order[i]
            ts = int(self._snaps[sid]["timestamp-ms"])
            for unit in items[lo:hi]:
                kind = unit[0]
                if kind == "insert":
                    _, path, _n, part_struct, spec_id = unit
                    stamp = {"_change_type": "insert",
                             "_snapshot_id": sid, "_committed_at": ts}
                    parts.append(
                        _IcebergFilePartition(
                            path, schema_json, ids_json,
                            _consts_of(part_struct, spec_id),
                            kind="insert",
                            stamp_json=json.dumps(stamp),
                        )
                    )
                else:  # delete_pos / delete_file
                    _, path, _n, positions, part_struct, spec_id = unit
                    stamp = {"_change_type": "delete",
                             "_snapshot_id": sid, "_committed_at": ts}
                    parts.append(
                        _IcebergFilePartition(
                            path, schema_json, ids_json,
                            _consts_of(part_struct, spec_id),
                            kind=kind,
                            positions_json=json.dumps(list(positions)),
                            stamp_json=json.dumps(stamp),
                        )
                    )
        if not parts:  # Spark requires >= 1 partition per batch
            parts = [_IcebergFilePartition(None, schema_json, ids_json)]
        return parts

    def read(self, partition: _IcebergFilePartition):
        if partition.path is None:
            return iter(())
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark.sql.types import StructType as _ST

        from data_lakehouse_project_spark.sources.delta_stream import (
            _arrow_type,
        )

        from data_lakehouse_project_spark.operators.iceberg_reader import (
            _coerce_partition_value,
        )

        schema = _ST.fromJson(json.loads(partition.schema_json))
        ids = json.loads(partition.ids_json)
        consts = json.loads(partition.consts_json or "{}")
        stamp = json.loads(getattr(partition, "stamp_json", "null"))
        stamp_cols = ("_change_type", "_snapshot_id", "_committed_at")
        if stamp:
            # changelog mode: the declared schema carries the three
            # stamp columns; the parquet carries only the data columns
            schema = _ST(
                [f for f in schema.fields if f.name not in stamp_cols]
            )
        target = pa.schema(
            [
                pa.field(f.name, _arrow_type(f.dataType))
                for f in schema.fields
            ]
        )
        table = pq.read_table(partition.path)
        kind = getattr(partition, "kind", "insert")
        if kind in ("delete_pos", "delete_file"):
            positions = json.loads(partition.positions_json)
            if kind == "delete_pos":
                table = table.take(pa.array(positions, pa.int64()))
            elif positions:
                import numpy as np

                mask = np.ones(table.num_rows, dtype=bool)
                mask[np.asarray(positions, dtype=np.int64)] = False
                table = table.filter(pa.array(mask))
        by_id: dict[int, str] = {}
        for af in table.schema:
            fid = (af.metadata or {}).get(b"PARQUET:field_id")
            if fid is not None:
                by_id[int(fid)] = af.name
        n = table.num_rows
        cols = []
        for f, sf in zip(target, schema.fields):
            src = None
            if by_id:  # spec: columns are selected by FIELD ID
                src = by_id.get(ids.get(f.name))
            elif f.name in table.column_names:  # name-mapping fallback
                src = f.name
            if src is not None:
                cols.append(table.column(src).cast(f.type))
            elif f.name in consts:
                # identity-partition constant / initial-default
                # substitution (spec; presence-gated — only when the
                # column is physically absent from this file)
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
            else:  # pre-evolution file: new column surfaces null
                cols.append(pa.nulls(n, f.type))
        out = pa.table(cols, schema=target)
        if stamp:
            out = out.append_column(
                "_change_type",
                pa.array([stamp["_change_type"]] * n, pa.string()),
            ).append_column(
                "_snapshot_id",
                pa.array([int(stamp["_snapshot_id"])] * n, pa.int64()),
            ).append_column(
                "_committed_at",
                pa.array([int(stamp["_committed_at"])] * n, pa.int64()),
            )
        return iter(out.to_batches(max_chunksize=1 << 16))

    def commit(self, end: dict) -> None:
        pass  # snapshots are durable; nothing to acknowledge


# ---------------------------------------------------------------------
# Changelog (CDF) streaming mode: readChangeFeed=true streams INSERT
# and DELETE rows per snapshot — the streaming twin of
# operators/iceberg_reader.read_iceberg_changelog and the Iceberg
# counterpart of delta_stream's readChangeFeed.  The driver walks
# snapshots in ancestry order accumulating per-file dead positions
# (O(deleted rows), the same budget as the batch changelog), so a
# position re-deleted by an overlapping delete file streams exactly
# once; executors read only their own target parquet.
# ---------------------------------------------------------------------


def _change_units_of_snapshot(
    table_path: str,
    snap: dict,
    dead: dict[str, set[int]],
    fparts: dict[str, tuple] | None = None,
    fseq: dict[str, int | None] | None = None,
) -> list[tuple]:
    """Ordered CHANGE UNITS one snapshot ships in changelog mode,
    mutating ``dead`` (data path -> positions dead so far) and
    ``fparts`` (data path -> (partition struct, spec id), recorded at
    the ADD so later delete units can surface identity partition
    source columns absent from the parquet — the same per-file consts
    the insert units carry):

    * ``("insert", path, rows, part_struct, spec_id)`` — ADDED file
    * ``("delete_pos", path, rows, positions_tuple, part_struct,
      spec_id)`` — newly-dead positions of one target file
    * ``("delete_file", path, rows, prior_dead_tuple, part_struct,
      spec_id)`` — whole-file removal; rows still live before this
      snapshot emit as deletes

    ``replace`` snapshots return no units.  EQUALITY deletes reduce
    to exact position kills at planning time (column-pruned pyarrow
    read of candidate files' key columns under the spec's
    strictly-older sequence rule — ``fseq`` carries each live file's
    data sequence number) and ship as ordinary ``delete_pos`` units.
    Deterministic order (manifest order, entry order, sorted targets)
    so offsets are stable across restarts."""
    op = (snap.get("summary") or {}).get("operation", "append")
    sid = snap["snapshot-id"]
    if op == "replace":
        return []
    if fparts is None:
        fparts = {}
    if fseq is None:
        fseq = {}
    # (path, seq, spec-id, partition-struct) per delete file
    eq_groups: dict[tuple, list[tuple]] = {}
    units: list[tuple] = []
    mlist = _abs_path(table_path, snap["manifest-list"])
    manifests, _ = _avro(mlist)
    for m in manifests:
        if m.get("added_snapshot_id") != sid:
            continue
        entries, _ = _avro(_abs_path(table_path, m["manifest_path"]))
        if m.get("content", 0) == 0:  # data manifest
            for e in entries:
                st = e.get("status")
                df_ = e["data_file"]
                esid = e.get("snapshot_id")
                if esid is None:
                    esid = sid
                p = _abs_path(table_path, df_["file_path"])
                if st == 1 and esid == sid:
                    if str(
                        df_.get("file_format", "")
                    ).upper() != "PARQUET":
                        raise UnsupportedIcebergFeature(
                            f"file format {df_.get('file_format')!r} "
                            "is not supported"
                        )
                    fparts[p] = (
                        df_.get("partition") or {},
                        m.get("partition_spec_id"),
                    )
                    seq_e = e.get("sequence_number")
                    if seq_e is None:
                        seq_e = m.get("sequence_number")
                    fseq[p] = int(seq_e) if seq_e is not None else None
                    units.append(
                        (
                            "insert",
                            p,
                            int(df_.get("record_count") or 0),
                            df_.get("partition") or {},
                            m.get("partition_spec_id"),
                        )
                    )
                elif st == 2:
                    prior = tuple(sorted(dead.pop(p, ())))
                    fseq.pop(p, None)
                    rows = int(df_.get("record_count") or 0) - len(prior)
                    pstr, pspec = fparts.get(p, ({}, None))
                    units.append(
                        ("delete_file", p, max(rows, 0), prior,
                         pstr, pspec)
                    )
            continue
        # delete manifest
        import pyarrow.parquet as _pq

        for e in entries:
            st = e.get("status")
            df_ = e["data_file"]
            esid = e.get("snapshot_id")
            if esid is None:
                esid = sid
            if st != 1 or esid != sid:
                continue
            if df_.get("content", 1) == 2 or df_.get("equality_ids"):
                seq_e = e.get("sequence_number")
                if seq_e is None:
                    seq_e = m.get("sequence_number")
                eq_groups.setdefault(
                    tuple(
                        sorted(
                            int(i)
                            for i in df_.get("equality_ids") or ()
                        )
                    ),
                    [],
                ).append(
                    (
                        _abs_path(table_path, df_["file_path"]),
                        int(seq_e) if seq_e is not None else None,
                        m.get("partition_spec_id"),
                        df_.get("partition") or {},
                    )
                )
                continue
            if (
                str(df_.get("file_format", "")).upper() == "PUFFIN"
                and df_.get("referenced_data_file") is not None
            ):
                # v3 deletion vector: reduce to exact fresh positions
                from data_lakehouse_project_spark.operators.puffin import (
                    dv_positions_of_entry,
                )

                tp = _abs_path(
                    table_path, df_["referenced_data_file"]
                )
                seen = dead.setdefault(tp, set())
                fresh_dv = tuple(
                    sorted(
                        int(x)
                        for x in dv_positions_of_entry(
                            table_path, df_
                        )
                        if int(x) not in seen
                    )
                )
                if fresh_dv:
                    seen.update(fresh_dv)
                    pstr, pspec = fparts.get(tp, ({}, None))
                    units.append(
                        (
                            "delete_pos", tp, len(fresh_dv), fresh_dv,
                            pstr, pspec,
                        )
                    )
                continue
            p = _abs_path(table_path, df_["file_path"])
            tbl = _pq.read_table(p, columns=["file_path", "pos"])
            fresh: dict[str, list[int]] = {}
            for tgt, pos in zip(
                tbl.column("file_path").to_pylist(),
                tbl.column("pos").to_pylist(),
            ):
                tp = _abs_path(table_path, tgt)
                seen = dead.setdefault(tp, set())
                if int(pos) in seen:
                    continue
                seen.add(int(pos))
                fresh.setdefault(tp, []).append(int(pos))
            for tp in sorted(fresh):
                poss = tuple(sorted(fresh[tp]))
                pstr, pspec = fparts.get(tp, ({}, None))
                units.append(
                    ("delete_pos", tp, len(poss), poss, pstr, pspec)
                )
    if eq_groups:
        from data_lakehouse_project_spark.operators.iceberg_reader import (
            _coerce_partition_value,
            _eq_partition_key,
            _field_names_by_id,
            _identity_partition_sources,
            _identity_sources_by_spec,
            equality_kill_positions,
            load_iceberg_metadata,
        )

        md = load_iceberg_metadata(table_path)
        id2name = _field_names_by_id(md)
        # spec-scoped delete entries carry their (spec, partition)
        # key; unpartitioned-spec (GLOBAL) entries carry None
        spec_partitioned = {
            int(sp.get("spec-id", 0)): bool(sp.get("fields"))
            for sp in md.get("partition-specs", [])
        }
        groups = [
            (
                ids,
                [
                    (
                        path_,
                        seq_,
                        _eq_partition_key(dspec_, dpart_)
                        if spec_partitioned.get(int(dspec_ or 0))
                        else None,
                    )
                    for path_, seq_, dspec_, dpart_ in entries_
                ],
            )
            for ids, entries_ in sorted(eq_groups.items())
        ]
        # identity-partition consts for key columns physically absent
        # from data files (the snapshot reader's substitution, here
        # for CDC replay) + per-file partition keys for scoping
        schema_t = _session_free_schema(md)
        n2id = {v: k for k, v in id2name.items()}
        ident_by_spec = _identity_sources_by_spec(md)
        default_ident = _identity_partition_sources(md)
        consts: dict[str, dict[str, object]] = {}
        live_pkey: dict[str, str] = {}
        for p_, (part_, sp_id) in fparts.items():
            live_pkey[p_] = _eq_partition_key(sp_id, part_)
            ident = ident_by_spec.get(sp_id, default_ident)
            cvals = {}
            for col in schema_t.names:
                pfname = ident.get(n2id.get(col))
                if pfname is None:
                    continue
                cvals[col] = _coerce_partition_value(
                    (part_ or {}).get(pfname), schema_t[col].dataType
                )
            if cvals:
                consts[p_] = cvals
        kills = equality_kill_positions(
            groups, fseq, dead, id2name,
            consts=consts, live_pkey=live_pkey,
        )
        for tp in sorted(kills):
            poss = tuple(kills[tp])
            dead.setdefault(tp, set()).update(poss)
            pstr, pspec = fparts.get(tp, ({}, None))
            units.append(
                ("delete_pos", tp, len(poss), poss, pstr, pspec)
            )
    return units
