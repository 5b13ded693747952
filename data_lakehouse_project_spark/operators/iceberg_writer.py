"""APPEND writer for FOREIGN Iceberg v2 tables: commit a new snapshot
into a table some other engine (spark-iceberg, pyiceberg, …) created —
the Iceberg twin of ``delta_writer.append_to_delta``, completing the
two-format interop symmetry (read / stream / incremental / maintain /
export / append).

Spec obligations, gated refuse-don't-corrupt:

* ``format-version`` 2 only (v1 tables have no data sequence numbers;
  mixing this writer's v2-shaped manifests into one would corrupt the
  ordering — refuse, don't guess).
* Identity partition transforms only (same bound as the exporter);
  data files CONTAIN the partition columns (Iceberg, unlike Delta/
  hive, stores them in the files) AND the manifest entries carry the
  typed partition struct — staging duplicates the partition columns
  into hidden ``__part_*`` twins for ``partitionBy`` so the real
  columns stay in the parquet.
* Every written file is stamped with ``parquet.field.id`` (spec:
  "Columns in Iceberg data files are selected by field id").
* Column bounds from the written footers encode as the spec's binary
  single-values, so foreign readers file-skip the appended data.
* The new manifest list re-lists the current snapshot's manifests
  verbatim (original ``added_snapshot_id`` / sequence attribution —
  the spec's manifest-inheritance rule) plus one new ADDED manifest
  at ``last-sequence-number + 1``; existing position/equality delete
  manifests carry forward and, per the sequence rule, do NOT apply to
  the strictly-newer appended rows.
* The new ``v{N+1}.metadata.json`` is created with ``open(..., 'x')``
  — a concurrent committer racing to the same metadata version fails
  cleanly (callers own retries).
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid as _uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .iceberg_export import (
    _AVRO_OF,
    _AvroWriter,
    _encode_bound,
    _partition_value,
)
from .iceberg_reader import (
    UnsupportedIcebergFeature,
    _current_schema,
    _latest_metadata_file,
    _spark_schema,
    avro_records,
    load_iceberg_metadata,
)
from .txnlog import _file_stats

_MANIFEST_FILE_AVRO = json.dumps(
    {
        "type": "record",
        "name": "manifest_file",
        "fields": [
            {"name": "manifest_path", "type": "string", "field-id": 500},
            {"name": "manifest_length", "type": "long", "field-id": 501},
            {"name": "partition_spec_id", "type": "int", "field-id": 502},
            {"name": "content", "type": "int", "field-id": 517},
            {"name": "sequence_number", "type": "long", "field-id": 515},
            {
                "name": "min_sequence_number",
                "type": "long",
                "field-id": 516,
            },
            {"name": "added_snapshot_id", "type": "long", "field-id": 503},
            {"name": "added_files_count", "type": "int", "field-id": 504},
            {
                "name": "existing_files_count",
                "type": "int",
                "field-id": 505,
            },
            {"name": "deleted_files_count", "type": "int", "field-id": 506},
            {"name": "added_rows_count", "type": "long", "field-id": 512},
            {
                "name": "existing_rows_count",
                "type": "long",
                "field-id": 513,
            },
            {"name": "deleted_rows_count", "type": "long", "field-id": 514},
        ],
    }
)


def append_to_iceberg(
    spark: SparkSession, df: DataFrame, table_path: str
) -> dict:
    """Append ``df``'s rows to the foreign Iceberg table as one
    ``append`` snapshot; returns ``{"snapshot_id", "files", "rows",
    "metadata"}``."""
    table_path = os.path.abspath(table_path)
    md_file = _latest_metadata_file(table_path)
    md = load_iceberg_metadata(table_path)
    if md.get("format-version") != 2:
        raise UnsupportedIcebergFeature(
            f"format-version {md.get('format-version')} append is not "
            "supported (v2 only — v1 has no data sequence numbers)"
        )
    schema_fields = _current_schema(md)["fields"]
    spark_schema = _spark_schema(spark, md, field_ids=True)
    missing = [
        f.name for f in spark_schema.fields if f.name not in df.columns
    ]
    extra = [c for c in df.columns if c not in spark_schema.names]
    if missing or extra:
        raise ValueError(
            f"schema mismatch: table needs {missing or 'nothing'}, "
            f"extra in DataFrame: {extra or 'nothing'}"
        )

    specs = {s["spec-id"]: s for s in md.get("partition-specs", [])}
    spec = specs.get(md.get("default-spec-id", 0), {"fields": []})
    by_id = {f["id"]: f for f in schema_fields}
    part_fields = []
    for pf in spec.get("fields", []):
        if pf.get("transform") != "identity":
            raise UnsupportedIcebergFeature(
                f"partition transform {pf.get('transform')!r} is not "
                "supported by this writer (identity only)"
            )
        src = by_id.get(pf["source-id"])
        if src is None:
            raise UnsupportedIcebergFeature(
                f"partition source field id {pf['source-id']} not in "
                "the current schema"
            )
        part_fields.append(pf | {"_src_name": src["name"],
                                 "_src_type": src["type"]})

    ids_of = {f["name"]: int(f["id"]) for f in schema_fields}
    staged = df.select(
        *[
            F.col(f.name).cast(f.dataType).alias(
                f.name, metadata={"parquet.field.id": ids_of[f.name]}
            )
            for f in spark_schema.fields
        ],
        # hidden twins keep the REAL columns inside the data files
        *[
            F.col(pf["_src_name"]).cast("string").alias(
                f"__part_{pf['_src_name']}"
            )
            for pf in part_fields
        ],
    )

    meta_dir = os.path.join(table_path, "metadata")
    data_dir = os.path.join(table_path, "data")
    os.makedirs(data_dir, exist_ok=True)
    tmp = os.path.join(table_path, f".tmp-append-{_uuid.uuid4()}")
    ts = int(time.time() * 1000)
    seq = int(md.get("last-sequence-number", 0)) + 1
    snap_ids = [s["snapshot-id"] for s in md.get("snapshots", [])]
    snapshot_id = (max(snap_ids) + 1) if snap_ids else 1

    from urllib.parse import unquote as _unq

    files: list[tuple[str, dict, dict]] = []  # (abs path, pv, stats)
    n_rows = 0
    try:
        spark.conf.set("spark.sql.parquet.fieldId.write.enabled", "true")
        w = staged.write.mode("overwrite")
        if part_fields:
            w = w.partitionBy(
                *[f"__part_{pf['_src_name']}" for pf in part_fields]
            )
        w.parquet(tmp)
        for dirpath, dirnames, filenames in os.walk(tmp):
            # keep hive k=v partition dirs (the __part_ twins start
            # with an underscore); drop true hidden/marker dirs
            dirnames[:] = [
                d
                for d in dirnames
                if "=" in d or not d.startswith(("_", "."))
            ]
            for fn in sorted(filenames):
                if not fn.endswith(".parquet") or fn.startswith(
                    ("_", ".")
                ):
                    continue
                src = os.path.join(dirpath, fn)
                raw_pv: dict[str, str | None] = {}
                for seg in os.path.relpath(src, tmp).split(os.sep)[:-1]:
                    k, _, v = seg.partition("=")
                    raw_pv[_unq(k)[len("__part_"):]] = (
                        None
                        if v == "__HIVE_DEFAULT_PARTITION__"
                        else _unq(v)
                    )
                dst = os.path.join(
                    data_dir, f"append-{_uuid.uuid4()}.parquet"
                )
                os.replace(src, dst)
                st = _file_stats(dst)
                n_rows += st.get("num_rows", 0)
                files.append((dst, raw_pv, st))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    # ---- new manifest (schema shape shared with iceberg_export) ----
    partition_avro = {
        "type": "record",
        "name": "r102",
        "fields": [
            {
                "name": pf["name"],
                "type": ["null", _AVRO_OF.get(pf["_src_type"], "string")],
                "default": None,
                "field-id": pf["field-id"],
            }
            for pf in part_fields
        ],
    }
    data_file_avro = {
        "type": "record",
        "name": "r2",
        "fields": [
            {"name": "content", "type": "int", "field-id": 134},
            {"name": "file_path", "type": "string", "field-id": 100},
            {"name": "file_format", "type": "string", "field-id": 101},
            {"name": "partition", "type": partition_avro,
             "field-id": 102},
            {"name": "record_count", "type": "long", "field-id": 103},
            {"name": "file_size_in_bytes", "type": "long",
             "field-id": 104},
            {
                "name": "lower_bounds",
                "type": ["null", {"type": "array", "items": {
                    "type": "record", "name": "k126_v127",
                    "fields": [
                        {"name": "key", "type": "int", "field-id": 126},
                        {"name": "value", "type": "bytes",
                         "field-id": 127},
                    ]}}],
                "default": None,
                "field-id": 125,
            },
            {
                "name": "upper_bounds",
                "type": ["null", {"type": "array", "items": {
                    "type": "record", "name": "k129_v130",
                    "fields": [
                        {"name": "key", "type": "int", "field-id": 129},
                        {"name": "value", "type": "bytes",
                         "field-id": 130},
                    ]}}],
                "default": None,
                "field-id": 128,
            },
        ],
    }
    manifest_entry_avro = json.dumps(
        {
            "type": "record",
            "name": "manifest_entry",
            "fields": [
                {"name": "status", "type": "int", "field-id": 0},
                {"name": "snapshot_id", "type": ["null", "long"],
                 "default": None, "field-id": 1},
                {"name": "sequence_number", "type": ["null", "long"],
                 "default": None, "field-id": 3},
                {"name": "file_sequence_number",
                 "type": ["null", "long"], "default": None,
                 "field-id": 4},
                {"name": "data_file", "type": data_file_avro,
                 "field-id": 2},
            ],
        }
    )
    manifest_path = os.path.join(meta_dir, f"{_uuid.uuid4().hex}-m0.avro")
    wm = _AvroWriter(
        spark,
        manifest_entry_avro,
        manifest_path,
        {
            "schema": json.dumps(_current_schema(md)),
            "partition-spec": json.dumps(
                [
                    {k: v for k, v in pf.items()
                     if not k.startswith("_")}
                    for pf in part_fields
                ]
            ),
            "partition-spec-id": str(md.get("default-spec-id", 0)),
            "format-version": "2",
            "content": "data",
        },
    )
    for dst, raw_pv, st in files:
        lower: list[dict] = []
        upper: list[dict] = []
        for fld in schema_fields:
            cst = st.get("columns", {}).get(fld["name"])
            if not cst:
                continue
            for key, dest in (("min", lower), ("max", upper)):
                if key in cst and cst[key] is not None:
                    b = _encode_bound(cst[key], fld["type"])
                    if b is not None:
                        dest.append(
                            {"key": fld["id"],
                             "value": b.decode("latin-1")}
                        )
        part_vals = {
            pf["name"]: _partition_value(
                "identity", raw_pv.get(pf["_src_name"]),
                pf["_src_type"],
            )
            for pf in part_fields
        }
        wm.append_dict(
            {
                "status": 1,  # ADDED
                "snapshot_id": snapshot_id,
                "sequence_number": seq,
                "file_sequence_number": seq,
                "data_file": {
                    "content": 0,
                    "file_path": dst,
                    "file_format": "PARQUET",
                    "partition": part_vals,
                    "record_count": st.get("num_rows", 0),
                    "file_size_in_bytes": os.path.getsize(dst),
                    "lower_bounds": lower or None,
                    "upper_bounds": upper or None,
                },
            }
        )
    wm.close()

    # ---- new manifest list: prior manifests verbatim + the new one
    snaps = {s["snapshot-id"]: s for s in md.get("snapshots", [])}
    parent = md.get("current-snapshot-id")
    prior: list[dict] = []
    if parent in snaps:
        mlist = snaps[parent]["manifest-list"]
        if not os.path.isabs(mlist):
            mlist = os.path.join(table_path, mlist)
        prior, _ = avro_records(spark, mlist)
    list_path = os.path.join(
        meta_dir, f"snap-{snapshot_id}-1-{_uuid.uuid4().hex}.avro"
    )
    wl = _AvroWriter(
        spark, _MANIFEST_FILE_AVRO, list_path, {"format-version": "2"}
    )
    min_seq = seq
    for m in prior:
        row = {
            "manifest_path": m["manifest_path"],
            "manifest_length": m.get("manifest_length", 0),
            "partition_spec_id": m.get("partition_spec_id", 0),
            "content": m.get("content", 0),
            "sequence_number": m.get("sequence_number", 0),
            "min_sequence_number": m.get("min_sequence_number", 0),
            "added_snapshot_id": m.get("added_snapshot_id", 0),
            "added_files_count": m.get("added_files_count", 0),
            "existing_files_count": m.get("existing_files_count", 0),
            "deleted_files_count": m.get("deleted_files_count", 0),
            "added_rows_count": m.get("added_rows_count", 0),
            "existing_rows_count": m.get("existing_rows_count", 0),
            "deleted_rows_count": m.get("deleted_rows_count", 0),
        }
        min_seq = min(min_seq, row["min_sequence_number"] or seq)
        wl.append_dict(row)
    wl.append_dict(
        {
            "manifest_path": manifest_path,
            "manifest_length": os.path.getsize(manifest_path),
            "partition_spec_id": md.get("default-spec-id", 0),
            "content": 0,
            "sequence_number": seq,
            "min_sequence_number": seq,
            "added_snapshot_id": snapshot_id,
            "added_files_count": len(files),
            "existing_files_count": 0,
            "deleted_files_count": 0,
            "added_rows_count": n_rows,
            "existing_rows_count": 0,
            "deleted_rows_count": 0,
        }
    )
    wl.close()

    # ---- new metadata version (exclusive create = commit point) ----
    new_md = dict(md)
    snap_entry = {
        "snapshot-id": snapshot_id,
        "timestamp-ms": ts,
        "sequence-number": seq,
        "manifest-list": list_path,
        "summary": {
            "operation": "append",
            "added-data-files": str(len(files)),
            "added-records": str(n_rows),
        },
        "schema-id": md.get("current-schema-id", 0),
    }
    if parent is not None and parent in snaps:
        snap_entry["parent-snapshot-id"] = parent
    new_md["snapshots"] = list(md.get("snapshots", [])) + [snap_entry]
    # snapshot-log is optional in the prior metadata, but once WE
    # write one it becomes authoritative for ordering — so a partial
    # log would shadow the older snapshots.  Synthesize the full
    # chain from the prior ordering (the same rule _snapshot_order
    # applies), then append the new head.
    prior_log = list(md.get("snapshot-log", []))
    if len(prior_log) < len(snaps):
        from .iceberg_reader import _snapshot_order

        prior_log = [
            {
                "snapshot-id": sid,
                "timestamp-ms": snaps[sid]["timestamp-ms"],
            }
            for sid in _snapshot_order(md)
            if sid in snaps
        ]
    new_md["snapshot-log"] = prior_log + [
        {"snapshot-id": snapshot_id, "timestamp-ms": ts}
    ]
    new_md["current-snapshot-id"] = snapshot_id
    new_md["last-sequence-number"] = seq
    new_md["last-updated-ms"] = ts
    cur_v = int(os.path.basename(md_file)[1:].split(".")[0])
    new_path = os.path.join(meta_dir, f"v{cur_v + 1}.metadata.json")
    try:
        with open(new_path, "x") as fh:
            json.dump(new_md, fh)
    except FileExistsError:
        for dst, _, _ in files:  # roll staged data + metadata back
            try:
                os.remove(dst)
            except OSError:
                pass
        for p in (manifest_path, list_path):
            try:
                os.remove(p)
            except OSError:
                pass
        raise ValueError(
            f"concurrent commit detected at metadata v{cur_v + 1}; "
            "retry the append against the new snapshot"
        ) from None
    with open(os.path.join(meta_dir, "version-hint.text"), "w") as fh:
        fh.write(str(cur_v + 1))
    return {
        "snapshot_id": snapshot_id,
        "files": len(files),
        "rows": n_rows,
        "metadata": new_path,
    }
