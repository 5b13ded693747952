"""APPEND writer for FOREIGN spec-Delta tables: commit new rows into
a ``_delta_log`` some other engine (delta-spark, delta-rs, …) created
— the write-side completion of the interop surface (read →
``delta_reader``, stream → ``delta_stream``, CDF → ``delta_cdf``,
maintain → ``foreign_maintenance``, mirror/export → ``delta_export``).

The Delta protocol's WRITER requirements are version/feature gated the
same refuse-don't-corrupt way the readers gate:

* minWriterVersion 1-2 (``appendOnly`` is a no-op for appends);
  3 enforces CHECK constraints (``delta.constraints.*`` evaluated
  against the incoming rows; one violating row fails the write);
  4-6 legacy features refuse when actually PRESENT (generated-column
  expressions, legacy invariants, identity columns) and pass when the
  version is advertised but unused — exactly delta-spark's rule;
  7 gates on ``writerFeatures`` against ``SUPPORTED_WRITER_FEATURES``.
* Column mapping: ``name`` mode writes parquet under the physical
  column names; ``id`` mode additionally stamps ``parquet.field.id``
  on every written file; ``partitionValues`` are keyed physically.
* Partitioned tables: the data files must NOT contain the partition
  columns (spec), so the staging write uses ``partitionBy`` into a
  hidden temp dir and the committed adds carry the hive-decoded
  ``partitionValues``.
* Stats come from the written files' parquet footers — foreign
  readers file-skip the appended data immediately.
* The commit file is created with ``open(..., 'x')``: a concurrent
  writer racing to the same version fails cleanly instead of
  clobbering (single-writer optimistic commit; no retry loop —
  callers own the retry policy).
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid as _uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .delta_reader import (
    UnsupportedDeltaFeature,
    _field_ids,
    _physical_names,
    read_delta_snapshot,
)
from .txnlog import LOG_DIR, _VERSION_DIGITS, _file_stats, _serialize_add

# Writer-version-7 table features appends are implemented for.
# appendOnly: appends are exactly what it allows.
# invariants / checkConstraints: enforced below (legacy invariant
#   EXPRESSIONS refuse; delta.constraints.* are evaluated).
# columnMapping: physical-name (and field-id) writes implemented.
# deletionVectors / v2Checkpoint / vacuumProtocolCheck / timestampNtz /
#   variantType / typeWidening: impose no append-path obligations
#   beyond what the snapshot reader already validated.
# changeDataFeed: inserts need no cdc files (readers synthesize
#   insert rows from the adds) — spec-compliant as-is.
# Everything else (rowTracking: fresh baseRowIds + the
# rowIdHighWaterMark domain; generatedColumns; identityColumns;
# icebergCompat*; clustering) must REFUSE, not silently skip.
SUPPORTED_WRITER_FEATURES = {
    "appendOnly",
    "invariants",
    "checkConstraints",
    "columnMapping",
    "deletionVectors",
    "v2Checkpoint",
    "vacuumProtocolCheck",
    "timestampNtz",
    "variantType",
    "typeWidening",
    "typeWidening-preview",
    "changeDataFeed",
    "domainMetadata",
}


def _gate_writer(protocol: dict, schema_json: str) -> None:
    writer = int(protocol.get("minWriterVersion", 1))
    if writer >= 7:
        missing = [
            f
            for f in protocol.get("writerFeatures") or []
            if f not in SUPPORTED_WRITER_FEATURES
        ]
        if missing:
            raise UnsupportedDeltaFeature(
                f"table requires writer features {missing}; supported: "
                f"{sorted(SUPPORTED_WRITER_FEATURES)}"
            )
    # legacy writer versions imply features without listing them; the
    # obligations only bind when the feature is actually USED, so gate
    # on presence in the schema metadata (delta-spark's own rule)
    fields = json.loads(schema_json)["fields"]
    for f in fields:
        md = f.get("metadata") or {}
        if "delta.generationExpression" in md:
            raise UnsupportedDeltaFeature(
                f"column {f['name']} carries a generated-column "
                "expression; this writer cannot honor it"
            )
        if "delta.invariants" in md:
            raise UnsupportedDeltaFeature(
                f"column {f['name']} carries a legacy invariant; "
                "this writer cannot honor it"
            )
        if any(k.startswith("delta.identity.") for k in md):
            raise UnsupportedDeltaFeature(
                f"column {f['name']} is an identity column; this "
                "writer cannot allocate its values"
            )


def append_to_delta(
    spark: SparkSession,
    df: DataFrame,
    table_path: str,
) -> dict:
    """Append ``df``'s rows to the foreign Delta table as one commit.

    Returns ``{"version", "files", "rows"}``.  The DataFrame must
    match the table schema by NAME (order-insensitive); each column is
    cast to the declared type — an incompatible cast fails the write,
    never writes garbage.
    """
    table_path = os.path.abspath(table_path)
    snap = read_delta_snapshot(table_path)  # reader+mapping gated
    if snap.schema_json is None:
        raise UnsupportedDeltaFeature("table carries no schemaString")
    _gate_writer(snap.protocol, snap.schema_json)

    from .txnlog import _schema_from_json

    schema = _schema_from_json(spark, snap.schema_json)
    missing = [f.name for f in schema.fields if f.name not in df.columns]
    extra = [c for c in df.columns if c not in schema.names]
    if missing or extra:
        raise ValueError(
            f"schema mismatch: table needs {missing or 'nothing'} "
            f"extra in DataFrame: {extra or 'nothing'}"
        )
    df = df.select(
        *[F.col(f.name).cast(f.dataType).alias(f.name)
          for f in schema.fields]
    )

    # CHECK constraints: a row violates when the expression is FALSE
    # (null passes, SQL CHECK semantics)
    for key, sql in sorted(snap.configuration.items()):
        if not key.startswith("delta.constraints."):
            continue
        bad = df.where(F.expr(sql) == F.lit(False)).limit(1).count()
        if bad:
            raise ValueError(
                f"CHECK constraint {key[len('delta.constraints.'):]} "
                f"({sql}) violated by the appended rows"
            )

    mapping = snap.configuration.get("delta.columnMapping.mode", "none")
    part_cols = list(snap.partition_columns)
    phys_of = {c: c for c in schema.names}
    if mapping in ("name", "id"):
        phys_of = _physical_names(snap.schema_json)
    ids_of = _field_ids(snap.schema_json) if mapping == "id" else {}

    out_cols = []
    for f in schema.fields:
        md = {"parquet.field.id": ids_of[f.name]} if ids_of else None
        out_cols.append(
            F.col(f.name).alias(phys_of[f.name], metadata=md or {})
        )
    staged = df.select(*out_cols)

    tmp = os.path.join(table_path, f".tmp-append-{_uuid.uuid4()}")
    phys_parts = [phys_of[c] for c in part_cols]
    try:
        if ids_of:
            spark.conf.set(
                "spark.sql.parquet.fieldId.write.enabled", "true"
            )
        w = staged.write.mode("overwrite")
        if phys_parts:
            w = w.partitionBy(*phys_parts)
        w.parquet(tmp)

        from urllib.parse import unquote as _unq

        ts = int(time.time() * 1000)
        adds = []
        n_rows = 0
        for dirpath, dirnames, filenames in os.walk(tmp):
            # keep hive k=v partition dirs even when a physical column
            # name starts with an underscore; drop true hidden dirs
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
                pv: dict[str, str | None] = {}
                for seg in os.path.relpath(src, tmp).split(os.sep)[:-1]:
                    k, _, v = seg.partition("=")
                    pv[_unq(k)] = (
                        None
                        if v == "__HIVE_DEFAULT_PARTITION__"
                        else _unq(v)
                    )
                rel = f"part-{_uuid.uuid4()}.parquet"
                os.replace(src, os.path.join(table_path, rel))
                stats = _file_stats(os.path.join(table_path, rel))
                n_rows += stats.get("num_rows", 0)
                adds.append(
                    _serialize_add(
                        {
                            "path": rel,
                            "partition_values": {
                                p: pv.get(p) for p in phys_parts
                            },
                            "size_bytes": os.path.getsize(
                                os.path.join(table_path, rel)
                            ),
                            "stats": stats,
                        },
                        ts,
                    )
                )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    version = snap.version + 1
    commit_info = {
        "timestamp": ts,
        "operation": "WRITE",
        "operationParameters": {"mode": "Append", "partitionBy":
                                json.dumps(part_cols)},
        "engineInfo": "data_lakehouse_project_spark delta writer",
    }
    commit = os.path.join(
        table_path, LOG_DIR, f"{version:0{_VERSION_DIGITS}d}.json"
    )
    try:
        # exclusive create: a concurrent writer racing to this version
        # fails cleanly (optimistic commit, caller owns retries)
        with open(commit, "x") as fh:
            fh.write(json.dumps({"commitInfo": commit_info}) + "\n")
            for a in adds:
                fh.write(json.dumps({"add": a}) + "\n")
    except FileExistsError:
        for a in adds:  # roll the orphaned data files back
            try:
                os.remove(
                    os.path.join(table_path, _unq(a["path"]))
                )
            except OSError:
                pass
        raise ValueError(
            f"concurrent write detected at version {version}; retry "
            "the append against the new snapshot"
        ) from None
    return {"version": version, "files": len(adds), "rows": n_rows}
