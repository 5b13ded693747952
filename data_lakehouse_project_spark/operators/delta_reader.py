"""Reader for EXTERNAL Delta-protocol transaction logs.

``operators/txnlog.py`` writes a Delta-protocol-shaped ``_delta_log``
(JSON commits + parquet checkpoints); this module closes the opposite
direction: consume a ``_delta_log`` written by ANY protocol-compliant
writer (delta-spark, delta-rs, ...) and expose the table as a
DataFrame.  It follows the published delta-io PROTOCOL.md reader
rules — no reference-repo code is involved (the reference,
Noureddineblbli/data-lakehouse-project, has no table format at all;
this is part of the SURVEY §2.8 "modern lakehouse" north star).

Reader semantics implemented
----------------------------
* **Snapshot reconstruction**: newest checkpoint at or before the
  target version (discovered via ``_last_checkpoint``, falling back
  to a log-dir listing) + contiguous JSON commits after it.  All
  three published checkpoint layouts replay: classic single-part
  (``V.checkpoint.parquet``), classic multi-part
  (``%020d.checkpoint.%010d.%010d.parquet``), and **V2 UUID-named
  manifests** (``V.checkpoint.<uuid>.parquet|json``) whose
  ``sidecar`` actions pull file state from
  ``_delta_log/_sidecars/*.parquet``.  ``add`` minus ``remove`` by
  path, last ``metaData`` / ``protocol`` wins, ``txn`` high-water
  marks kept.
* **Protocol gating** (the spec's hard rule — readers MUST refuse
  tables they cannot read correctly): ``minReaderVersion`` 1 is
  accepted; 2 requires column mapping to be absent/none; 3 requires
  every ``readerFeatures`` entry to be in ``SUPPORTED_READER_FEATURES``.
  Column-mapping mode ``name``/``id`` is rejected with
  ``UnsupportedDeltaFeature`` rather than silently mis-read.
* **Deletion vectors**: ``add.deletionVector`` descriptors (inline
  ``i``, UUID-derived ``u``, absolute-path ``p`` storage) are decoded
  from the protocol's Z85 + RoaringBitmapArray portable format
  (``operators/dv.py``) and applied as a ``_metadata.row_index``
  anti-join, so CoW-free deletes written by modern Delta writers read
  back correctly.
* **Partition columns from the LOG, not the directory layout**: Delta
  data files do not contain partition columns; their values live only
  in ``add.partitionValues`` (string-serialized per spec).  The scan
  reads files with the physical (non-partition) schema and joins the
  partition values back over ``_metadata.file_path`` via a broadcast
  map — one row per file, the same driver-side file-level metadata
  Delta itself holds, so no reliance on hive-style dir names.
* **Time travel**: by version, or by timestamp over
  ``commitInfo.timestamp`` (commit-file mtime fallback, as the spec
  prescribes for logs without in-commit timestamps).

Scale posture: state reconstruction is O(active files) on the driver —
identical to OSS Delta / delta-rs, whose drivers also materialize the
file list; the checkpoint bounds JSON replay to
``CHECKPOINT_INTERVAL``-ish commits, and file-skipping ``prune``
reuses the same stats/partition pruning as the internal reader so
Spark never lists pruned files.
"""

from __future__ import annotations

import glob
import json
import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from .txnlog import (
    LOG_DIR,
    _VERSION_DIGITS,
    _file_may_match,
    _parse_add,
    _parse_meta,
    _parse_remove,
    _schema_from_json,
)

# Reader-version-3 table features this reader implements correctly.
# timestampNtz: Spark reads TIMESTAMP_NTZ parquet natively.
# vacuumProtocolCheck: imposes no read-path behavior by design.
# deletionVectors: honored — roaring-bitmap DVs are decoded
#   (operators/dv.py) and applied as a _metadata.row_index anti-join.
# v2Checkpoint: UUID-named checkpoint manifests (parquet or json)
#   with sidecar files are replayed by _read_v2_checkpoint_state.
# variantType: Spark 4 reads the variant parquet encoding natively
#   through the explicit-schema scan (probed + pinned in
#   test_variant_column_reads); SHREDDED variants advertise a
#   separate feature (variantShredding) and stay refused.
# typeWidening: the explicit-schema scan upcasts EVERY widening the
#   spec allows (int->long/double, float->double, decimal precision
#   AND scale widening, date->timestamp_ntz — full matrix probed and
#   pinned in test_type_widening_reads), so files written with the
#   pre-widening type read back as the current schema's type.
# Everything else (variantShredding, catalogManaged, ...) must be
# REFUSED, not ignored.
SUPPORTED_READER_FEATURES = {
    # columnMapping: "name" and "id" modes are implemented (physical
    # names / parquet field-id resolution); the mode-specific gate in
    # _check_protocol still refuses any OTHER mode, so advertising the
    # feature here is consistent with the minReaderVersion=2 path.
    "columnMapping",
    "timestampNtz",
    "vacuumProtocolCheck",
    "deletionVectors",
    "v2Checkpoint",
    "variantType",
    "typeWidening",
    "typeWidening-preview",
}


class UnsupportedDeltaFeature(ValueError):
    """The table requires a reader capability this engine lacks; per
    the Delta protocol the reader must refuse rather than mis-read."""


class CorruptDeltaLog(ValueError):
    """The log violates protocol invariants (gap in versions, no
    commits, missing protocol/metaData)."""


@dataclass
class DeltaSnapshot:
    version: int
    files: list[dict]  # internal add dicts (path/stats/partition_values)
    schema_json: str | None
    partition_columns: list[str]
    configuration: dict
    protocol: dict
    timestamp_ms: int
    txns: dict = field(default_factory=dict)

    @property
    def num_rows(self) -> int:
        """LOGICAL row count: physical stats minus each file's
        deletion-vector cardinality (stats.numRecords counts rows the
        DV has already deleted)."""
        return sum(
            f.get("stats", {}).get("num_rows", 0)
            - int((f.get("foreign_dv") or {}).get("cardinality", 0))
            for f in self.files
        )


# ---------------------------------------------------------------- log layout


def _log_dir(table_path: str) -> str:
    return os.path.join(table_path, LOG_DIR)


def _commit_versions(table_path: str) -> list[int]:
    """Versions with a JSON commit file, ascending."""
    out = []
    for p in glob.glob(os.path.join(_log_dir(table_path), "*.json")):
        stem = os.path.basename(p)[: -len(".json")]
        if len(stem) == _VERSION_DIGITS and stem.isdigit():
            out.append(int(stem))
    return sorted(out)


def _checkpoint_parts(table_path: str) -> dict[int, list[str]]:
    """version -> sorted CLASSIC part files, for single- and
    multi-part classic checkpoints (``V.checkpoint.parquet`` and
    ``V.checkpoint.NNNNNNNNNN.MMMMMMMMMM.parquet``).  V2 UUID-named
    checkpoints (``V.checkpoint.<uuid>.parquet|json``) are a different
    format — mixing one into a classic part list would silently drop
    its sidecar state — and are listed by ``_v2_checkpoints``."""
    found: dict[int, list[str]] = {}
    for p in glob.glob(
        os.path.join(_log_dir(table_path), "*.checkpoint*.parquet")
    ):
        name = os.path.basename(p)
        bits = name.split(".")
        if not (bits[0].isdigit() and len(bits[0]) == _VERSION_DIGITS):
            continue
        if bits[1] != "checkpoint" or bits[-1] != "parquet":
            continue
        if len(bits) == 4 and not bits[2].isdigit():
            continue  # v2 UUID name
        if len(bits) == 5 and not (
            bits[2].isdigit() and bits[3].isdigit()
        ):
            continue
        found.setdefault(int(bits[0]), []).append(p)
    return {v: sorted(ps) for v, ps in found.items()}


def _v2_checkpoints(table_path: str) -> dict[int, list[str]]:
    """version -> v2 UUID-named checkpoint manifests (parquet or
    json), each one COMPLETE on its own (spec: writers may leave
    several at one version; any is usable)."""
    found: dict[int, list[str]] = {}
    for ext in ("parquet", "json"):
        for p in glob.glob(
            os.path.join(_log_dir(table_path), f"*.checkpoint.*.{ext}")
        ):
            bits = os.path.basename(p).split(".")
            if (
                len(bits) == 4
                and bits[0].isdigit()
                and len(bits[0]) == _VERSION_DIGITS
                and bits[1] == "checkpoint"
                and not bits[2].isdigit()
            ):
                found.setdefault(int(bits[0]), []).append(p)
    return {v: sorted(ps) for v, ps in found.items()}


def _last_checkpoint_version(table_path: str) -> int | None:
    """The ``_last_checkpoint`` pointer, if present and readable. Only
    an accelerator — a corrupt pointer falls back to listing."""
    p = os.path.join(_log_dir(table_path), "_last_checkpoint")
    try:
        with open(p) as fh:
            return int(json.load(fh)["version"])
    except (OSError, ValueError, KeyError, TypeError):
        return None


# ------------------------------------------------------------- action intake


def _check_protocol(protocol: dict, configuration: dict) -> None:
    reader = int(protocol.get("minReaderVersion", 1))
    if reader > 3:
        raise UnsupportedDeltaFeature(
            f"minReaderVersion {reader} exceeds the supported protocol"
        )
    mapping = (configuration or {}).get("delta.columnMapping.mode", "none")
    if mapping not in ("none", "", "name", "id"):
        # "name": physical names from schemaString metadata; "id":
        # parquet field-id resolution (Spark's fieldId.read path).
        raise UnsupportedDeltaFeature(
            f"column mapping mode '{mapping}' is not supported"
        )
    if reader >= 3:
        missing = [
            f
            for f in protocol.get("readerFeatures") or []
            if f not in SUPPORTED_READER_FEATURES
        ]
        if missing:
            raise UnsupportedDeltaFeature(
                f"table requires reader features {missing}; supported: "
                f"{sorted(SUPPORTED_READER_FEATURES)}"
            )


def _intake_add(raw: dict) -> dict:
    """Foreign ``add`` -> internal dict.  Spec ``deletionVector``
    descriptors are kept (decoded at scan time by ``operators/dv.py``);
    the INTERNAL writer's non-protocol DV layout (``lakehouse.dv``
    tag) is refused here — it is not roaring-format data, and ignoring
    it would resurrect deleted rows (such tables route through the
    internal replayer via ``sources.readers.read_delta``)."""
    parsed = _parse_add(raw)
    if parsed.get("dv"):
        raise UnsupportedDeltaFeature(
            "add action carries a lakehouse.dv internal deletion "
            "vector; read this table through the internal replayer "
            "(read_delta routes it automatically)"
        )
    if raw.get("deletionVector"):
        dv = {
            k: v for k, v in raw["deletionVector"].items() if v is not None
        }
        if not dv.get("storageType") or "pathOrInlineDv" not in dv:
            raise UnsupportedDeltaFeature(
                f"malformed deletionVector descriptor {dv!r}"
            )
        parsed["foreign_dv"] = dv
    # row tracking (writer feature): fresh row ids / commit versions
    # derive from these per-add fields; surfaced by
    # read_delta_table(row_ids=True)
    for src, dst in (
        ("baseRowId", "base_row_id"),
        ("defaultRowCommitVersion", "default_row_commit_version"),
    ):
        if raw.get(src) is not None:
            parsed[dst] = int(raw[src])
    return parsed


class _CheckpointState:
    __slots__ = ("adds", "meta_raw", "protocol_raw", "txns")

    def __init__(self):
        self.adds: dict[str, dict] = {}
        self.meta_raw = None
        self.protocol_raw = None
        self.txns: dict[str, int] = {}

    def intake(self, row: dict) -> None:
        """One checkpoint row/action into the state. ``remove`` rows in
        any checkpoint are expired-tombstone bookkeeping only and never
        contribute to the snapshot."""
        if row.get("add"):
            a = {k: v for k, v in row["add"].items() if v is not None}
            for m in ("partitionValues", "tags"):
                if isinstance(a.get(m), list):  # pa map -> dict
                    a[m] = dict(a[m])
            parsed = _intake_add(a)
            self.adds[parsed["path"]] = parsed
        elif row.get("metaData"):
            m = {
                k: v for k, v in row["metaData"].items() if v is not None
            }
            for mm in ("configuration",):
                if isinstance(m.get(mm), list):
                    m[mm] = dict(m[mm])
            if isinstance(m.get("format"), dict) and isinstance(
                m["format"].get("options"), list
            ):
                m["format"]["options"] = dict(m["format"]["options"])
            self.meta_raw = m
        elif row.get("protocol"):
            self.protocol_raw = {
                k: v for k, v in row["protocol"].items() if v is not None
            }
        elif row.get("txn"):
            t = row["txn"]
            self.txns[t["appId"]] = max(
                self.txns.get(t["appId"], -1), t["version"]
            )

    def result(self):
        return self.adds, self.meta_raw, self.protocol_raw, self.txns


def _read_checkpoint_state(part_files: list[str]):
    """Replay state from a classic parquet checkpoint (all parts):
    returns (adds_by_path, meta_raw, protocol_raw, txns)."""
    import pyarrow.parquet as pq

    st = _CheckpointState()
    for part in part_files:
        for row in pq.read_table(part).to_pylist():
            st.intake(row)
    return st.result()


def _read_v2_checkpoint_state(manifest_path: str, table_path: str):
    """Replay state from a V2 UUID-named checkpoint (spec: V2 Spec
    Checkpoints): the manifest (parquet or json) carries
    ``checkpointMetadata``, protocol/metaData/txn, optionally inline
    add/remove, and ``sidecar`` actions pointing at parquet files under
    ``_delta_log/_sidecars/`` that hold the file actions.  A missing
    sidecar is a hard error — silently skipping one would drop live
    files from the snapshot."""
    import pyarrow.parquet as pq

    st = _CheckpointState()
    sidecars: list[str] = []
    expect_version = int(os.path.basename(manifest_path).split(".")[0])

    def _row(row: dict) -> None:
        cm = row.get("checkpointMetadata")
        if cm:
            v = cm.get("version")
            if v is not None and int(v) != expect_version:
                raise CorruptDeltaLog(
                    f"v2 checkpoint {manifest_path} declares version "
                    f"{v}, file name says {expect_version}"
                )
            return
        sc = row.get("sidecar")
        if sc:
            p = sc["path"]
            if not os.path.isabs(p):
                p = os.path.join(_log_dir(table_path), "_sidecars", p)
            sidecars.append(p)
            return
        st.intake(row)

    if manifest_path.endswith(".json"):
        with open(manifest_path) as fh:
            for line in fh:
                line = line.strip()
                if line:
                    _row(json.loads(line))
    else:
        for row in pq.read_table(manifest_path).to_pylist():
            _row(row)
    for sc in sidecars:
        if not os.path.exists(sc):
            raise CorruptDeltaLog(
                f"v2 checkpoint sidecar missing: {sc}"
            )
        for row in pq.read_table(sc).to_pylist():
            st.intake(row)
    return st.result()


def _read_commit_actions(table_path: str, version: int):
    """One foreign JSON commit -> (adds, removes, commit_info_raw,
    meta_raw, protocol_raw, txns, cdc)."""
    adds, removes, txns, cdc = [], [], [], []
    info = meta_raw = protocol_raw = None
    fname = os.path.join(
        _log_dir(table_path), f"{version:0{_VERSION_DIGITS}d}.json"
    )
    with open(fname) as fh:
        for line in fh:
            line = line.strip()
            if not line:
                continue
            action = json.loads(line)
            if "add" in action:
                adds.append(_intake_add(action["add"]))
            elif "remove" in action:
                removes.append(_parse_remove(action["remove"]))
            elif "commitInfo" in action:
                info = action["commitInfo"]
            elif "metaData" in action:
                meta_raw = action["metaData"]
            elif "protocol" in action:
                protocol_raw = action["protocol"]
            elif "txn" in action:
                txns.append(action["txn"])
            elif "cdc" in action:
                cdc.append(action["cdc"])
    return adds, removes, info, meta_raw, protocol_raw, txns, cdc


def sniff_commit_metadata(table_path: str, version: int) -> dict | None:
    """Parse ONLY the ``metaData`` action of one commit file.

    Routing (``sources.readers.read_delta``) needs the newest
    ``metaData.configuration`` to decide internal-vs-foreign BEFORE any
    feature gating runs; ``_read_commit_actions`` would validate every
    ``add`` on the way (and refuse e.g. internal ``lakehouse.dv`` tags),
    so this sniff never touches non-metaData lines."""
    fname = os.path.join(
        _log_dir(table_path), f"{version:0{_VERSION_DIGITS}d}.json"
    )
    with open(fname) as fh:
        for line in fh:
            line = line.strip()
            if not line:
                continue
            action = json.loads(line)
            if "metaData" in action:
                return action["metaData"]
    return None


def sniff_commit_meta_protocol(
    table_path: str, version: int
) -> tuple[dict | None, dict | None]:
    """Parse ONLY the ``metaData`` and ``protocol`` actions of one
    commit file — the pair routing/gating needs, without running
    ``_intake_add`` validation over every add line (which would refuse
    e.g. internal ``lakehouse.dv`` tags before the caller even knows
    which reader to route to)."""
    fname = os.path.join(
        _log_dir(table_path), f"{version:0{_VERSION_DIGITS}d}.json"
    )
    meta_raw = protocol_raw = None
    with open(fname) as fh:
        for line in fh:
            line = line.strip()
            if not line:
                continue
            action = json.loads(line)
            if "metaData" in action:
                meta_raw = action["metaData"]
            elif "protocol" in action:
                protocol_raw = action["protocol"]
            if meta_raw is not None and protocol_raw is not None:
                break
    return meta_raw, protocol_raw


def _commit_timestamp_ms(table_path: str, version: int) -> int:
    """``commitInfo.inCommitTimestamp`` when present (the ICT table
    feature's authoritative, monotonic clock — the spec says readers
    MUST prefer it for time travel), else ``commitInfo.timestamp``,
    else commit-file mtime (the spec's fallback ordering clock)."""
    _, _, info, _, _, _, _ = _read_commit_actions(table_path, version)
    if info and isinstance(info.get("inCommitTimestamp"), (int, float)):
        return int(info["inCommitTimestamp"])
    if info and isinstance(info.get("timestamp"), (int, float)):
        return int(info["timestamp"])
    fname = os.path.join(
        _log_dir(table_path), f"{version:0{_VERSION_DIGITS}d}.json"
    )
    return int(os.path.getmtime(fname) * 1000)


# ----------------------------------------------------------------- snapshot


def read_delta_snapshot(
    table_path: str,
    version: int | None = None,
    timestamp_ms: int | None = None,
) -> DeltaSnapshot:
    """Reconstruct the table state at ``version`` / ``timestamp_ms``
    (default: latest) from a foreign ``_delta_log``."""
    versions = _commit_versions(table_path)
    classic_cp = _checkpoint_parts(table_path)
    v2_cp = _v2_checkpoints(table_path)
    checkpoints = set(classic_cp) | set(v2_cp)
    if not versions and not checkpoints:
        raise CorruptDeltaLog(f"no _delta_log commits at {table_path}")

    latest = max(versions[-1] if versions else -1, max(checkpoints, default=-1))
    if timestamp_ms is not None:
        best = None
        for v in versions:
            if _commit_timestamp_ms(table_path, v) <= timestamp_ms:
                best = v
            else:
                break
        if best is None:
            raise ValueError(
                f"no commit at or before timestamp_ms={timestamp_ms}"
            )
        version = best
    elif version is None:
        version = latest
    elif version > latest or (
        version not in versions and version not in checkpoints
    ):
        raise ValueError(f"version {version} not present in the log")

    # -- bootstrap from the newest usable checkpoint <= version
    active: dict[str, dict] = {}
    meta_raw = protocol_raw = None
    txns: dict[str, int] = {}
    start = versions[0] if versions else 0
    ts = 0
    hinted = _last_checkpoint_version(table_path)
    candidates = sorted(
        (c for c in checkpoints if c <= version), reverse=True
    )
    if hinted is not None and hinted in checkpoints and hinted <= version:
        candidates.remove(hinted)
        candidates.insert(0, hinted)
    done = False
    for c in candidates:
        # classic parts first, then each self-complete v2 manifest
        attempts = []
        if c in classic_cp:
            attempts.append(("classic", classic_cp[c]))
        for m in v2_cp.get(c, []):
            attempts.append(("v2", m))
        for kind, ref in attempts:
            try:
                if kind == "classic":
                    active, meta_raw, protocol_raw, txns = (
                        _read_checkpoint_state(ref)
                    )
                else:
                    active, meta_raw, protocol_raw, txns = (
                        _read_v2_checkpoint_state(ref, table_path)
                    )
            except UnsupportedDeltaFeature:
                raise
            except Exception:  # torn file, schema drift: next candidate
                continue
            start = c + 1
            done = True
            break
        if done:
            break

    # -- contiguous JSON replay after the bootstrap point
    replay = [v for v in versions if start <= v <= version]
    expected = list(range(start, version + 1))
    if replay != expected:
        raise CorruptDeltaLog(
            f"commit gap: need versions {start}..{version}, have {replay}"
        )
    for v in replay:
        adds, removes, info, m_raw, p_raw, vtxns, _ = _read_commit_actions(
            table_path, v
        )
        for r in removes:
            active.pop(r["path"], None)
        for a in adds:
            active[a["path"]] = a
        if m_raw is not None:
            meta_raw = m_raw
        if p_raw is not None:
            protocol_raw = p_raw
        for t in vtxns:
            txns[t["appId"]] = max(txns.get(t["appId"], -1), t["version"])
        if info and isinstance(info.get("inCommitTimestamp"), (int, float)):
            ts = int(info["inCommitTimestamp"])
        elif info and isinstance(info.get("timestamp"), (int, float)):
            ts = int(info["timestamp"])

    if meta_raw is None or protocol_raw is None:
        raise CorruptDeltaLog(
            "log replay produced no metaData/protocol action"
        )
    _check_protocol(protocol_raw, meta_raw.get("configuration") or {})
    meta = _parse_meta(meta_raw)
    return DeltaSnapshot(
        version=version,
        files=list(active.values()),
        schema_json=meta["schema_json"],
        partition_columns=list(meta_raw.get("partitionColumns") or []),
        configuration=dict(meta_raw.get("configuration") or {}),
        protocol=protocol_raw,
        timestamp_ms=ts,
        txns=txns,
    )


# --------------------------------------------------------------- DataFrame


_PHYS_NAME_KEY = "delta.columnMapping.physicalName"
_FIELD_ID_KEY = "delta.columnMapping.id"


def _field_ids(schema_json: str) -> dict[str, int]:
    """Column-mapping ``id`` mode: logical field name -> parquet field
    id from the per-field schemaString metadata.  A field without an
    id cannot be resolved — refuse, never guess by name."""
    out: dict[str, int] = {}
    for f in json.loads(schema_json).get("fields", []):
        fid = (f.get("metadata") or {}).get(_FIELD_ID_KEY)
        if fid is None:
            raise UnsupportedDeltaFeature(
                f"column mapping mode 'id' but field '{f['name']}' "
                "carries no delta.columnMapping.id"
            )
        out[f["name"]] = int(fid)
    return out


def _physical_names(schema_json: str) -> dict[str, str]:
    """Column-mapping ``name`` mode: TOP-LEVEL logical field name ->
    physical parquet column name, from the per-field ``schemaString``
    metadata (``delta.columnMapping.physicalName``, the spec's
    carrier).  Nested mapping is handled by ``_map_schema_json`` (batch
    reader); callers that only resolve top-level names (the streaming
    executor) must gate on ``has_nested_mapping`` themselves."""
    out: dict[str, str] = {}
    for f in json.loads(schema_json).get("fields", []):
        out[f["name"]] = (f.get("metadata") or {}).get(
            _PHYS_NAME_KEY, f["name"]
        )
    return out


def has_nested_mapping(schema_json: str) -> bool:
    """True when any NESTED struct field (any depth, incl. through
    array/map element types) carries a physicalName different from its
    logical name — the case a top-level-only resolver would silently
    mis-read."""

    def _t(t) -> bool:
        if isinstance(t, dict):
            typ = t.get("type")
            if typ == "struct":
                return any(
                    (f.get("metadata") or {}).get(_PHYS_NAME_KEY, f["name"])
                    != f["name"]
                    or _t(f.get("type"))
                    for f in t.get("fields", [])
                )
            if typ == "array":
                return _t(t.get("elementType"))
            if typ == "map":
                return _t(t.get("keyType")) or _t(t.get("valueType"))
        return False

    return any(
        _t(f.get("type"))
        for f in json.loads(schema_json).get("fields", [])
    )


def _map_schema_json(schema_json: str, mode: str) -> dict:
    """schemaString JSON -> the PHYSICAL scan schema (StructType JSON),
    applying column mapping recursively through struct fields at any
    depth (including through array element / map key+value types):

    * ``name``: every struct field renamed to its
      ``delta.columnMapping.physicalName``; other metadata dropped.
    * ``id``: logical names kept, ``parquet.field.id`` metadata stamped
      from ``delta.columnMapping.id`` so Spark's field-id read path
      resolves parquet columns by id at every nesting level.  A field
      without an id cannot be resolved — refuse, never guess by name.
    * ``phys_id``: physical names AND ``parquet.field.id`` metadata at
      every level — the WRITE shape for id-mode tables (delta-spark
      writes physical column names with nested field ids; readers
      resolve by id regardless).
    """

    def _field(f: dict) -> dict:
        f = dict(f)
        md = f.get("metadata") or {}
        if mode == "name":
            f["name"] = md.get(_PHYS_NAME_KEY, f["name"])
            f["metadata"] = {}
        else:
            fid = md.get(_FIELD_ID_KEY)
            if fid is None:
                raise UnsupportedDeltaFeature(
                    f"column mapping mode 'id' but field '{f['name']}' "
                    "carries no delta.columnMapping.id"
                )
            if mode == "phys_id":
                f["name"] = md.get(_PHYS_NAME_KEY, f["name"])
            f["metadata"] = {"parquet.field.id": int(fid)}
        f["type"] = _type(f["type"])
        return f

    def _type(t):
        if isinstance(t, dict):
            typ = t.get("type")
            if typ == "struct":
                return {
                    "type": "struct",
                    "fields": [_field(x) for x in t.get("fields", [])],
                }
            if typ == "array":
                return {**t, "elementType": _type(t["elementType"])}
            if typ == "map":
                return {
                    **t,
                    "keyType": _type(t["keyType"]),
                    "valueType": _type(t["valueType"]),
                }
        return t

    top = json.loads(schema_json)
    return {
        "type": "struct",
        "fields": [_field(f) for f in top.get("fields", [])],
    }


def _spark_path_key():
    """``_metadata.file_path`` -> plain absolute filesystem path.

    Spark renders file_path as a Hadoop URI (``file:/...``) with space
    and ``%`` percent-encoded but literal ``+`` and non-ASCII kept raw
    (probed empirically) — so comparing against driver-side strings
    needs a DECODE on this side, not an encode on the driver side
    (``Path.as_uri()`` quotes ``+``/non-ASCII and would mismatch).
    ``url_decode`` is form-decoding (``+`` -> space), so literal ``+``
    is pre-protected as ``%2B``; the scheme is stripped only as a
    leading anchor, never mid-string."""
    from pyspark.sql import functions as F

    fp = F.regexp_replace(
        F.col("_metadata.file_path"), "^file:(//)?", ""
    )
    return F.url_decode(F.replace(fp, F.lit("+"), F.lit("%2B")))


def _delta_arrow_scan(
    spark: SparkSession, table_path: str, files: list[dict], schema,
    _abs,
) -> DataFrame:
    """Per-file arrow scan plan for a foreign Delta snapshot (no
    column mapping): deletion vectors decode driver-side into dead
    positions (the same O(total cardinality) budget the JVM path's
    anti-join build pays), partitionValues attach as per-file
    consts."""
    import json as _json

    from data_lakehouse_project_spark.sources.arrow_scan import (
        register_arrow_scan,
        write_scan_plan,
    )

    from .dv import resolve_dv_positions

    register_arrow_scan(spark)
    plan_files = []
    for f in files:
        p = _abs(f["path"])
        dead: list[int] = []
        if f.get("foreign_dv"):
            dead = sorted(
                resolve_dv_positions(f["foreign_dv"], table_path)
            )
        consts = {
            k: v
            for k, v in (f.get("partition_values") or {}).items()
            if k in schema.names and v is not None
        }
        plan_files.append(
            {
                "path": p,
                "consts": consts,
                "dead": dead,
                "size": int(f.get("size") or 0),
            }
        )
    plan = write_scan_plan(_json.loads(schema.json()), {}, plan_files)
    return (
        spark.read.format("graft_arrow_scan")
        .option("plan", plan)
        .load()
    )


def read_delta_table(
    spark: SparkSession,
    table_path: str,
    version: int | None = None,
    timestamp_ms: int | None = None,
    prune: list[tuple[str, str, object]] | None = None,
    row_ids: bool = False,
    columns: list[str] | None = None,
) -> DataFrame:
    """DataFrame over a foreign Delta table at ``table_path``.

    ``columns`` projects to the named table columns and — unlike a
    ``.select`` AFTER the read — narrows the arrow fast path's
    DECLARED schema so only those parquet columns are read (Spark
    does not push column pruning into Python data sources).  On the
    JVM path it is a plain select Catalyst prunes anyway.  Prune
    columns are scanned as needed and dropped after the re-apply.

    ``prune`` is the same ``(column, op, value)`` file-skipping list
    the internal reader takes: files whose add-action stats or
    partition values cannot satisfy every predicate are dropped
    driver-side, and the predicates are re-applied as real filters so
    skipping is an IO optimization, never a correctness dependency.

    ``row_ids=True`` surfaces the ROW TRACKING metadata columns
    ``_row_id`` / ``_row_commit_version`` (spec: Row Tracking):
    materialized values from the table's hidden
    ``delta.rowTracking.materialized*ColumnName`` physical columns
    when non-null, else the fresh values ``add.baseRowId + position``
    / ``add.defaultRowCommitVersion``.  A table with no row-tracking
    metadata at all is refused rather than given invented ids.
    """
    from pyspark.sql import functions as F

    snap = read_delta_snapshot(
        table_path, version=version, timestamp_ms=timestamp_ms
    )
    schema = (
        _schema_from_json(spark, snap.schema_json)
        if snap.schema_json
        else None
    )
    if schema is None:
        raise CorruptDeltaLog("metaData carries no schemaString")
    if columns is not None:
        unknown = [c for c in columns if c not in schema.names]
        if unknown:
            raise ValueError(
                f"columns not in table schema: {unknown} "
                f"(have {schema.names})"
            )

    # column mapping "name": the log (stats keys, partitionValues
    # keys) and the parquet columns use PHYSICAL names; the DataFrame
    # exposes logical ones.  phys_of is identity when mapping is off.
    mapping_mode = snap.configuration.get("delta.columnMapping.mode", "none")
    phys_of = {f.name: f.name for f in schema.fields}
    if mapping_mode in ("name", "id"):
        # both modes key partitionValues/stats by PHYSICAL name; "id"
        # additionally resolves parquet columns by field id
        phys_of = _physical_names(snap.schema_json)

    files = snap.files
    if prune:
        prune_phys = [
            (phys_of.get(c, c), op, v) for c, op, v in prune
        ]
        files = [f for f in files if _file_may_match(f, prune_phys)]
    if not files:
        empty = spark.createDataFrame([], schema)
        return empty.select(*columns) if columns is not None else empty

    part_cols = [c for c in snap.partition_columns if c in schema.names]
    from pyspark.sql.types import StructField, StructType

    if mapping_mode == "id":
        # field-id resolution: the scan schema carries LOGICAL names +
        # parquet.field.id metadata AT EVERY NESTING LEVEL; Spark
        # matches file columns by id (probed: names are ignored
        # entirely, nested group fields included), and a data file
        # WITHOUT field ids fails LOUDLY (ignoreMissing stays false —
        # id-mode writers are required to stamp ids).  The conf only
        # affects schemas that carry field-id metadata, so enabling it
        # session-wide is inert for every other scan.
        spark.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")
        mapped = StructType.fromJson(
            _map_schema_json(snap.schema_json, "id")
        )
        physical = StructType(
            [
                mf
                for lf, mf in zip(schema.fields, mapped.fields)
                if lf.name not in part_cols
            ]
        )
    elif mapping_mode == "name":
        # physical names applied recursively (struct members at any
        # depth, through array/map element types); logical names are
        # restored after the scan
        mapped = StructType.fromJson(
            _map_schema_json(snap.schema_json, "name")
        )
        physical = StructType(
            [
                mf
                for lf, mf in zip(schema.fields, mapped.fields)
                if lf.name not in part_cols
            ]
        )
    else:
        physical = StructType(
            [f for f in schema.fields if f.name not in part_cols]
        )

    def _abs(p: str) -> str:
        for pref in ("file://", "file:"):
            if p.startswith(pref):
                p = p[len(pref):]
        return p if os.path.isabs(p) else os.path.join(table_path, p)

    mat_id = mat_ver = None
    if row_ids:
        mat_id = snap.configuration.get(
            "delta.rowTracking.materializedRowIdColumnName"
        )
        mat_ver = snap.configuration.get(
            "delta.rowTracking.materializedRowCommitVersionColumnName"
        )
        if not (
            mat_id
            or mat_ver
            or any(f.get("base_row_id") is not None for f in files)
        ):
            raise UnsupportedDeltaFeature(
                "row_ids=True but the table carries no row-tracking "
                "metadata (no baseRowId on any add, no materialized "
                "row-id columns) — refusing to invent row ids"
            )
        from pyspark.sql.types import LongType

        # the hidden materialized columns are PHYSICAL names outside
        # the logical schema; scan them when configured (files written
        # before materialization surface them as null)
        physical = StructType(
            list(physical.fields)
            + [
                StructField(c, LongType(), True)
                for c in (mat_id, mat_ver)
                if c
            ]
        )

    # high-file-count fast path: the add-action file list is already
    # materialized from the log, so skip Spark's O(files) driver
    # InMemoryFileIndex and scan via per-file arrow partitions
    # (sources/arrow_scan.py) — deletion vectors become per-file dead
    # positions, partition columns per-file consts.  Gated to the
    # plain configuration (no column mapping, no row-id surfacing,
    # coercible partition types); everything else keeps the JVM path.
    from pyspark.sql import types as _T

    from data_lakehouse_project_spark.sources.arrow_scan import (
        arrow_scan_threshold,
    )

    _simple_parts = all(
        isinstance(
            schema[c].dataType,
            (
                _T.StringType, _T.IntegerType, _T.LongType,
                _T.ShortType, _T.DateType, _T.DoubleType,
                _T.FloatType, _T.BooleanType,
            ),
        )
        for c in part_cols
    )
    if (
        mapping_mode == "none"
        and not row_ids
        and _simple_parts
        and len(files) >= arrow_scan_threshold()
    ):
        scan_schema_n = schema
        if columns is not None:
            keep = set(columns) | {
                c for c, _, _ in (prune or []) if c in schema.names
            }
            scan_schema_n = StructType(
                [f for f in schema.fields if f.name in keep]
            )
        df = _delta_arrow_scan(
            spark, table_path, files, scan_schema_n, _abs
        )
        if prune:
            for col, op, val in prune:
                if col not in df.columns:
                    continue
                c = F.col(col)
                df = df.where(
                    {
                        "=": c == val, "<": c < val, "<=": c <= val,
                        ">": c > val, ">=": c >= val,
                        "isnull": c.isNull(),
                        "isnotnull": c.isNotNull(),
                    }[op]
                )
        if columns is not None:
            df = df.select(*columns)
        return df

    paths = [_abs(f["path"]) for f in files]
    df = spark.read.schema(physical).parquet(*paths)

    # _metadata is only resolvable on the raw file scan — materialize
    # the path key (and row index, when DVs exist) as plain columns
    # NOW, before any join rewrites the plan root.
    dv_adds = [f for f in files if f.get("foreign_dv")]
    meta_cols = {"__delta_path": _spark_path_key()}
    if dv_adds:
        meta_cols["__dv_pos"] = F.col("_metadata.row_index")
    if row_ids:
        meta_cols["__rt_pos"] = F.col("_metadata.row_index")
    df = df.withColumns(meta_cols)

    if mapping_mode == "name":
        # restore LOGICAL names: top-level via alias, nested via a
        # positional struct cast (Spark casts struct fields by
        # POSITION, so casting the physical struct to the logical
        # field's dataType renames members at every depth; a
        # same-type cast on flat columns folds away in Catalyst)
        df = df.select(
            *[
                F.col(f"`{phys_of[f.name]}`").cast(f.dataType)
                .alias(f.name)
                for f in schema.fields
                if f.name not in part_cols
            ],
            *[F.col(f"`{c}`") for c in (mat_id, mat_ver) if c],
            *meta_cols.keys(),
        )

    # -- deletion vectors: decode each add's bitmap driver-side (the
    # same O(total cardinality) state the reference reader broadcasts)
    # and drop deleted rows by (file_id, row_index) anti-join.  File
    # paths are dictionary-encoded to small int ids so the positions
    # side carries two ints per deleted row (arrow-built, never Python
    # tuples — 10^8 deletions stay ~1.2 GB, not an OOM of duplicated
    # path strings); broadcast is gated on estimated BYTES, and at
    # large cardinality it degrades to a shuffled anti-join.
    if dv_adds:
        import numpy as np
        import pandas as pd

        from .dv import resolve_dv_positions

        scanned = {os.path.abspath(p) for p in paths}
        fid_rows: list[tuple[str, int]] = []
        id_chunks, pos_chunks = [], []
        for i, f in enumerate(dv_adds):
            fkey = os.path.abspath(_abs(f["path"]))
            if fkey not in scanned:  # refuse-don't-misread guard
                raise CorruptDeltaLog(
                    f"deletion vector targets unscanned file {fkey}"
                )
            positions = resolve_dv_positions(f["foreign_dv"], table_path)
            if not positions:
                continue
            fid_rows.append((fkey, i))
            id_chunks.append(np.full(len(positions), i, dtype=np.int32))
            pos_chunks.append(np.asarray(positions, dtype=np.int64))
        if fid_rows:
            ids = np.concatenate(id_chunks)
            poss = np.concatenate(pos_chunks)
            deleted = spark.createDataFrame(
                pd.DataFrame({"__dv_fid": ids, "__dv_pos": poss})
            )
            if ids.nbytes + poss.nbytes <= 64 << 20:  # ~5.3M rows
                deleted = F.broadcast(deleted)
            fdim = F.broadcast(
                spark.createDataFrame(fid_rows, ["__delta_path", "__dv_fid"])
            )
            # rows of non-DV files get a null fid and survive the
            # anti-join (null keys never match)
            df = (
                df.join(fdim, "__delta_path", "left")
                .join(deleted, ["__dv_fid", "__dv_pos"], "left_anti")
                .drop("__dv_fid")
            )

    if part_cols:
        # partition values live ONLY in the log (spec: data files do
        # not store partition columns). One row per file, broadcast —
        # the same O(files) metadata the driver already holds.
        rows = [
            tuple(
                [os.path.abspath(_abs(f["path"]))]
                + [
                    # partitionValues keys are PHYSICAL names under
                    # column mapping (spec: stats + partition values
                    # are tracked by physical name)
                    (f.get("partition_values") or {}).get(phys_of[c])
                    for c in part_cols
                ]
            )
            for f in files
        ]
        pmap = spark.createDataFrame(
            rows,
            ["__delta_path"] + [f"__pv_{c}" for c in part_cols],
        )
        df = df.join(F.broadcast(pmap), "__delta_path", "left")
        for c in part_cols:
            # spec string serialization (ISO dates, plain decimals,
            # "true"/"false") casts cleanly to the declared type
            df = df.withColumn(
                c, F.col(f"__pv_{c}").cast(schema[c].dataType)
            ).drop(f"__pv_{c}")
    if row_ids:
        from pyspark.sql.types import (
            LongType,
            StringType,
            StructField,
            StructType,
        )

        rt_rows = [
            (
                os.path.abspath(_abs(f["path"])),
                f.get("base_row_id"),
                f.get("default_row_commit_version"),
            )
            for f in files
        ]
        rtmap = spark.createDataFrame(
            rt_rows,
            StructType(
                [
                    StructField("__delta_path", StringType()),
                    StructField("__rt_base", LongType()),
                    StructField("__rt_ver", LongType()),
                ]
            ),
        )
        df = df.join(F.broadcast(rtmap), "__delta_path", "left")
        rid = F.col("__rt_base") + F.col("__rt_pos")
        if mat_id:
            rid = F.coalesce(F.col(f"`{mat_id}`"), rid)
        rver = F.col("__rt_ver")
        if mat_ver:
            rver = F.coalesce(F.col(f"`{mat_ver}`"), rver)
        df = df.select(
            *schema.names,
            rid.alias("_row_id"),
            rver.alias("_row_commit_version"),
        )
    else:
        df = df.select(*schema.names)

    if prune:
        for col, op, val in prune:
            if col not in df.columns:
                continue
            c = F.col(col)
            cond = {
                "=": c == val, "<": c < val, "<=": c <= val,
                ">": c > val, ">=": c >= val,
                "isnull": c.isNull(), "isnotnull": c.isNotNull(),
            }[op]
            df = df.where(cond)
    if columns is not None:
        extra = (
            ["_row_id", "_row_commit_version"] if row_ids else []
        )
        df = df.select(*columns, *extra)
    return df


def delta_file_details(
    spark: SparkSession,
    table_path: str,
    version: int | None = None,
) -> DataFrame:
    """Metadata table over the snapshot's active files (the
    delta-spark ``DESCRIBE DETAIL`` / files-view shape): one row per
    add with path, size, row count, partition values, and
    deletion-vector cardinality — driver metadata only, no data
    scan."""
    from pyspark.sql.types import (
        LongType,
        MapType,
        StringType,
        StructField,
        StructType,
    )

    snap = read_delta_snapshot(table_path, version=version)
    schema = StructType(
        [
            StructField("path", StringType()),
            StructField("size_bytes", LongType()),
            StructField("num_records", LongType()),
            StructField(
                "partition_values", MapType(StringType(), StringType())
            ),
            StructField("dv_cardinality", LongType()),
        ]
    )
    rows = [
        (
            f["path"],
            int(f.get("size_bytes", 0)),
            int(f.get("stats", {}).get("num_rows", 0)),
            {
                k: (None if v is None else str(v))
                for k, v in (f.get("partition_values") or {}).items()
            },
            int((f.get("foreign_dv") or {}).get("cardinality", 0)),
        )
        for f in snap.files
    ]
    return spark.createDataFrame(rows, schema)


def delta_describe_detail(
    table_path: str, version: int | None = None
) -> dict:
    """DESCRIBE DETAIL for a foreign Delta table: format, file/byte
    totals, logical row count (DV-adjusted), partition columns,
    protocol, table properties — driver metadata only."""
    snap = read_delta_snapshot(table_path, version=version)
    return {
        "format": "delta",
        "location": os.path.abspath(table_path),
        "version": snap.version,
        "numFiles": len(snap.files),
        "sizeInBytes": sum(
            int(f.get("size_bytes", 0)) for f in snap.files
        ),
        "numRows": snap.num_rows,
        "numFilesWithDeletionVectors": sum(
            1 for f in snap.files if f.get("foreign_dv")
        ),
        "partitionColumns": list(snap.partition_columns),
        "properties": dict(snap.configuration),
        "minReaderVersion": int(
            snap.protocol.get("minReaderVersion", 1)
        ),
        "minWriterVersion": int(
            snap.protocol.get("minWriterVersion", 2)
        ),
        "lastModified": snap.timestamp_ms,
    }


def delta_history(table_path: str) -> list[dict]:
    """commitInfo of every surviving commit file, oldest first."""
    out = []
    for v in _commit_versions(table_path):
        _, _, info, _, _, _, _ = _read_commit_actions(table_path, v)
        out.append(
            {"version": v, **(info or {})}
            if info is not None
            else {"version": v}
        )
    return out
