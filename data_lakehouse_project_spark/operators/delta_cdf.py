"""Change Data Feed over a Delta transaction log.

``read_delta_changes(spark, table, starting_version, ending_version)``
returns every row-level change in the version range with the CDF
contract's metadata columns ``_change_type`` / ``_commit_version`` /
``_commit_timestamp`` — the batch half of delta-spark's
``table_changes``.  Sources, per the published Delta CDF semantics:

* Commits carrying ``cdc`` actions: the change rows come ONLY from the
  referenced ``_change_data`` parquet (which stores its own
  ``_change_type`` column, including ``update_preimage`` /
  ``update_postimage``); add/remove actions in the same commit are
  bookkeeping and contribute nothing.
* Commits without ``cdc``: synthesized exactly as Delta does for
  insert-only/delete-only commits — ``add(dataChange=true)`` rows are
  ``insert``, ``remove(dataChange=true)`` rows are ``delete`` (the
  removed file's bytes must still exist; a vacuumed file is a hard
  error, not an empty result).  A commit that REWRITES files
  (add+remove together, e.g. an update without CDC enabled) is
  refused: synthesizing it as delete+insert would mislabel unchanged
  rows as churn — delta-spark refuses these too.
* ``dataChange=false`` actions (compaction/optimize) contribute
  nothing, per the contract.
* Deletion-vector commits are refused (the per-version DV delta needs
  the previous DV state; mislabeling is worse than refusing).

Partition values for removes, which the log may omit, are recovered
from the RUNNING snapshot state (the removed file's original add
action) — one snapshot reconstruction at ``starting_version - 1``
plus an O(actions) walk, the same bookkeeping Delta's CDF reader does.

Scale posture: the driver touches only log actions; change rows flow
through ordinary parquet scans with per-file metadata attached via
broadcast maps keyed on the decoded ``_metadata.file_path``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from .delta_reader import (
    CorruptDeltaLog,
    UnsupportedDeltaFeature,
    _commit_timestamp_ms,
    _commit_versions,
    _read_commit_actions,
    _spark_path_key,
    read_delta_snapshot,
)
from .txnlog import _schema_from_json

CHANGE_TYPE = "_change_type"
COMMIT_VERSION = "_commit_version"
COMMIT_TS = "_commit_timestamp"


def read_delta_changes(
    spark: SparkSession,
    table_path: str,
    starting_version: int = 0,
    ending_version: int | None = None,
) -> DataFrame:
    """All row-level changes in commits
    ``starting_version..ending_version`` (inclusive; default latest).
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    versions = _commit_versions(table_path)
    if not versions:
        raise CorruptDeltaLog(f"no _delta_log commits at {table_path}")
    end = versions[-1] if ending_version is None else ending_version
    wanted = list(range(starting_version, end + 1))
    have = [v for v in versions if starting_version <= v <= end]
    if have != wanted:
        raise CorruptDeltaLog(
            f"commits {starting_version}..{end} not all present "
            "(vacuumed?)"
        )

    # table shape at the END of the range (CDF reads one schema)
    snap = read_delta_snapshot(table_path, version=end)
    if snap.configuration.get("delta.columnMapping.mode", "none") not in (
        "none", "",
    ):
        raise UnsupportedDeltaFeature(
            "CDF over column-mapped tables is not supported"
        )
    schema = _schema_from_json(spark, snap.schema_json)
    part_cols = [c for c in snap.partition_columns if c in schema.names]
    physical = StructType(
        [f for f in schema.fields if f.name not in part_cols]
    )
    out_schema = StructType(
        list(schema.fields)
        + [
            StructField(CHANGE_TYPE, StringType()),
            StructField(COMMIT_VERSION, LongType()),
            StructField(COMMIT_TS, LongType()),
        ]
    )

    # running file state for remove partition-value recovery
    state: dict[str, dict] = {}
    if starting_version > 0:
        prior = read_delta_snapshot(
            table_path, version=starting_version - 1
        )
        state = {f["path"]: f for f in prior.files}

    def _abs(p: str) -> str:
        for pref in ("file://", "file:"):
            if p.startswith(pref):
                p = p[len(pref):]
        return p if os.path.isabs(p) else os.path.join(table_path, p)

    # (abs_path, version, ts, partition_values) per source kind
    cdc_specs: list[tuple] = []
    ins_specs: list[tuple] = []
    del_specs: list[tuple] = []
    for v in wanted:
        adds, removes, info, _, _, _, cdc = _read_commit_actions(
            table_path, v
        )
        ts = (
            int(info.get("inCommitTimestamp") or info["timestamp"])
            if info
            and isinstance(
                info.get("inCommitTimestamp") or info.get("timestamp"),
                (int, float),
            )
            else _commit_timestamp_ms(table_path, v)
        )
        def _existing(p: str, what: str) -> str:
            ap = _abs(p)
            if not os.path.exists(ap):
                raise CorruptDeltaLog(
                    f"{what} {p} (commit {v}) no longer exists "
                    "(vacuumed) — its change rows cannot be reproduced"
                )
            return ap

        if cdc:
            for c in cdc:
                cdc_specs.append(
                    (
                        _existing(c["path"], "cdc file"),
                        v,
                        ts,
                        c.get("partitionValues") or {},
                    )
                )
        else:
            changed_adds = [
                a for a in adds if a.get("data_change", True)
            ]
            changed_removes = [
                r for r in removes if r.get("data_change", True)
            ]
            if changed_adds and changed_removes:
                raise UnsupportedDeltaFeature(
                    f"commit {v} rewrites files without cdc actions; "
                    "its row-level changes cannot be reconstructed "
                    "(synthesizing delete+insert would mislabel "
                    "unchanged rows)"
                )
            for a in changed_adds:
                if a.get("dv") or a.get("foreign_dv"):
                    raise UnsupportedDeltaFeature(
                        f"commit {v} changes rows via deletion "
                        "vectors; CDF cannot reconstruct the delta"
                    )
                ins_specs.append(
                    (
                        _existing(a["path"], "added file"),
                        v,
                        ts,
                        a.get("partition_values") or {},
                    )
                )
            for r in changed_removes:
                if r.get("dv") or r.get("foreign_dv"):
                    # a removed file that carried a DV had SOME rows
                    # already deleted — synthesizing its whole content
                    # as deletes would over-delete in the feed
                    raise UnsupportedDeltaFeature(
                        f"commit {v} removes rows via deletion "
                        "vectors; CDF cannot reconstruct the delta"
                    )
                pv = r.get("partition_values")
                if pv is None:
                    pv = (state.get(r["path"]) or {}).get(
                        "partition_values"
                    )
                if pv is None and part_cols:
                    raise CorruptDeltaLog(
                        f"remove of {r['path']} at commit {v} carries "
                        "no partition values and the file is not in "
                        "the prior snapshot"
                    )
                del_specs.append(
                    (_existing(r["path"], "removed file"), v, ts, pv or {})
                )
        # advance running state AFTER using it for this commit's removes
        for r in removes:
            state.pop(r["path"], None)
        for a in adds:
            state[a["path"]] = a

    if not (cdc_specs or ins_specs or del_specs):
        return spark.createDataFrame([], out_schema)

    def _attach(df: DataFrame, specs: list[tuple]) -> DataFrame:
        """Join per-file (version, ts, partition values) over the
        decoded file path — one broadcast row per file."""
        rows = [
            tuple(
                [os.path.abspath(p), int(v), int(ts)]
                + [(pv or {}).get(c) for c in part_cols]
            )
            for p, v, ts, pv in specs
        ]
        fmap = spark.createDataFrame(
            rows,
            ["__cdf_path", COMMIT_VERSION, COMMIT_TS]
            + [f"__pv_{c}" for c in part_cols],
        )
        df = df.withColumn("__cdf_path", _spark_path_key()).join(
            F.broadcast(fmap), "__cdf_path", "left"
        )
        for c in part_cols:
            df = df.withColumn(
                c, F.col(f"__pv_{c}").cast(schema[c].dataType)
            )
        return df

    branches: list[DataFrame] = []
    if cdc_specs:
        cdc_schema = StructType(
            list(physical.fields) + [StructField(CHANGE_TYPE, StringType())]
        )
        df = spark.read.schema(cdc_schema).parquet(
            *[p for p, *_ in cdc_specs]
        )
        branches.append(_attach(df, cdc_specs))
    for specs, label in ((ins_specs, "insert"), (del_specs, "delete")):
        if not specs:
            continue
        df = spark.read.schema(physical).parquet(*[p for p, *_ in specs])
        df = df.withColumn(CHANGE_TYPE, F.lit(label))
        branches.append(_attach(df, specs))

    out = branches[0]
    for b in branches[1:]:
        out = out.unionByName(b, allowMissingColumns=True)
    return out.select(
        *schema.names, CHANGE_TYPE, COMMIT_VERSION, COMMIT_TS
    )
