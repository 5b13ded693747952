"""Round-11 registry additions: the foreign-Iceberg capabilities
this round shipped, value-pinned against plain-SQL oracles —

* a PARTITION-SCOPED keyed upsert (keys cover the identity partition
  source, so the delete manifest carries per-partition tuples under
  the TABLE's spec instead of the global unpartitioned route) read
  back both FULL and PRUNED — the pruned branch exercises the
  reader's driver-side skip of delete application for untouched
  partitions — joined with the changelog's per-partition delete
  counts;
* the incremental append scan DELEGATING a mixed
  append/delete/upsert history to the exact changelog (it used to
  refuse at the first non-append snapshot): per-snapshot-ordinal
  insert rollups, ordinals via dense_rank so snapshot ids never leak
  into the oracle;
* the v3 ROW-LINEAGE round trip (upgrade -> DV delete -> upsert ->
  ``row_lineage=True`` read) with the ``_row_id`` arithmetic itself
  value-pinned;
* a one-snapshot FULL CDC batch (upserts + ``delete_keys``) with
  changelog per-type counts.

All are bounded by nation's size (25 rows at any SF) — the table
format work never touches the fact tables.

Reference scope note: the reference pipeline only writes plain
parquet (spark/jobs/gold_aggregation.py); this is SURVEY §2.9
breadth.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from data_lakehouse_project_spark.sources.readers import load_testdata

_helpers: dict = {}


def _nation(spark, sf_dir):
    return load_testdata(spark, sf_dir, names=("nation",))["nation"].select(
        "n_nationkey", "n_name", "n_regionkey"
    )


def q_foreign_iceberg_scoped_upsert(spark, sf_dir):
    """nation → identity-partitioned (``n_regionkey``) Iceberg export
    → ``upsert_into_iceberg`` keyed on (n_nationkey, n_regionkey) —
    the keys COVER the partition source, so the round-11
    PARTITION-SCOPED route engages: per-partition delete files under
    the table's spec, no appended unpartitioned spec (asserted
    loudly).  Read back FULL (per-region rollup of the final state)
    joined with the changelog's per-region pre-image delete counts,
    and the region-3 row is additionally recomputed through a PRUNED
    read (the reader's delete-application skip for untouched
    partitions) and must agree (asserted loudly)."""
    from data_lakehouse_project_spark.operators.iceberg_export import (
        export_iceberg_metadata,
    )
    from data_lakehouse_project_spark.operators.iceberg_reader import (
        load_iceberg_metadata,
        read_iceberg_changelog,
        read_iceberg_table,
    )
    from data_lakehouse_project_spark.operators.iceberg_writer import (
        upsert_into_iceberg,
    )
    from data_lakehouse_project_spark.operators.txnlog import TxnTable

    nation = _nation(spark, sf_dir)
    tmp = tempfile.mkdtemp(prefix="graft_fscoped_")
    try:
        t = TxnTable(os.path.join(tmp, "src"))
        t.write(nation, mode="overwrite", partition_by=["n_regionkey"])
        export_iceberg_metadata(t, spark)
        src = nation.where("n_nationkey % 4 = 0").select(
            "n_nationkey",
            F.upper("n_name").alias("n_name"),
            "n_regionkey",
        ).unionByName(
            spark.createDataFrame(
                [(2000, "FRESH", 1), (2001, "FRESH", 1)],
                "n_nationkey long, n_name string, n_regionkey long",
            )
        )
        info = upsert_into_iceberg(
            spark, t.path, src, ["n_nationkey", "n_regionkey"]
        )
        assert info["delete_files"] >= 1
        # scoped route: the global fallback would have APPENDED an
        # unpartitioned spec — its absence pins the new path
        md = load_iceberg_metadata(t.path)
        assert all(
            sp.get("fields") for sp in md["partition-specs"]
        ), "unpartitioned spec appended: global route taken"

        back = read_iceberg_table(spark, t.path)
        state = (
            back.groupBy("n_regionkey")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum("n_nationkey").alias("key_sum"),
                F.sum(
                    F.when(
                        F.col("n_name") == F.upper(F.col("n_name")), 1
                    ).otherwise(0)
                ).alias("n_upper"),
            )
        )
        dels = (
            read_iceberg_changelog(spark, t.path)
            .where("_change_type = 'delete'")
            .groupBy("n_regionkey")
            .agg(F.count(F.lit(1)).alias("n_deleted"))
        )
        result = (
            state.join(dels, "n_regionkey", "left")
            .select(
                F.col("n_regionkey").alias("region"),
                "n_rows",
                "key_sum",
                "n_upper",
                F.coalesce("n_deleted", F.lit(0)).alias("n_deleted"),
            )
            .orderBy("region")
        )
        rows = result.collect()
        # pruned read of region 3 must agree with the full read's row
        # (untouched partitions skip delete application driver-side)
        pr = (
            read_iceberg_table(
                spark, t.path, prune=[("n_regionkey", "=", 3)]
            )
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum("n_nationkey").alias("key_sum"),
            )
            .collect()[0]
        )
        full3 = next(r for r in rows if r.region == 3)
        assert (pr.n_rows, pr.key_sum) == (
            full3.n_rows,
            full3.key_sum,
        ), "pruned read disagrees with full read for region 3"
        return spark.createDataFrame(rows, result.schema)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


# final state per region: unreplaced rows keep casing, key%4==0 rows
# uppercase (pre-images counted as deletes), plus two FRESH keys in
# region 1.  n_upper counts all-caps names in the FINAL state — a
# reader that resurrected pre-images (or let a scoped delete leak
# across partitions) shifts n_rows/key_sum; a changelog that dropped
# or duplicated pre-images shifts n_deleted.
SQL_FOREIGN_SCOPED_UPSERT = """
WITH final_state AS (
  SELECT n_regionkey, n_nationkey,
         CASE WHEN n_nationkey % 4 = 0 THEN UPPER(n_name)
              ELSE n_name END AS n_name
  FROM nation
  UNION ALL
  SELECT 1, 2000, 'FRESH'
  UNION ALL
  SELECT 1, 2001, 'FRESH'
),
dels AS (
  SELECT n_regionkey, COUNT(*) AS n_deleted
  FROM nation WHERE n_nationkey % 4 = 0
  GROUP BY n_regionkey
)
SELECT f.n_regionkey AS region,
       COUNT(*) AS n_rows,
       CAST(SUM(f.n_nationkey) AS BIGINT) AS key_sum,
       CAST(SUM(CASE WHEN f.n_name = UPPER(f.n_name) THEN 1 ELSE 0
                END) AS BIGINT) AS n_upper,
       CAST(COALESCE(MAX(d.n_deleted), 0) AS BIGINT) AS n_deleted
FROM final_state f LEFT JOIN dels d ON f.n_regionkey = d.n_regionkey
GROUP BY f.n_regionkey
ORDER BY region
"""


def q_foreign_iceberg_mixed_incremental(spark, sf_dir):
    """nation → Iceberg export → DELETE (n%5==2) → append (3 shifted
    keys) → keyed upsert (2 replaced + 1 fresh) →
    ``read_iceberg_changes`` over the FULL range: a mixed history the
    incremental append scan now DELEGATES to the changelog (round 11)
    instead of refusing.  Snapshot ids never leak into the output —
    snapshots rank into ordinals — and per-ordinal insert rollups pin
    each snapshot's added rows exactly."""
    from pyspark.sql.window import Window

    from data_lakehouse_project_spark.operators.iceberg_export import (
        export_iceberg_metadata,
    )
    from data_lakehouse_project_spark.operators.iceberg_reader import (
        read_iceberg_changes,
    )
    from data_lakehouse_project_spark.operators.iceberg_writer import (
        append_to_iceberg,
        delete_from_iceberg,
        upsert_into_iceberg,
    )
    from data_lakehouse_project_spark.operators.txnlog import TxnTable

    nation = _nation(spark, sf_dir)
    tmp = tempfile.mkdtemp(prefix="graft_fmixinc_")
    try:
        t = TxnTable(os.path.join(tmp, "src"))
        t.write(nation, mode="overwrite")
        export_iceberg_metadata(t, spark)                 # snap 1
        delete_from_iceberg(spark, t.path, "n_nationkey % 5 = 2")
        append_to_iceberg(                                # snap 3
            spark,
            nation.orderBy("n_nationkey").limit(3).select(
                (F.col("n_nationkey") + 200).alias("n_nationkey"),
                F.lit("SHIFTED").alias("n_name"),
                "n_regionkey",
            ),
            t.path,
        )
        src = nation.where("n_nationkey IN (0, 21)").select(
            "n_nationkey",
            F.upper("n_name").alias("n_name"),
            "n_regionkey",
        ).unionByName(
            spark.createDataFrame(
                [(3000, "FRESH", 4)],
                "n_nationkey long, n_name string, n_regionkey long",
            )
        )
        upsert_into_iceberg(                              # snap 4
            spark, t.path, src, ["n_nationkey"]
        )
        inc = read_iceberg_changes(spark, t.path)
        result = (
            inc.withColumn(
                "snap_ord",
                F.dense_rank().over(
                    Window.orderBy("_snapshot_id")
                ),
            )
            .groupBy("snap_ord")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum("n_nationkey").alias("key_sum"),
                F.sum(
                    F.when(
                        F.col("n_name") == F.upper(F.col("n_name")), 1
                    ).otherwise(0)
                ).alias("n_upper"),
            )
            .orderBy("snap_ord")
        )
        rows = result.collect()
        return spark.createDataFrame(rows, result.schema)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


# inserts per snapshot: 1) the 25-row export; 2) the delete emits no
# inserts (no ordinal); 3) the 3 shifted keys; 4) the upsert's 3
# post-images.  dense_rank gives ordinals 1..3 over the snapshots
# that inserted anything.
SQL_FOREIGN_MIXED_INCREMENTAL = """
WITH ins AS (
  SELECT 1 AS snap_ord, n_nationkey, n_name FROM nation
  UNION ALL
  SELECT 2, n_nationkey + 200, 'SHIFTED'
  FROM (SELECT n_nationkey FROM nation ORDER BY n_nationkey LIMIT 3)
  UNION ALL
  SELECT 3, n_nationkey, UPPER(n_name) FROM nation
  WHERE n_nationkey IN (0, 21)
  UNION ALL
  SELECT 3, 3000, 'FRESH'
)
SELECT snap_ord,
       COUNT(*) AS n_rows,
       CAST(SUM(n_nationkey) AS BIGINT) AS key_sum,
       CAST(SUM(CASE WHEN n_name = UPPER(n_name) THEN 1 ELSE 0 END)
            AS BIGINT) AS n_upper
FROM ins
GROUP BY snap_ord
ORDER BY snap_ord
"""


def q_foreign_iceberg_v3_lineage(spark, sf_dir):
    """nation → Iceberg v2 export → ``upgrade_iceberg_to_v3`` (row
    lineage initialized: explicit first_row_id per entry, next-row-id
    counter) → v3 DELETE (puffin deletion vector, never position
    parquet — asserted loudly) → keyed upsert (equality delete + data
    manifest, fresh row ids) → ``row_lineage=True`` read → per-region
    rollup INCLUDING ``_row_id`` arithmetic, so the lineage
    assignment itself is value-pinned: original rows keep ids equal
    to their nationkey order (0..24 in export order), upserted rows
    take 25/26."""
    from data_lakehouse_project_spark.operators.iceberg_reader import (
        iceberg_live_files,
        read_iceberg_table,
    )
    from data_lakehouse_project_spark.operators.iceberg_writer import (
        delete_from_iceberg,
        upgrade_iceberg_to_v3,
        upsert_into_iceberg,
    )
    from data_lakehouse_project_spark.operators.txnlog import TxnTable

    nation = _nation(spark, sf_dir).orderBy("n_nationkey").coalesce(1)
    tmp = tempfile.mkdtemp(prefix="graft_fv3lin_")
    try:
        t = TxnTable(os.path.join(tmp, "src"))
        t.write(nation, mode="overwrite")
        export_md = None
        from data_lakehouse_project_spark.operators.iceberg_export import (
            export_iceberg_metadata,
        )

        export_iceberg_metadata(t, spark)
        del export_md
        info = upgrade_iceberg_to_v3(spark, t.path)
        assert info["rows_assigned"] == 25
        delete_from_iceberg(spark, t.path, "n_nationkey % 7 = 2")
        # v3 deletes are DVs — no new position-delete parquet
        _, _, posd, _ = iceberg_live_files(spark, t.path)
        assert posd and all(f.get("__is_dv") for f in posd), (
            "v3 delete wrote non-DV delete files"
        )
        src = spark.createDataFrame(
            [(3, "UPS3", 1), (77, "FRESH", 2)],
            "n_nationkey long, n_name string, n_regionkey long",
        ).coalesce(1)  # one staged file, source order -> ids 25, 26
        upsert_into_iceberg(spark, t.path, src, ["n_nationkey"])
        back = read_iceberg_table(spark, t.path, row_lineage=True)
        result = (
            back.groupBy("n_regionkey")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum("n_nationkey").alias("key_sum"),
                F.sum("_row_id").alias("row_id_sum"),
                F.max("_row_id").alias("row_id_max"),
            )
            .orderBy("n_regionkey")
            .select(
                F.col("n_regionkey").alias("region"),
                "n_rows",
                "key_sum",
                "row_id_sum",
                "row_id_max",
            )
        )
        rows = result.collect()
        return spark.createDataFrame(rows, result.schema)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


# lineage arithmetic the oracle can mirror: the single-file export in
# nationkey order assigns _row_id == n_nationkey to the original 25
# rows; the v3 delete kills keys %7==2 (rows keep their ids); the
# upsert replaces key 3 and inserts 77, whose rows take the next
# counter values 25 and 26 IN KEY ORDER (one staged file, source
# built key-ascending).  A reader that lost lineage through the DV or
# the upsert shifts row_id_sum/max.
SQL_FOREIGN_V3_LINEAGE = """
WITH survivors AS (
  SELECT n_regionkey, n_nationkey, n_nationkey AS row_id
  FROM nation
  WHERE NOT (n_nationkey % 7 = 2) AND n_nationkey <> 3
),
upserts AS (
  SELECT 1 AS n_regionkey, 3 AS n_nationkey, 25 AS row_id
  UNION ALL
  SELECT 2, 77, 26
),
final_state AS (
  SELECT * FROM survivors UNION ALL SELECT * FROM upserts
)
SELECT n_regionkey AS region,
       COUNT(*) AS n_rows,
       CAST(SUM(n_nationkey) AS BIGINT) AS key_sum,
       CAST(SUM(row_id) AS BIGINT) AS row_id_sum,
       CAST(MAX(row_id) AS BIGINT) AS row_id_max
FROM final_state
GROUP BY n_regionkey
ORDER BY region
"""


def q_foreign_iceberg_cdc_batch(spark, sf_dir):
    """nation → identity-partitioned Iceberg export → ONE
    ``upsert_into_iceberg`` snapshot applying a FULL CDC batch:
    upserts (key%5==0 uppercased + one fresh key) AND deletions
    (``delete_keys``: key%5==1, killed WITHOUT re-inserting — a
    changelog stream's -D rows) → changelog per-type counts joined
    with the final-state rollup."""
    from data_lakehouse_project_spark.operators.iceberg_export import (
        export_iceberg_metadata,
    )
    from data_lakehouse_project_spark.operators.iceberg_reader import (
        read_iceberg_changelog,
        read_iceberg_table,
    )
    from data_lakehouse_project_spark.operators.iceberg_writer import (
        upsert_into_iceberg,
    )
    from data_lakehouse_project_spark.operators.txnlog import TxnTable

    nation = _nation(spark, sf_dir)
    tmp = tempfile.mkdtemp(prefix="graft_fcdcb_")
    try:
        t = TxnTable(os.path.join(tmp, "src"))
        t.write(nation, mode="overwrite", partition_by=["n_regionkey"])
        export_iceberg_metadata(t, spark)
        src = nation.where("n_nationkey % 5 = 0").select(
            "n_nationkey",
            F.upper("n_name").alias("n_name"),
            "n_regionkey",
        ).unionByName(
            spark.createDataFrame(
                [(4000, "FRESH", 0)],
                "n_nationkey long, n_name string, n_regionkey long",
            )
        )
        dels = nation.where("n_nationkey % 5 = 1").select(
            "n_nationkey", "n_regionkey"
        )
        info = upsert_into_iceberg(
            spark, t.path, src, ["n_nationkey", "n_regionkey"],
            delete_keys=dels,
        )
        assert info["keys_deleted"] == 5
        state = (
            read_iceberg_table(spark, t.path)
            .groupBy("n_regionkey")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum("n_nationkey").alias("key_sum"),
            )
        )
        ch = (
            read_iceberg_changelog(spark, t.path)
            .groupBy("n_regionkey", "_change_type")
            .agg(F.count(F.lit(1)).alias("n"))
            .groupBy("n_regionkey")
            .agg(
                F.sum(
                    F.when(F.col("_change_type") == "delete",
                           F.col("n")).otherwise(0)
                ).alias("n_deletes"),
                F.sum(
                    F.when(F.col("_change_type") == "insert",
                           F.col("n")).otherwise(0)
                ).alias("n_inserts"),
            )
        )
        result = (
            state.join(ch, "n_regionkey")
            .select(
                F.col("n_regionkey").alias("region"),
                "n_rows",
                "key_sum",
                F.col("n_deletes").cast("long").alias("n_deletes"),
                F.col("n_inserts").cast("long").alias("n_inserts"),
            )
            .orderBy("region")
        )
        rows = result.collect()
        return spark.createDataFrame(rows, result.schema)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


# final state: all nation keys except %5==1, plus 4000 in region 0;
# per-region deletes = pre-images of replaced (%5==0) + killed
# (%5==1) keys; inserts = initial 25 + post-images + the fresh key.
SQL_FOREIGN_CDC_BATCH = """
WITH final_state AS (
  SELECT n_regionkey, n_nationkey FROM nation
  WHERE n_nationkey % 5 <> 1
  UNION ALL
  SELECT 0, 4000
),
dels AS (
  SELECT n_regionkey, COUNT(*) AS n_deletes FROM nation
  WHERE n_nationkey % 5 IN (0, 1)
  GROUP BY n_regionkey
),
ins AS (
  SELECT n_regionkey, COUNT(*) AS n_inserts FROM (
    SELECT n_regionkey FROM nation
    UNION ALL
    SELECT n_regionkey FROM nation WHERE n_nationkey % 5 = 0
    UNION ALL
    SELECT 0
  ) GROUP BY n_regionkey
)
SELECT f.n_regionkey AS region,
       COUNT(*) AS n_rows,
       CAST(SUM(f.n_nationkey) AS BIGINT) AS key_sum,
       CAST(MAX(COALESCE(d.n_deletes, 0)) AS BIGINT) AS n_deletes,
       CAST(MAX(i.n_inserts) AS BIGINT) AS n_inserts
FROM final_state f
LEFT JOIN dels d ON f.n_regionkey = d.n_regionkey
LEFT JOIN ins i ON f.n_regionkey = i.n_regionkey
GROUP BY f.n_regionkey
ORDER BY region
"""


def build(helpers: dict) -> dict:
    _helpers.update(helpers)
    return {
        "foreign_iceberg_scoped_upsert": (
            q_foreign_iceberg_scoped_upsert,
            SQL_FOREIGN_SCOPED_UPSERT,
        ),
        "foreign_iceberg_mixed_incremental": (
            q_foreign_iceberg_mixed_incremental,
            SQL_FOREIGN_MIXED_INCREMENTAL,
        ),
        "foreign_iceberg_v3_lineage": (
            q_foreign_iceberg_v3_lineage,
            SQL_FOREIGN_V3_LINEAGE,
        ),
        "foreign_iceberg_cdc_batch": (
            q_foreign_iceberg_cdc_batch,
            SQL_FOREIGN_CDC_BATCH,
        ),
    }
