"""Round-10 registry additions: the two foreign-Iceberg capabilities
this round shipped, value-pinned against plain-SQL oracles —

* a HIDDEN-TRANSFORM-partitioned round trip (``bucket[4]`` on the key,
  spec murmur3): export + transform-aware DML + foreign read, so any
  break in transform staging, manifest partition values, or the
  transform-pruning path surfaces as an oracle hash mismatch;
* a keyed UPSERT (one equality-delete + one data manifest in a single
  snapshot) replayed through ``read_iceberg_changelog`` — the
  streaming-CDC commit shape graded end to end.

Both are bounded by nation's size (25 rows at any SF) — the table
format work never touches the fact tables.

Reference scope note: the reference pipeline only writes plain parquet
(spark/jobs/gold_aggregation.py); this is SURVEY §2.9 breadth.
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


def q_foreign_iceberg_transform_rollup(spark, sf_dir):
    """nation → ``bucket(4, n_nationkey)``-partitioned export (spec
    murmur3 hidden transform) → ``delete_from_iceberg`` +
    ``append_to_iceberg`` (both staging through the transform) →
    FOREIGN reader → per-bucket rollup.  The output GROUPS BY the
    spec bucket value itself (recomputed by the oracle via the same
    murmur3 arithmetic on the Python side through a literal map), so
    the staged partition values, manifests, and reader agree with the
    spec bit-for-bit or the hash mismatches."""
    from data_lakehouse_project_spark.functions.ice_transforms import (
        bucket_value,
    )
    from data_lakehouse_project_spark.operators.iceberg_export import (
        export_iceberg_metadata,
    )
    from data_lakehouse_project_spark.operators.iceberg_reader import (
        iceberg_live_files,
        read_iceberg_table,
    )
    from data_lakehouse_project_spark.operators.iceberg_writer import (
        append_to_iceberg,
        delete_from_iceberg,
    )
    from data_lakehouse_project_spark.operators.txnlog import TxnTable

    nation = _nation(spark, sf_dir)
    tmp = tempfile.mkdtemp(prefix="graft_ftrans_")
    try:
        t = TxnTable(os.path.join(tmp, "src"))
        t.write(
            nation, mode="overwrite",
            partition_by=["bucket(4, n_nationkey)"],
        )
        export_iceberg_metadata(t, spark)
        delete_from_iceberg(spark, t.path, "n_nationkey % 6 = 1")
        append_to_iceberg(
            spark,
            nation.where("n_nationkey % 6 = 1").select(
                (F.col("n_nationkey") + 100).alias("n_nationkey"),
                F.lower("n_name").alias("n_name"),
                "n_regionkey",
            ),
            t.path,
        )
        back = read_iceberg_table(spark, t.path)
        # cross-check: every manifest bucket value equals the spec
        # murmur3 of the rows' keys (fails loudly, not via the oracle)
        _, live, _, _ = iceberg_live_files(spark, t.path)
        for f in live:
            pv = (f.get("partition") or {}).get("pt_bucket4_n_nationkey")
            if pv is None:
                continue
            keys = [
                r.n_nationkey
                for r in spark.read.parquet(
                    f["file_path"]
                ).select("n_nationkey").collect()
            ]
            bad = [
                k for k in keys if bucket_value(k, "long", 4) != pv
            ]
            assert not bad, f"manifest bucket {pv} != spec of {bad[:3]}"
        # group by the spec bucket via a broadcast literal map (the
        # oracle mirrors it with a CASE over the same Python values)
        keys = [r.n_nationkey for r in back.select("n_nationkey").collect()]
        bmap = spark.createDataFrame(
            [(int(k), int(bucket_value(k, "long", 4))) for k in set(keys)],
            "n_nationkey long, bucket int",
        )
        result = (
            back.join(F.broadcast(bmap), "n_nationkey")
            .groupBy("bucket")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum("n_nationkey").alias("key_sum"),
                F.min("n_name").alias("first_name"),
            )
            .orderBy("bucket")
        )
        rows = result.collect()
        return spark.createDataFrame(rows, result.schema)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def q_foreign_iceberg_upsert_changelog(spark, sf_dir):
    """nation → unpartitioned Iceberg export → ``upsert_into_iceberg``
    (replace every key%3==0, insert two fresh keys — ONE snapshot with
    an equality-delete + a data manifest) → ``read_iceberg_changelog``
    → per-type counts.  Pins the equality-delete reduction (pre-image
    kills under the strictly-older sequence rule) and the upsert's
    same-snapshot survival of its own data files."""
    from data_lakehouse_project_spark.operators.iceberg_export import (
        export_iceberg_metadata,
    )
    from data_lakehouse_project_spark.operators.iceberg_reader import (
        read_iceberg_changelog,
    )
    from data_lakehouse_project_spark.operators.iceberg_writer import (
        upsert_into_iceberg,
    )
    from data_lakehouse_project_spark.operators.txnlog import TxnTable

    nation = _nation(spark, sf_dir)
    tmp = tempfile.mkdtemp(prefix="graft_fupsch_")
    try:
        t = TxnTable(os.path.join(tmp, "src"))
        t.write(nation, mode="overwrite")
        export_iceberg_metadata(t, spark)
        src = nation.where("n_nationkey % 3 = 0").select(
            "n_nationkey",
            F.upper("n_name").alias("n_name"),
            "n_regionkey",
        ).unionByName(
            nation.orderBy("n_nationkey").limit(2).select(
                (F.col("n_nationkey") + 1000).alias("n_nationkey"),
                F.lit("FRESH").alias("n_name"),
                F.lit(9).cast("long").alias("n_regionkey"),
            )
        )
        upsert_into_iceberg(spark, t.path, src, ["n_nationkey"])
        ch = read_iceberg_changelog(spark, t.path)
        result = (
            ch.groupBy("_change_type")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.countDistinct("n_nationkey").alias("n_keys"),
                F.sum(
                    F.when(F.col("n_name") == F.upper(F.col("n_name")),
                           1).otherwise(0)
                ).alias("n_upper"),
            )
            .orderBy("_change_type")
            .select(
                F.col("_change_type").alias("change_type"),
                "n_rows",
                "n_keys",
                "n_upper",
            )
        )
        rows = result.collect()
        return spark.createDataFrame(rows, result.schema)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


# change set: insert x 25 (initial) + per key%3==0: delete(pre-image)
# + insert(post-image, uppercased) + 2 fresh inserts.  The n_upper
# column counts rows whose name is already all-caps — pre-images keep
# the original casing, post-images are uppercased, so a changelog that
# emitted post-images as pre-images flips the sum.
SQL_FOREIGN_UPSERT_CHANGELOG = """
WITH base AS (
  SELECT n_nationkey, n_name FROM nation
),
fresh AS (
  SELECT n_nationkey + 1000 AS n_nationkey, 'FRESH' AS n_name
  FROM (SELECT n_nationkey FROM nation ORDER BY n_nationkey LIMIT 2)
),
ch AS (
  SELECT 'insert' AS change_type, n_nationkey, n_name FROM base
  UNION ALL
  SELECT 'delete', n_nationkey, n_name FROM base
  WHERE n_nationkey % 3 = 0
  UNION ALL
  SELECT 'insert', n_nationkey, UPPER(n_name) FROM base
  WHERE n_nationkey % 3 = 0
  UNION ALL
  SELECT 'insert', n_nationkey, n_name FROM fresh
)
SELECT change_type,
       COUNT(*) AS n_rows,
       COUNT(DISTINCT n_nationkey) AS n_keys,
       CAST(SUM(CASE WHEN n_name = UPPER(n_name) THEN 1 ELSE 0 END)
            AS BIGINT) AS n_upper
FROM ch
GROUP BY change_type
ORDER BY change_type
"""


def build(helpers: dict) -> dict:
    _helpers.update(helpers)
    from data_lakehouse_project_spark.functions.ice_transforms import (
        bucket_value,
    )

    # oracle twin of the transform rollup: the post-DML row set in SQL
    # (survivors + shifted re-inserts) grouped by literal-pinned spec
    # bucket values — murmur3 never runs inside DuckDB
    case_rows = " ".join(
        f"WHEN {k} THEN {bucket_value(k, 'long', 4)}"
        for k in list(range(0, 25)) + list(range(100, 125))
    )
    sql_transform = f"""
WITH after_dml AS (
  SELECT n_nationkey, n_name FROM nation
  WHERE NOT (n_nationkey % 6 = 1)
  UNION ALL
  SELECT n_nationkey + 100, LOWER(n_name) FROM nation
  WHERE n_nationkey % 6 = 1
)
SELECT CASE n_nationkey {case_rows} END AS bucket,
       COUNT(*) AS n_rows,
       CAST(SUM(n_nationkey) AS BIGINT) AS key_sum,
       MIN(n_name) AS first_name
FROM after_dml
GROUP BY 1
ORDER BY 1
"""
    return {
        "foreign_iceberg_transform_rollup": (
            q_foreign_iceberg_transform_rollup,
            sql_transform,
        ),
        "foreign_iceberg_upsert_changelog": (
            q_foreign_iceberg_upsert_changelog,
            SQL_FOREIGN_UPSERT_CHANGELOG,
        ),
    }
