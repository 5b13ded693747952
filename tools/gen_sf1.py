"""Generate the sf1 bench tier: a DETERMINISTIC 10× replication of
/root/testdata/sf0.1 under .testdata/sf1 (gitignored).

Round-5 verdict task 4: every perf comparison at sf0.1 is
noise-dominated (±25-30% on 1-2 s slots); sf1 slots run ≥10 s so a
1.2× change is signal. The driver's testdata is read-only and the
DuckDB TPC-H extension is download-gated offline, so the tier is built
by replicating sf0.1 ten times with pure arithmetic — no RNG, no
seeds, byte-identical on every run:

* fact/dim keys get a per-replica stride (``key + k * (max_key+1)``)
  applied CONSISTENTLY across tables, so every join relationship of
  the original holds in each replica and cross-replica joins never
  match — selectivities and group counts scale exactly 10×.
* ``documents.text`` gets a per-replica Caesar rotation over
  [a-z]/[A-Z] (k letters): lengths, whitespace, and token shapes are
  preserved (n_chars stays valid) while shingle sets become disjoint
  across replicas — the near-dup/LSH workload scales ~10× instead of
  degenerating into 10-way exact-duplicate cliques. Language-mix
  stats are garbage for k>0 (documented: this tier is for TIMING;
  correctness grading stays at sf0.01).
* ``embeddings.embedding`` gets a per-replica deterministic SIGN-FLIP
  pattern (component i negated when ``hash(k·7919+i)`` is odd):
  within-replica cosine is EXACTLY preserved (signs square away), and
  cross-replica cosines decorrelate to ~0, so the pair workload scales
  ~10× with the data. (A component ROTATION was tried first and
  produced 101× pairs at 10× vectors — rotated replicas stayed
  mutually similar.) ``region``/``nation`` (true dimensions) copied.

Env knobs: ``SPARK_GRAFT_REPLICAS`` (default 10) and
``SPARK_GRAFT_TABLES`` (comma subset) — used to stack tiers, e.g. the
sf10 relational tier is ``REPLICAS=10 TABLES=<tpch+events>`` over the
sf1 output.

Usage: python tools/gen_sf1.py [out_dir] [src_dir]
"""

from __future__ import annotations

import os
import string
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from data_lakehouse_project_spark import get_spark

REPLICAS = int(os.environ.get("SPARK_GRAFT_REPLICAS", "10"))

# key columns per table, all strided by (max over the SOURCE table that
# OWNS the key) + 1 so references stay consistent
KEYS = {
    "customer": {"c_custkey": "customer"},
    "supplier": {"s_suppkey": "supplier"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem": {
        "l_orderkey": "orders",
        "l_partkey": "part",
        "l_suppkey": "supplier",
    },
    "events": {"event_id": "events", "user_id": "events_user"},
    "documents": {"doc_id": "documents"},
    "embeddings": {"vec_id": "embeddings"},
}
OWN_KEY = {
    "customer": "c_custkey",
    "supplier": "s_suppkey",
    "part": "p_partkey",
    "orders": "o_orderkey",
    "events": "event_id",
    "events_user": "user_id",
    "documents": "doc_id",
    "embeddings": "vec_id",
}
COPY = ["region", "nation"]


def _caesar(col, k: int):
    if k == 0:
        return col
    lower = string.ascii_lowercase
    upper = string.ascii_uppercase
    return F.translate(
        col,
        lower + upper,
        lower[k:] + lower[:k] + upper[k:] + upper[:k],
    )


def replicate(spark, src_dir: str, out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    subset = os.environ.get("SPARK_GRAFT_TABLES")
    wanted = set(subset.split(",")) if subset else None
    copy = [t for t in COPY if wanted is None or t in wanted]
    keys = {
        t: m for t, m in KEYS.items() if wanted is None or t in wanted
    }
    tables: dict[str, DataFrame] = {}
    for name in copy + sorted(keys):
        tables[name] = spark.read.parquet(
            os.path.join(src_dir, f"{name}.parquet")
        )
    needed_owners = {o for m in keys.values() for o in m.values()}
    strides = {}
    for owner in needed_owners:
        key = OWN_KEY[owner]
        t = owner if owner != "events_user" else "events"
        strides[owner] = (
            tables[t].agg(F.max(key)).first()[0] + 1
        )

    for name in copy:
        tables[name].write.mode("overwrite").parquet(
            os.path.join(out_dir, f"{name}.parquet")
        )
        print(f"{name}: copied")

    for name, keymap in keys.items():
        src = tables[name]
        parts = []
        for k in range(REPLICAS):
            df = src
            for col, owner in keymap.items():
                df = df.withColumn(
                    col, F.col(col) + F.lit(k * strides[owner])
                )
            if name == "documents":
                df = df.withColumn("text", _caesar(F.col("text"), k))
            if name == "embeddings" and k:
                # per-replica sign flip: within-replica cosines exactly
                # preserved, cross-replica ~0 (see module docstring)
                df = df.withColumn(
                    "embedding",
                    F.transform(
                        "embedding",
                        lambda x, i: x
                        * F.when(
                            F.pmod(
                                F.hash(F.lit(k * 7919) + i), F.lit(2)
                            )
                            == 0,
                            F.lit(1.0),
                        )
                        .otherwise(F.lit(-1.0))
                        .cast("float"),
                    ),
                )
            parts.append(df.select(*src.columns))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.repartition(32).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"{name}.parquet")
        )
        n = spark.read.parquet(
            os.path.join(out_dir, f"{name}.parquet")
        ).count()
        print(f"{name}: {n:,} rows")


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        repo, ".testdata", "sf1"
    )
    src_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="gen-sf1")
    replicate(spark, src_dir, out_dir)
    spark.stop()
    print(f"sf1 tier at {out_dir}")


if __name__ == "__main__":
    main()
