"""Dedup-quality probe: MEASURED MinHash-LSH recall against the exact
Jaccard pair set, per threshold and banding config.

The LSH pipeline Jaccard-verifies every candidate, so its precision is
1.0 by construction — the quality question is RECALL: which true pairs
never collide in any band. The exact baseline is the PPJoin-family
prefix join (ext/dedup.py::jaccard_pairs_prefix — structurally equal to
the O(n²) anchor), so the probe runs at corpus sizes the quadratic
could not. Alongside the measured recall the table prints the S-curve
prediction 1-(1-t^r)^b over the ACTUAL similarity distribution of the
missed/true pairs' band, i.e. expected recall integrated over the true
pairs' observed Jaccard values — misses should concentrate just above
the threshold.

Usage: python tools/quality_probe.py [sf_dir] [thresholds...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from data_lakehouse_project_spark import get_spark
from data_lakehouse_project_spark.ext import dedup as X_dedup

CONFIGS = [(64, 16), (32, 8), (16, 4)]  # (num_hashes, bands), r = nh/b


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    thresholds = [float(t) for t in sys.argv[2:]] or [0.7, 0.8, 0.9]
    spark = get_spark(app_name="quality-probe")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    docs.count()

    for t in thresholds:
        exact = (
            X_dedup.jaccard_pairs_prefix(docs, "text", "doc_id", t)
            .select("id_a", "id_b", "jaccard")
            .localCheckpoint(eager=True)
        )
        n_true = exact.count()
        for nh, bands in CONFIGS:
            got = X_dedup.minhash_near_duplicates(
                docs, "text", "doc_id",
                num_hashes=nh, bands=bands, jaccard_threshold=t,
            ).select("id_a", "id_b")
            hit = exact.join(got, ["id_a", "id_b"], "left_semi").count()
            # S-curve expectation integrated over the true pairs'
            # observed similarity values
            r = nh // bands
            pred = exact.select(
                F.avg(
                    1.0
                    - F.pow(
                        1.0 - F.pow(F.col("jaccard"), F.lit(r)),
                        F.lit(bands),
                    )
                ).alias("p")
            ).first()["p"]
            recall = hit / n_true if n_true else 1.0
            print(
                f"t={t:.1f} nh={nh:3d} bands={bands:3d} r={r} "
                f"true_pairs={n_true:>9,} hit={hit:>9,} "
                f"recall={recall:8.6f} s_curve_pred={pred:8.6f}",
                flush=True,
            )
    spark.stop()


if __name__ == "__main__":
    main()
