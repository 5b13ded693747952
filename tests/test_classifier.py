"""Model-based quality filter (ext/classifier.py): fasttext-style
hashed-BoW + MLlib LR. Gates: learns a separable corpus from weak
labels, held-out generalization, scoring is map-only over the full
corpus, ambiguous-middle exclusion in the weak labeler."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_lakehouse_project_spark.ext import classifier as C

GOOD = [
    "the researchers found that the results were consistent with the "
    "original hypothesis and the data supported it",
    "in this article we describe how the system was designed and why "
    "the architecture scales with the number of machines",
    "she walked to the library because the book she wanted was not "
    "available at the store near her house",
    "the committee agreed that the proposal should be reviewed again "
    "before it could be approved by the board",
]
BAD = [
    "$$$ CLICK!!! >>> ### @@@ !!! %%% ^^^ &&& *** ((( ))) !!!",
    "xz qv jk ww zz yy xx qq vv kk pp !!!! ???? ####",
    "@@@@ $$$$ %%%% ^^^^ &&&& **** (((( )))) ;;;; ::::",
    ">>>> <<<< |||| \\\\ //// ~~~~ ```` ???? !!!! ####",
]


def _corpus(spark, reps=6):
    rows = []
    i = 0
    for r in range(reps):
        for g in GOOD:
            rows.append((i, f"{g} variant {r}", 1.0))
            i += 1
        for b in BAD:
            rows.append((i, f"{b} {r}", 0.0))
            i += 1
    return spark.createDataFrame(
        rows, "doc_id long, text string, truth double"
    )


def test_weak_labels_exclude_ambiguous_middle(spark):
    df = _corpus(spark)
    labels = C.weak_quality_labels(
        df, "text", "doc_id", good_threshold=0.75, bad_threshold=0.45
    )
    joined = labels.join(df, "doc_id")
    n_total, n_labeled = df.count(), labels.count()
    assert 0 < n_labeled <= n_total
    # the weak labeler must agree with ground truth where it speaks
    assert joined.where(F.col("label") != F.col("truth")).count() == 0


def test_train_and_score_generalizes_to_heldout(spark):
    df = _corpus(spark)
    train = df.where(F.pmod("doc_id", F.lit(2)) == 0)
    heldout = df.where(F.pmod("doc_id", F.lit(2)) == 1)
    model = C.train_quality_classifier(
        train,
        "text",
        "doc_id",
        labels=train.select("doc_id", F.col("truth").alias("label")),
    )
    scored = C.score_documents(model, heldout, "text", "doc_id").join(
        heldout.select("doc_id", "truth"), "doc_id"
    )
    n = scored.count()
    correct = scored.where(
        (F.col("keep") & (F.col("truth") == 1.0))
        | (~F.col("keep") & (F.col("truth") == 0.0))
    ).count()
    assert correct / n >= 0.95, f"held-out accuracy {correct}/{n}"
    # probabilities are calibrated-ish: good docs' mean prob >> bad's
    means = {
        r["truth"]: r["m"]
        for r in scored.groupBy("truth")
        .agg(F.avg("good_prob").alias("m"))
        .collect()
    }
    assert means[1.0] > 0.8 > 0.5 > means[0.0]


def test_scoring_plan_is_map_only(spark):
    """The corpus scoring pass must not shuffle: broadcast coefficients,
    one projection — the property that makes it a 100 TB-safe op."""
    df = _corpus(spark, reps=2)
    model = C.train_quality_classifier(
        df,
        "text",
        "doc_id",
        labels=df.select("doc_id", F.col("truth").alias("label")),
    )
    plan = (
        C.score_documents(model, df, "text", "doc_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan
