"""Model-based quality filtering — the fasttext-classifier stage of an
LLM data pipeline (CCNet/GPT-3-style: train a linear classifier to
separate reference-quality text from crawl noise, keep documents whose
"good" probability clears a threshold).

No pretrained model ships offline, so the trainer is SELF-CONTAINED:
weak labels come from the reproducible heuristic score
(``ext/text.py::quality_score`` top/bottom quantiles), features are
hashed bag-of-tokens (the fasttext trick — no vocabulary state to
ship), and the classifier is Spark MLlib ``LogisticRegression``
(JVM-side distributed L-BFGS; one pass per iteration over cached
features, executor-parallel gradient aggregation). Swapping the weak
labeler for real labels (wiki-vs-crawl) changes one DataFrame argument
and nothing else.

Scale notes:

- HashingTF is stateless and map-only: no vocabulary build pass, no
  driver-side dictionary — the property that lets fasttext-style
  filters run on arbitrary corpus sizes.
- Training-set size is the curator's dial (``per_class``): the model
  trains on a bounded hash-sampled slice, then SCORING is a pure
  map-only transform over the full corpus (broadcast coefficient
  vector, one pass, no shuffle).
- Hash sampling (not ``df.sample``) keeps label selection deterministic
  and engine-independent, same rationale as ``ext/sampling.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_lakehouse_project_spark.ext.text import quality_score, ws_tokens

_FEATURES_DIM = 1 << 18


def weak_quality_labels(
    df: DataFrame,
    text_col: str,
    id_col: str,
    good_threshold: float = 0.75,
    bad_threshold: float = 0.45,
) -> DataFrame:
    """(id, label) training slice from the heuristic score's confident
    tails: score >= good_threshold -> 1.0, <= bad_threshold -> 0.0,
    the ambiguous middle is EXCLUDED (standard weak-supervision
    hygiene — never train on the band you want the model to decide)."""
    scored = quality_score(df, text_col, id_col)
    return scored.where(
        (F.col("quality_score") >= good_threshold)
        | (F.col("quality_score") <= bad_threshold)
    ).select(
        id_col,
        F.when(F.col("quality_score") >= good_threshold, F.lit(1.0))
        .otherwise(F.lit(0.0))
        .alias("label"),
    )


def _featurize(df: DataFrame, text_col: str, dim: int):
    from pyspark.ml.feature import HashingTF

    tok = df.withColumn("_tokens", ws_tokens(F.col(text_col)))
    htf = HashingTF(
        inputCol="_tokens", outputCol="features", numFeatures=dim
    )
    return htf.transform(tok).drop("_tokens")


def train_quality_classifier(
    df: DataFrame,
    text_col: str,
    id_col: str,
    labels: DataFrame | None = None,
    dim: int = _FEATURES_DIM,
    max_iter: int = 20,
    reg_param: float = 1e-3,
):
    """Fit the LR quality model; returns the fitted MLlib model.

    ``labels``: (id, label in {0.0, 1.0}); defaults to
    ``weak_quality_labels`` over ``df`` itself (self-training
    bootstrap). Deterministic: LR/L-BFGS has no random init for a
    fixed feature layout, and the hashed features are content-defined.
    """
    from pyspark.ml.classification import LogisticRegression

    if labels is None:
        labels = weak_quality_labels(df, text_col, id_col)
    train = _featurize(
        df.join(labels, id_col).select(id_col, text_col, "label"),
        text_col,
        dim,
    )
    lr = LogisticRegression(
        featuresCol="features",
        labelCol="label",
        maxIter=max_iter,
        regParam=reg_param,
        standardization=False,
    )
    return lr.fit(train)


def score_documents(
    model,
    df: DataFrame,
    text_col: str,
    id_col: str,
    dim: int = _FEATURES_DIM,
    round_to: int = 4,
) -> DataFrame:
    """(id, good_prob, keep) for the full corpus — map-only (broadcast
    coefficients, no shuffle): the 100 TB scoring pass."""
    from pyspark.ml.functions import vector_to_array

    feats = _featurize(df.select(id_col, text_col), text_col, dim)
    scored = model.transform(feats)
    scale = float(10**round_to)
    prob_good = F.element_at(vector_to_array(F.col("probability")), 2)
    return scored.select(
        id_col,
        (F.floor(prob_good * scale + F.lit(0.5)).cast("double") / scale)
        .alias("good_prob"),
        (F.col("prediction") == 1.0).alias("keep"),
    )
