"""Trained document-quality classifier (fasttext-style) for corpus
curation.

The heuristic ``textqa.quality_score`` is a fixed formula; production
pipelines (CCNet, GPT-3's WebText filter) instead TRAIN a cheap linear
classifier over bag-of-words features and filter by predicted quality.
This module reproduces that shape Spark-natively:

* features = hashed token counts (``HashingTF`` — no vocabulary build,
  no driver-side dictionary broadcast: the feature space is a fixed
  2^18 hash range, so training scales to any corpus),
* model = ``LogisticRegression`` (Spark ML distributed L-BFGS),
* labels = caller-provided, or WEAK labels bootstrapped from the
  heuristic score's extremes (top tercile positive, bottom tercile
  negative, middle dropped — standard weak supervision).

Scoring is a map-only ``transform`` (hash + dot product per document);
at 100 TB the scorer never shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_FEATURES = 1 << 18


def weak_quality_labels(
    df: DataFrame,
    id_col: str,
    text_col: str,
    low_q: float = 1 / 3,
    high_q: float = 2 / 3,
) -> DataFrame:
    """Bootstrap binary labels from the heuristic quality score:
    documents above the ``high_q`` quantile → 1, below ``low_q`` → 0,
    the ambiguous middle band is dropped. One pass for the scores, one
    tiny 2-value quantile aggregate, one map-only filter."""
    from datalakerulegeneration_spark.ops.textqa import quality_col

    # quality folds into the ONE scan (quality_col is a column
    # expression) — a join against quality_score would rescan the
    # corpus and shuffle it on id for a self-join
    scored = df.select(
        F.col(id_col), F.col(text_col), quality_col(text_col).alias("quality")
    )
    lo, hi = scored.approxQuantile("quality", [low_q, high_q], 0.001)
    return (
        scored.where((F.col("quality") <= lo) | (F.col("quality") >= hi))
        .select(
            F.col(id_col),
            F.col(text_col),
            F.when(F.col("quality") >= hi, 1.0).otherwise(0.0).alias("label"),
        )
    )


def train_quality_classifier(
    labeled: DataFrame,
    text_col: str,
    label_col: str = "label",
    reg_param: float = 1e-4,
):
    """Fit the tokenize → hash → logistic-regression pipeline on a
    labeled frame; returns the fitted ``PipelineModel``. Feature
    hashing keeps the model a fixed-size vector (no vocabulary state),
    so the fitted model broadcasts to scorers at any corpus size."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import HashingTF, RegexTokenizer

    tok = RegexTokenizer(
        inputCol=text_col, outputCol="__toks", pattern=r"\s+", toLowercase=True
    )
    tf = HashingTF(inputCol="__toks", outputCol="__feats", numFeatures=N_FEATURES)
    lr = LogisticRegression(
        featuresCol="__feats",
        labelCol=label_col,
        regParam=reg_param,
        maxIter=50,
    )
    return Pipeline(stages=[tok, tf, lr]).fit(
        labeled.where(F.col(text_col).isNotNull())
    )


def score_quality(model, df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Score documents with a fitted classifier: ``(id, prob_quality,
    quality_pred)``. Map-only (hash + dot product inside the JVM) —
    the filtering pass of a trained-curation pipeline."""
    from pyspark.ml.functions import vector_to_array

    out = model.transform(df.where(F.col(text_col).isNotNull()))
    return out.select(
        F.col(id_col).alias("id"),
        vector_to_array("probability")[1].alias("prob_quality"),
        F.col("prediction").alias("quality_pred"),
    )


def train_and_score(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """End-to-end weak-label bootstrap: label from the heuristic's
    extremes, train, score the WHOLE corpus (including the ambiguous
    middle band the labeler dropped). The L-BFGS fit is deterministic
    for a given data partitioning; no seed exists to thread."""
    labeled = weak_quality_labels(df, id_col, text_col)
    model = train_quality_classifier(labeled, text_col)
    return score_quality(model, df, id_col, text_col)
