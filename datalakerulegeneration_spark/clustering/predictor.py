"""Strategy-performance predictor (M6).

Reference: a GradientBoostingRegressor fit on numeric profile features
to predict per-strategy detection quality (profiling/profiler.py:
679-707). Spark ML GBTRegressor over the profiles DataFrame — the
model itself is distributed; profiles are small but the same code
trains on millions of column profiles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datalakerulegeneration_spark.clustering.features import DEFAULT_FEATURES


def train_strategy_predictor(
    profiles_with_label: DataFrame,
    label_col: str,
    features: list[str] | None = None,
    seed: int = 42,
):
    """Fit GBT on profile features → (model, assembler); predict with
    :func:`predict_strategy_performance`."""
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.regression import GBTRegressor

    feats = [f for f in (features or DEFAULT_FEATURES) if f in profiles_with_label.columns]
    filled = profiles_with_label.select(
        "unique_id",
        F.col(label_col).alias("__label"),
        *[F.coalesce(F.col(f), F.lit(0.0)).alias(f) for f in feats],
    )
    va = VectorAssembler(inputCols=feats, outputCol="__vec")
    gbt = GBTRegressor(featuresCol="__vec", labelCol="__label", seed=seed, maxIter=20)
    model = gbt.fit(va.transform(filled))
    return model, va, feats


def predict_strategy_performance(profiles: DataFrame, model, va, feats) -> DataFrame:
    filled = profiles.select(
        "unique_id", *[F.coalesce(F.col(f), F.lit(0.0)).alias(f) for f in feats]
    )
    return model.transform(va.transform(filled)).select(
        "unique_id", F.col("prediction").alias("predicted_performance")
    )
