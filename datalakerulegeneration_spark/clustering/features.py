"""Profile → feature matrix for clustering (M1 preprocessing).

Reference: numeric profile features, NaN→0, MinMax scaling
(utils/clustering.py:40-50). Spark ML handles assembly/scaling so the
same pipeline runs on a million-column catalog; the collected matrix
(one row per column profile) is tiny by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

DEFAULT_FEATURES = [
    "null_ratio",
    "unique_ratio",
    "avg_len",
    "min_len",
    "max_len",
    "characters_alphabet",
    "characters_numeric",
    "characters_punctuation",
    "cells_alphabet",
    "cells_numeric",
    "numeric_min",
    "numeric_max",
    "numeric_mean",
    "numeric_std",
    "type_ratio_integer",
    "type_ratio_float",
    "words_length_avg",
]


def profile_feature_matrix(
    profiles: DataFrame, features: list[str] | None = None
):
    """(ids, numpy matrix scaled to [0,1]) from the profiles DataFrame.

    Uses Spark ML VectorAssembler + MinMaxScaler (the distributed path),
    then collects — the matrix has one row per COLUMN profile, so
    collecting is the documented driver boundary (SURVEY §7.3.5).
    """
    import numpy as np
    from pyspark.ml.feature import MinMaxScaler, VectorAssembler

    feats = [f for f in (features or DEFAULT_FEATURES) if f in profiles.columns]
    filled = profiles.select(
        "unique_id", *[F.coalesce(F.col(f), F.lit(0.0)).alias(f) for f in feats]
    )
    va = VectorAssembler(inputCols=feats, outputCol="__raw")
    scaler = MinMaxScaler(inputCol="__raw", outputCol="__scaled")
    assembled = va.transform(filled)
    model = scaler.fit(assembled)
    scaled = model.transform(assembled).select("unique_id", "__scaled").collect()
    ids = [r["unique_id"] for r in scaled]
    mat = np.array([r["__scaled"].toArray() for r in scaled])
    return ids, mat
