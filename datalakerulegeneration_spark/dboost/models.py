"""dBoost outlier models (D5-D8) + the 3-pass orchestration (D9-D10).

Each model is fit on a train DataFrame of expanded features and scores
a test DataFrame — the Spark translation of dBoost's
``analyzer.fit → model.fit → find_discrepancies`` generator pipeline
(dboost/__init__.py:27-47). Discrepancies come back as
``(__row_id, feature, value)`` rows.

All fitting is aggregates over the expanded frame; all scoring is a
broadcast join of the (tiny) fitted stats against the test frame —
linear scans, no per-tuple Python, matching the paper's
linear-in-test-size scaling claim at any data size.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datalakerulegeneration_spark.dboost.expansion import (
    categorical_feature_columns,
    numeric_feature_columns,
)


def _emit(df: DataFrame, feature: str, value_col: str) -> DataFrame:
    return df.select(
        F.col("__row_id").alias("row_id"),
        F.lit(feature).alias("feature"),
        F.col(value_col).cast("string").alias("value"),
    )


@dataclass
class GaussianModel:
    """Flag x with |x − μ| > tol·σ per numeric feature (gaussian.py:22-38)."""

    tol: float = 3.0
    stats_: dict = field(default_factory=dict)

    def fit(self, train: DataFrame, features: list[str] | None = None) -> "GaussianModel":
        feats = features or numeric_feature_columns(train)
        aggs = []
        for c in feats:
            aggs.append(F.avg(f"`{c}`").alias(f"mu_{c}"))
            aggs.append(F.stddev_samp(f"`{c}`").alias(f"sd_{c}"))
        row = train.agg(*aggs).collect()[0].asDict()
        self.stats_ = {
            c: (row[f"mu_{c}"], row[f"sd_{c}"])
            for c in feats
            if row[f"mu_{c}"] is not None and (row[f"sd_{c}"] or 0) > 0
        }
        return self

    def find_discrepancies(self, test: DataFrame) -> DataFrame:
        plans = []
        for c, (mu, sd) in self.stats_.items():
            hit = test.where(F.abs(F.col(f"`{c}`") - F.lit(mu)) > self.tol * F.lit(sd))
            plans.append(_emit(hit, c, c))
        return _union(plans, test.sparkSession)


@dataclass
class HistogramModel:
    """Peaked-histogram model (discrete.py:7-92): keep features whose
    top peaks carry ≥ peak_s of the mass within ≤ max_classes classes;
    flag values whose bucket share < outlier_s."""

    peak_s: float = 0.8
    outlier_s: float = 0.2
    max_classes: int = 16
    n_peaks: int = 2
    hists_: dict = field(default_factory=dict)

    def fit(self, train: DataFrame, features: list[str] | None = None) -> "HistogramModel":
        feats = features or (
            categorical_feature_columns(train) + numeric_feature_columns(train)
        )
        self.hists_ = {}
        for c in feats:
            # limit(max_classes+1) bounds the driver collect: a
            # high-cardinality feature returns max_classes+1 rows (and
            # is skipped), never its full distinct-value set
            counts = (
                train.groupBy(F.col(f"`{c}`").alias("v"))
                .agg(F.count(F.lit(1)).alias("n"))
                .limit(self.max_classes + 1)
                .collect()
            )
            if len(counts) > self.max_classes or len(counts) < 2:
                continue
            total = sum(r["n"] for r in counts)
            top = sorted((r["n"] for r in counts), reverse=True)[: self.n_peaks]
            if sum(top) / total < self.peak_s:
                continue  # not peaked → uninformative (discrete.py:44-52)
            self.hists_[c] = {r["v"]: r["n"] / total for r in counts}
        return self

    def find_discrepancies(self, test: DataFrame) -> DataFrame:
        plans = []
        for c, shares in self.hists_.items():
            rare = [v for v, s in shares.items() if s < self.outlier_s]
            if not rare:
                continue
            hit = test.where(F.col(f"`{c}`").isin(rare))
            plans.append(_emit(hit, c, c))
        return _union(plans, test.sparkSession)


@dataclass
class PartitionedHistogramModel:
    """Histogram of value conditioned on a key feature
    (discretepart.py:27-86): within each key, flag values whose share
    of the key's mass is below outlier_s (peak-jump simplification)."""

    key: str = ""
    value: str = ""
    outlier_s: float = 0.2
    max_classes: int = 64
    rare_: DataFrame | None = None

    def fit(self, train: DataFrame, key: str | None = None, value: str | None = None):
        self.key = key or self.key
        self.value = value or self.value
        counts = (
            train.groupBy(F.col(f"`{self.key}`").alias("k"), F.col(f"`{self.value}`").alias("v"))
            .agg(F.count(F.lit(1)).alias("n"))
        )
        tot = train.groupBy(F.col(f"`{self.key}`").alias("k")).agg(
            F.count(F.lit(1)).alias("kn")
        )
        # fitted state stays a (lazy) DataFrame — the rare (key, value)
        # pairs are joined against the test frame, never collected: key
        # cardinality does not bound driver memory
        self.rare_ = (
            counts.join(tot, "k")
            .where(F.col("n") / F.col("kn") < self.outlier_s)
            .select("k", "v")
        )
        return self

    def find_discrepancies(self, test: DataFrame) -> DataFrame:
        if self.rare_ is None:
            return _union([], test.sparkSession)
        rare = self.rare_
        hit = test.join(
            F.broadcast(rare),
            (test[f"`{self.key}`"] == rare["k"]) & (test[f"`{self.value}`"] == rare["v"]),
        )
        return _emit(hit, f"{self.key}|{self.value}", self.value)


@dataclass
class MixtureModel:
    """GMM over a correlated numeric feature pair (mixture.py:33-68):
    Spark ML GaussianMixture; outlier when the weighted likelihood
    proxy (max responsibility-scaled density) is below the cutoff."""

    pair: tuple[str, str] = ("", "")
    n_components: int = 2
    cutoff: float = 0.075
    seed: int = 42
    model_ = None

    def fit(self, train: DataFrame, pair: tuple[str, str] | None = None) -> "MixtureModel":
        from pyspark.ml.clustering import GaussianMixture
        from pyspark.ml.feature import VectorAssembler

        self.pair = pair or self.pair
        a, b = self.pair
        va = VectorAssembler(inputCols=[a, b], outputCol="__vec", handleInvalid="skip")
        gm = GaussianMixture(k=self.n_components, featuresCol="__vec", seed=self.seed)
        self.model_ = gm.fit(va.transform(train))
        self._va = va
        return self

    def find_discrepancies(self, test: DataFrame) -> DataFrame:
        """Reference criterion (mixture.py:51-68): a point is an
        outlier when ``max_k weight_k · (1 − erf(mahalanobis_k/√2))``
        falls below the cutoff — a degenerate low-weight component
        (the classic "outlier cluster") can never clear a cutoff above
        its own weight. The k fitted gaussians are tiny and close over
        an Arrow-batched pandas UDF, so scoring is distributed and
        vectorized (no driver-side collect of the test frame)."""
        import math

        import numpy as np
        from pyspark.sql.functions import pandas_udf

        a, b = self.pair
        gauss = self.model_.gaussiansDF.collect()
        weights = list(self.model_.weights)
        means = [g["mean"].toArray() for g in gauss]
        invs = [np.linalg.pinv(g["cov"].toArray()) for g in gauss]
        params = [
            (float(w), m.astype(float), inv.astype(float))
            for w, m, inv in zip(weights, means, invs)
        ]
        cutoff = float(self.cutoff)
        sqrt2 = math.sqrt(2.0)

        @pandas_udf("double")
        def _score(xa: pd.Series, xb: pd.Series) -> pd.Series:
            X = np.stack([xa.to_numpy(dtype=float), xb.to_numpy(dtype=float)], axis=1)
            best = np.zeros(len(X))
            erf = np.vectorize(math.erf, otypes=[float])
            for w, m, inv in params:
                D = X - m
                maha2 = np.maximum(np.einsum("ij,ij->i", D @ inv, D), 0.0)
                s = w * (1.0 - erf(np.sqrt(maha2) / sqrt2))
                np.maximum(best, s, out=best)
            return pd.Series(best)

        hit = (
            test.where(F.col(f"`{a}`").isNotNull() & F.col(f"`{b}`").isNotNull())
            .withColumn(
                "__score", _score(F.col(f"`{a}`").cast("double"), F.col(f"`{b}`").cast("double"))
            )
            .where(F.col("__score") < F.lit(cutoff))
        )
        return _emit(hit, f"{a}|{b}", a)


def _union(plans: list[DataFrame], spark) -> DataFrame:
    if not plans:
        return spark.createDataFrame([], "row_id string, feature string, value string")
    out = plans[0]
    for p in plans[1:]:
        out = out.unionByName(p)
    return out


def outliers(
    train: DataFrame,
    test: DataFrame,
    models: list,
    row_id_col: str | None = None,
    columns: list[str] | None = None,
    disabled: set[str] | None = None,
    max_records: int | None = None,
) -> DataFrame:
    """The dBoost 3-pass pipeline on DataFrames (dboost/__init__.py:27-47):
    expand → fit models on train → score test. ``--train-with`` (D9) is
    just passing a different train frame; ``max_records`` is the
    ``--max-records`` training cutoff (cli.py:58-60) — it limits FIT
    input only, scoring always covers the full test frame."""
    from datalakerulegeneration_spark.dboost.expansion import expand

    if max_records is not None:
        train = train.limit(max_records)
    ex_train = expand(train, columns=columns, disabled=disabled, row_id_col=row_id_col)
    ex_test = expand(test, columns=columns, disabled=disabled, row_id_col=row_id_col)
    plans = []
    for m in models:
        if _is_fitted(m):
            pass  # honor the caller's fitted state (D9 --train-with)
        elif isinstance(m, (MixtureModel, PartitionedHistogramModel)):
            raise ValueError(
                f"{type(m).__name__} requires explicit fit(pair=/key=/value=) "
                "before outliers() — it cannot be auto-fit"
            )
        else:
            m.fit(ex_train)
        plans.append(m.find_discrepancies(ex_test))
    return _union(plans, test.sparkSession)


def _is_fitted(m) -> bool:
    """Model-specific fitted markers (each model stores its state in a
    different attribute)."""
    return bool(
        getattr(m, "stats_", None)
        or getattr(m, "hists_", None)
        or getattr(m, "rare_", None) is not None
        or getattr(m, "model_", None)
    )
