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


# ---------------------------------------------------------------------------
# Frozen-parameter serving split for the Mixture model (r9) — the
# bpe_learn/bpe_encode pattern applied to D8: the EM FIT is iterative
# ML (rows-only by nature, MixtureModel above), but SCORING under a
# frozen set of gaussians is pure expression arithmetic with an exact
# DuckDB twin. The erf never has to be evaluated at scoring time:
# the reference criterion (mixture.py:51-68)
#
#     outlier  ⟺  max_k w_k · (1 − erf(√maha²_k / √2)) < cutoff
#
# is monotone-decreasing in each component's Mahalanobis distance, so
# inverting per component gives an EXACT threshold transform
#
#     outlier  ⟺  ∀k with w_k >= cutoff:  maha²_k > t²_k,
#     t²_k = 2 · erfinv(1 − cutoff / w_k)²
#
# (components with w_k < cutoff can never clear the cutoff at any
# distance, so they impose no constraint; at w_k == cutoff the
# formula gives exactly t² = 0, keeping only the mean point — the
# strict < criterion's behavior). erfinv is evaluated ONCE at
# freeze time (tools/gen_frozen_fixtures.py) and shipped as a literal;
# the per-row score is a fixed-order quadratic form over literals.
#
# Exactness: every literal enters BOTH engines as CAST('<repr>' AS
# DOUBLE) — a correctly-rounded string→double parse on each side, so
# the literal BITS are identical (repr round-trips); the quadratic is
# the same left-associated IEEE chain in both plans (neither engine
# reassociates float + / *), so maha² is bit-identical and the
# threshold compare cannot straddle an engine divergence. This is the
# frozen_linear_score exactness argument with the literal-parse hole
# closed (a bare decimal literal would parse as DECIMAL in both
# engines and reach DOUBLE via engine-specific decimal→double casts).
# ---------------------------------------------------------------------------


def _dlit(x: float) -> str:
    """A double literal with identical bits in Spark SQL and DuckDB
    (shared convention: functions.exact.dlit)."""
    from datalakerulegeneration_spark.functions.exact import dlit

    return dlit(x)


def load_frozen_gmm(path: str | None = None) -> dict:
    """Load the vendored frozen GMM (``tools/gen_frozen_fixtures.py``:
    a real seeded Spark ML GaussianMixture fit on the sf0.01 pair,
    pinned as weights/means/inverse-covariances plus the precomputed
    per-component Mahalanobis² thresholds)."""
    import json
    import os

    if path is None:
        path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "resources",
            "fixture_gmm_params.json",
        )
    with open(path) as fh:
        params = json.load(fh)
    comps = params["components"]
    if not comps:
        raise ValueError("frozen GMM has no components")
    for c in comps:
        if len(c["mean"]) != 2 or len(c["icov"]) != 2 or any(len(r) != 2 for r in c["icov"]):
            raise ValueError("frozen GMM components must be 2-dimensional")
        if c["icov"][0][1] != c["icov"][1][0]:
            raise ValueError("frozen GMM inverse covariance must be symmetric")
        if not (0.0 < c["weight"] <= 1.0):
            raise ValueError(f"frozen GMM weight out of range: {c['weight']!r}")
        if c["t2"] is not None and c["t2"] < 0.0:
            raise ValueError(f"frozen GMM threshold must be >= 0: {c['t2']!r}")
        # freeze-time transform (tools/gen_frozen_fixtures.py): t2 is
        # None EXACTLY when the component weight sits below the cutoff.
        # A fixture violating this silently weakens/strengthens the AND
        # predicate, so reject it here rather than mis-serve.
        if (c["t2"] is None) != (c["weight"] < params["cutoff"]):
            raise ValueError(
                "frozen GMM fixture inconsistent: t2 must be null iff "
                f"weight < cutoff (weight={c['weight']!r}, t2={c['t2']!r}, "
                f"cutoff={params['cutoff']!r})"
            )
    return params


def _maha2_sql(xa: str, xb: str, comp: dict) -> str:
    """Mahalanobis² of (xa, xb) against one frozen gaussian as a
    fixed-order SQL expression shared verbatim by both engines."""
    ma, mb = (_dlit(v) for v in comp["mean"])
    iaa = _dlit(comp["icov"][0][0])
    iab = _dlit(comp["icov"][0][1])
    ibb = _dlit(comp["icov"][1][1])
    da = f"({xa} - {ma})"
    db = f"({xb} - {mb})"
    return (
        f"((({da} * {da}) * {iaa}"
        f" + (({da} * {db}) * {_dlit(2.0)}) * {iab})"
        f" + ({db} * {db}) * {ibb})"
    )


def _frozen_outlier_predicate_sql(xa: str, xb: str, params: dict) -> str:
    """The exact erf-free outlier predicate: every component with
    weight above the cutoff must sit beyond its frozen Mahalanobis²
    threshold. Components below the cutoff (t2 = None) are
    unconditionally satisfied and emit no clause."""
    clauses = [
        f"{_maha2_sql(xa, xb, c)} > {_dlit(c['t2'])}"
        for c in params["components"]
        if c["t2"] is not None
    ]
    if not clauses:  # degenerate freeze: every point is an outlier
        return "TRUE"
    return "(" + " AND ".join(clauses) + ")"


def frozen_mixture_outliers(
    test: DataFrame,
    id_col: str = "__row_id",
    params: dict | None = None,
) -> DataFrame:
    """Score a frame under the FROZEN mixture — the serving split of
    :class:`MixtureModel` (reference mixture.py:33-68 semantics under
    pinned parameters). Returns the dBoost discrepancy contract
    ``(row_id, feature, value)`` with ``value`` preserving the RAW
    column type of ``pair[0]`` (e.g. DECIMAL for TPC-H l_quantity);
    the oracle twin mirrors the same raw column, so the compare holds
    without a lossy render (a numeric→string render diverges between
    engines; the exact twin compares raw values).

    Scale shape: map-only — k quadratic forms per row folded into the
    scan filter, no UDF, no shuffle, no broadcast; at 100 TB the
    scorer costs exactly what the three_sigma filter costs."""
    if params is None:
        params = load_frozen_gmm()
    a, b = params["pair"]
    pred = _frozen_outlier_predicate_sql(f"`{a}`", f"`{b}`", params)
    return (
        test.where(F.col(a).isNotNull() & F.col(b).isNotNull())
        .where(F.expr(pred))
        .select(
            F.col(id_col).alias("row_id"),
            F.lit(f"{a}|{b}").alias("feature"),
            F.col(a).alias("value"),
        )
    )


def frozen_mixture_outliers_sql(
    table: str,
    id_sql: str,
    params: dict | None = None,
) -> str:
    """Exact DuckDB oracle for :func:`frozen_mixture_outliers` — the
    same predicate string over the same literals."""
    if params is None:
        params = load_frozen_gmm()
    a, b = params["pair"]
    pred = _frozen_outlier_predicate_sql(a, b, params)
    return f"""
SELECT {id_sql} AS row_id,
       '{a}|{b}' AS feature,
       {a} AS value
FROM {table}
WHERE {a} IS NOT NULL AND {b} IS NOT NULL
  AND {pred}
"""


@dataclass
class FrozenMixtureModel:
    """:class:`MixtureModel` pre-fitted with FROZEN parameters — the
    drop-in for :func:`outliers` pipelines that serve the pinned fit
    (D9's --train-with posture taken to its limit: no fit at all at
    scoring time). ``fit`` is a no-op by contract; scoring delegates
    to :func:`frozen_mixture_outliers`, so it composes with the other
    models' plans in one ``outliers()`` union while staying the exact
    scan-fused quadratic filter."""

    params: dict | None = None
    model_ = True  # _is_fitted marker: never auto-fit

    def fit(self, train: DataFrame, pair=None) -> "FrozenMixtureModel":
        return self  # frozen — a refit goes through gen_frozen_fixtures

    def find_discrepancies(self, test: DataFrame) -> DataFrame:
        out = frozen_mixture_outliers(test, params=self.params)
        # the pipeline union's discrepancy contract is a STRING value
        # (_emit); the registered standalone query instead keeps the
        # RAW column type (e.g. DECIMAL for l_quantity), mirrored by
        # its oracle — see frozen_mixture_outliers' docstring
        return out.withColumn("value", F.col("value").cast("string"))
