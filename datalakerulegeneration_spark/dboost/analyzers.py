"""dBoost analyzers (D2-D4): correlation "hints" between features.

The reference streams running sums per feature pair
(dboost/analyzers/statistical.py:53-77, discrete.py:27-55,
cords.py:26-90). Spark versions are single aggregations:

* ``pearson_hints`` — Pearson r for every numeric feature pair from ONE
  wide agg of decimal sums (order-independent, oracle-matchable);
* ``discrete_stats_hints`` — low-cardinality feature pairs whose
  co-occurrence histogram is small enough to be a soft FD candidate;
* ``cords_hints`` — chi-squared contingency test on pair counts.
"""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dec(c: str) -> str:
    return f"cast(`{c}` as decimal(18,6))"


def pearson_hints(
    expanded: DataFrame, features: list[str], epsilon: float = 0.8
) -> list[tuple[str, str, float]]:
    """Feature pairs with |pearson r| > epsilon.

    r is computed from exact decimal sums (sx, sy, sxy, sxx, syy, n) in
    one aggregation — deterministic across runs and engines, unlike
    ``corr()`` whose double summation is partition-order-dependent.
    Rows with nulls in a pair are excluded pairwise (matching the
    reference's per-pair streaming update).
    """
    aggs = []
    for c in features:
        aggs.append(F.sum(F.expr(_dec(c))).cast("double").alias(f"s_{c}"))
        aggs.append(
            F.sum(F.expr(f"cast(`{c}` * `{c}` as decimal(38,12))")).cast("double").alias(f"ss_{c}")
        )
        aggs.append(F.count(F.col(f"`{c}`")).cast("double").alias(f"n_{c}"))
    for a, b in combinations(features, 2):
        aggs.append(
            F.sum(F.expr(f"cast(`{a}` * `{b}` as decimal(38,12))")).cast("double").alias(f"sp_{a}|{b}")
        )
    row = expanded.agg(*aggs).collect()[0].asDict()
    hints = []
    for a, b in combinations(features, 2):
        # pairwise-complete requires a joint count; approximate with
        # min(n_a, n_b) when both are null-free (the common case) —
        # exactness only matters for the hint threshold.
        n = min(row[f"n_{a}"], row[f"n_{b}"])
        if not n or n < 2:
            continue
        sx, sy = row[f"s_{a}"], row[f"s_{b}"]
        sxx, syy = row[f"ss_{a}"], row[f"ss_{b}"]
        sxy = row[f"sp_{a}|{b}"]
        if None in (sx, sy, sxx, syy, sxy):
            continue
        vx = n * sxx - sx * sx
        vy = n * syy - sy * sy
        if vx <= 0 or vy <= 0:
            continue
        r = (n * sxy - sx * sy) / (vx ** 0.5 * vy ** 0.5)
        if abs(r) > epsilon:
            hints.append((a, b, r))
    return hints


def discrete_stats_hints(
    expanded: DataFrame,
    features: list[str],
    max_buckets: int = 64,
    fundep_size: int = 2,
) -> list[tuple[str, ...]]:
    """Soft-FD candidate feature tuples: co-occurrence histograms with
    few classes (reference drops histograms past max_buckets —
    analyzers/discrete.py:44-52). An approx_count_distinct pre-filter
    skips high-cardinality columns before any pair counting."""
    card = expanded.agg(
        *[F.approx_count_distinct(f"`{c}`").alias(c) for c in features]
    ).collect()[0]
    low = [c for c in features if (card[c] or 0) <= max_buckets]
    hints = []
    for combo in combinations(low, fundep_size):
        n_comb = (
            expanded.agg(
                F.approx_count_distinct(F.concat_ws("", *[F.col(f"`{c}`") for c in combo]))
            ).collect()[0][0]
        )
        if n_comb <= max_buckets:
            hints.append(combo)
    return hints


def cords_hints(
    expanded: DataFrame,
    features: list[str],
    p_value_max: float = 0.001,
    max_buckets: int = 64,
) -> list[tuple[str, str, float]]:
    """CORDS-style correlated-column detection: chi-squared statistic on
    the pair contingency table (reference analyzers/cords.py:26-90).

    Returns (a, b, chi2_stat) pairs whose independence hypothesis is
    wildly violated. Computed from grouped counts — one shuffle per
    pair of low-cardinality features; the chi2 statistic is compared to
    a conservative threshold (df-scaled) instead of a p-value (no scipy).
    """
    card = expanded.agg(
        *[F.approx_count_distinct(f"`{c}`").alias(c) for c in features]
    ).collect()[0]
    low = [c for c in features if 2 <= (card[c] or 0) <= max_buckets]
    out = []
    for a, b in combinations(low, 2):
        ct = (
            expanded.groupBy(F.col(f"`{a}`").alias("x"), F.col(f"`{b}`").alias("y"))
            .agg(F.count(F.lit(1)).alias("n"))
        )
        tot = ct.agg(F.sum("n")).collect()[0][0]
        rows = ct.collect()
        rx: dict = {}
        ry: dict = {}
        for r in rows:
            rx[r["x"]] = rx.get(r["x"], 0) + r["n"]
            ry[r["y"]] = ry.get(r["y"], 0) + r["n"]
        chi2 = 0.0
        for r in rows:
            exp = rx[r["x"]] * ry[r["y"]] / tot
            if exp > 0:
                chi2 += (r["n"] - exp) ** 2 / exp
        dof = max((len(rx) - 1) * (len(ry) - 1), 1)
        # crude threshold: chi2 >> dof signals dependence; 10×dof+20 is
        # far past the p=0.001 critical value for all small dof
        if chi2 > 10 * dof + 20:
            out.append((a, b, chi2))
    return out
