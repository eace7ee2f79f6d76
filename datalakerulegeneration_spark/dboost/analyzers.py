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

    r is computed from exact decimal sums in one aggregation —
    deterministic across runs and engines, unlike ``corr()`` whose
    double summation is partition-order-dependent. All five sums for a
    pair are restricted to PAIRWISE-COMPLETE rows (both features
    non-null), so r is the true Pearson r of the complete pairs even
    when the columns are null in different rows.
    """
    aggs = []
    for a, b in combinations(features, 2):
        both = f"`{a}` is not null and `{b}` is not null"
        key = f"{a}|{b}"
        aggs.append(
            F.sum(F.expr(f"case when {both} then {_dec(a)} end")).cast("double").alias(f"sx_{key}")
        )
        aggs.append(
            F.sum(F.expr(f"case when {both} then {_dec(b)} end")).cast("double").alias(f"sy_{key}")
        )
        aggs.append(
            F.sum(F.expr(f"case when {both} then cast(`{a}` * `{a}` as decimal(38,12)) end"))
            .cast("double")
            .alias(f"sxx_{key}")
        )
        aggs.append(
            F.sum(F.expr(f"case when {both} then cast(`{b}` * `{b}` as decimal(38,12)) end"))
            .cast("double")
            .alias(f"syy_{key}")
        )
        aggs.append(
            F.sum(F.expr(f"case when {both} then cast(`{a}` * `{b}` as decimal(38,12)) end"))
            .cast("double")
            .alias(f"sxy_{key}")
        )
        aggs.append(F.sum(F.expr(f"case when {both} then 1 else 0 end")).cast("double").alias(f"n_{key}"))
    row = expanded.agg(*aggs).collect()[0].asDict()
    hints = []
    for a, b in combinations(features, 2):
        key = f"{a}|{b}"
        n = row[f"n_{key}"]
        if not n or n < 2:
            continue
        sx, sy = row[f"sx_{key}"], row[f"sy_{key}"]
        sxx, syy = row[f"sxx_{key}"], row[f"syy_{key}"]
        sxy = row[f"sxy_{key}"]
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
                # separator + null sentinel: a bare concat would collapse
                # ('ab','c')/('a','bc') and concat_ws drops nulls
                F.approx_count_distinct(
                    F.concat_ws(
                        "\x1f",
                        *[
                            F.coalesce(F.col(f"`{c}`").cast("string"), F.lit("\x00"))
                            for c in combo
                        ],
                    )
                )
            ).collect()[0][0]
        )
        if n_comb <= max_buckets:
            hints.append(combo)
    return hints


def cords_sample_size(d1: int, d2: int, p: float, delta: float = 0.005) -> float:
    """The CORDS sample-size formula (reference cords.py:76-77): rows
    needed so a dependence of strength ``delta`` is detected with
    worst-case false-reject probability ``p``. Advisory — callers can
    sample ``n`` rows instead of scanning everything."""
    import math

    v = max((d1 - 1) * (d2 - 1), 1)
    d = min(d1, d2)
    lnp = math.log(p * math.sqrt(2 * math.pi))
    return (math.sqrt(-16 * v * lnp) - 8 * lnp) / (
        1.69 * delta * max(d - 1, 1) * pow(v, -0.071)
    )


def cords_threshold(d1: int, d2: int, p: float) -> float:
    """Chi² critical value at significance ``p`` for a d1×d2 table
    (Wilson–Hilferty approximation, stdlib only).

    The reference pairs its threshold with an unnormalized statistic
    that scales as n² (cords.py:78 — raw Nx·Ny products instead of
    expected counts Nx·Ny/n, an acknowledged hack); against the
    standard Pearson statistic that threshold is unreachable (≥5·10⁴
    even for 2×2). We keep the standard statistic and test it against
    the proper chi² quantile, which is what the CORDS paper's test
    reduces to at full-data scan.
    """
    from statistics import NormalDist

    v = max((d1 - 1) * (d2 - 1), 1)
    z = NormalDist().inv_cdf(1 - p)
    return v * (1 - 2 / (9 * v) + z * (2 / (9 * v)) ** 0.5) ** 3


def cords_hints(
    expanded: DataFrame,
    features: list[str],
    p_value_max: float = 0.001,
    delta: float = 0.005,
    max_buckets: int = 64,
) -> list[tuple[str, str, float]]:
    """CORDS correlated-column detection (reference cords.py:26-90):
    chi-squared statistic on the pair contingency table against the
    CORDS sample-size threshold.

    Reference parity notes:

    * **sparse-table shortcut** (cords.py:66-69): if more than half the
      d1×d2 cells are empty the pair is a soft-FD hint outright
      (emitted with chi2 = +inf, no test needed);
    * **threshold** — the chi² quantile at significance p via
      :func:`cords_threshold`; the paper's sample-size formula is
      exposed as :func:`cords_sample_size` (p = worst-case false-reject
      probability, δ = the --statistical epsilon);
    * the contingency table is built at value grain from grouped counts
      (one shuffle per low-cardinality pair) instead of the reference's
      ``hash(x) % cardinality`` bucketing (a dictionary-free artifact —
      cords.py:44-47 FIXME), and the statistic uses the standard
      expected count Nx·Ny/n where the reference multiplies raw margins
      (cords.py:78 — scales as n², acknowledged "hackety hack").
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
        rows = ct.collect()
        tot = sum(r["n"] for r in rows)
        rx: dict = {}
        ry: dict = {}
        for r in rows:
            rx[r["x"]] = rx.get(r["x"], 0) + r["n"]
            ry[r["y"]] = ry.get(r["y"], 0) + r["n"]
        d1, d2 = len(rx), len(ry)
        if d1 < 2 or d2 < 2:
            continue
        if d1 * d2 - len(rows) > d1 * d2 * 0.5:
            out.append((a, b, float("inf")))  # sparse → soft FD
            continue
        chi2 = 0.0
        for r in rows:
            exp = rx[r["x"]] * ry[r["y"]] / tot
            if exp > 0:
                chi2 += (r["n"] - exp) ** 2 / exp
        if chi2 > cords_threshold(d1, d2, p_value_max):
            out.append((a, b, chi2))
    return out
