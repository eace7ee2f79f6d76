"""Distribution statistics from stored quantile vectors (F13, A6).

The reference computes KS / Wasserstein on raw value arrays
(method_2/pipleline_2.py:90-111). At scale the engine never re-scans
raw data for a column pair: each column stores a fixed quantile vector
in its profile, and both distances are computed from those sketches —
an O(k) driver/expression computation with documented approximation
error O(1/k).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_K = 32


def quantile_vector(df: DataFrame, col: str, k: int = DEFAULT_K) -> list[float]:
    """k-point quantile sketch of a numeric column (one pass,
    percentile_approx)."""
    ps = [i / (k - 1) for i in range(k)]
    row = df.agg(
        F.percentile_approx(F.col(col).cast("double"), ps, 10000).alias("q")
    ).collect()[0]
    return list(row["q"]) if row["q"] is not None else []


def wasserstein_from_quantiles(qa: list[float], qb: list[float]) -> float:
    """W1 distance ≈ mean |Qa(p) − Qb(p)| over matched quantiles —
    exact as k→∞ (the quantile form of earth-mover's on R)."""
    if not qa or not qb or len(qa) != len(qb):
        return float("nan")
    return sum(abs(x - y) for x, y in zip(qa, qb)) / len(qa)


def ks_distance_from_quantiles(qa: list[float], qb: list[float]) -> float:
    """KS statistic ≈ max CDF gap evaluated on the merged quantile
    grid: for each value v in either sketch, |Fa(v) − Fb(v)| where F is
    the empirical CDF interpolated from the sketch."""
    if not qa or not qb:
        return float("nan")

    def cdf(q: list[float], v: float) -> float:
        import bisect

        i = bisect.bisect_right(q, v)
        return i / len(q)

    grid = sorted(set(qa) | set(qb))
    return max(abs(cdf(qa, v) - cdf(qb, v)) for v in grid)


def dataset_similarity(dataset_profiles: DataFrame) -> DataFrame:
    """A6: pairwise cosine over flattened dataset-profile vectors
    (reference profile_similarity.py:22-53 uses DictVectorizer +
    sklearn cosine). One crossJoin over the (tiny, one-row-per-table)
    dataset profile frame; all arithmetic in expressions."""
    num_cols = [
        f.name
        for f in dataset_profiles.schema.fields
        if f.dataType.typeName() == "double"
    ]
    vec = F.array(*[F.coalesce(F.col(c), F.lit(0.0)) for c in num_cols])
    v = dataset_profiles.select(F.col("table"), vec.alias("vec"))
    a = v.select(F.col("table").alias("table_a"), F.col("vec").alias("va"))
    b = v.select(F.col("table").alias("table_b"), F.col("vec").alias("vb"))
    dot = "aggregate(zip_with(va, vb, (x, y) -> x * y), cast(0.0 as double), (acc, p) -> acc + p)"
    na = "sqrt(aggregate(zip_with(va, va, (x, y) -> x * y), cast(0.0 as double), (acc, p) -> acc + p))"
    nb = "sqrt(aggregate(zip_with(vb, vb, (x, y) -> x * y), cast(0.0 as double), (acc, p) -> acc + p))"
    return (
        a.crossJoin(b)
        .where(F.col("table_a") < F.col("table_b"))
        .select(
            "table_a",
            "table_b",
            F.round(F.expr(f"{dot} / nullif({na} * {nb}, 0.0)"), 6).alias("cosine_sim"),
        )
    )


def transferability_score(
    similarity: float, support: float, conflict: float,
    alpha: float = 1.0, beta: float = 1.0, gamma: float = 1.0,
) -> float:
    """A7: α·sim + β·support − γ·conflict (profile_similarity.py:64-65)."""
    return alpha * similarity + beta * support - gamma * conflict


def dataset_similarity_sql(
    tables: list[str], cols_kinds: dict[str, list[tuple[str, str]]]
) -> str:
    """DuckDB oracle for :func:`dataset_similarity` over LIVE profiles
    (profile_tables(with_tokens=False) → dataset_profile → cosine).

    Mirrors the engine end-to-end: wide per-column profiles re-derived
    from the raw tables (profiling.wide_sql), decimal-exact mean /
    population variance per stat (dataset_profile's portable recipe),
    then the cosine as the same left-folded sum-of-products over the
    (mean, var) vector in PROFILE_SCHEMA stat order, NULL slots
    coalesced to 0. Token-pass stats are NULL columns (with_tokens=False
    is the only oracle-checked mode).
    """
    from datalakerulegeneration_spark.profiling.wide_sql import (
        DOUBLE_STATS,
        wide_profile_sql,
    )

    prof = "\nUNION ALL\n".join(
        wide_profile_sql(t, cols_kinds[t], with_values=True) for t in tables
    )
    sums = []
    for c in DOUBLE_STATS:
        # value rounding happens at DECIMAL(18,6) — Spark's cast scale;
        # the widening to (19,6) only switches DuckDB's multiply onto
        # the INT128 path (DECIMAL(18)*DECIMAL(18) overflows its INT64
        # kernel); both engines' sums stay exact, so values agree.
        d = f"CAST(TRY_CAST({c} AS DECIMAL(18,6)) AS DECIMAL(19,6))"
        sums.append(f"sum({d}) AS s1_{c}")
        sums.append(f"sum({d} * {d}) AS s2_{c}")
        # count the CAST value (overflow -> NULL leaves numerator AND
        # denominator), mirroring dataset_profile
        sums.append(f"CAST(count({d}) AS DOUBLE) AS n_{c}")
    moments = []
    for c in DOUBLE_STATS:
        mean = f"(CAST(s1_{c} AS DOUBLE) / NULLIF(n_{c}, 0.0))"
        moments.append(f"{mean} AS {c}_mean")
        moments.append(
            f"(CAST(s2_{c} AS DOUBLE) / NULLIF(n_{c}, 0.0) - {mean} * {mean}) AS {c}_var"
        )
    vec_names = [f"{c}_{m}" for c in DOUBLE_STATS for m in ("mean", "var")]
    dot = " + ".join(f"COALESCE(a.{v}, 0.0) * COALESCE(b.{v}, 0.0)" for v in vec_names)
    na = " + ".join(f"COALESCE(a.{v}, 0.0) * COALESCE(a.{v}, 0.0)" for v in vec_names)
    nb = " + ".join(f"COALESCE(b.{v}, 0.0) * COALESCE(b.{v}, 0.0)" for v in vec_names)
    return f"""
WITH prof AS ({prof}),
sums AS (SELECT tbl, {', '.join(sums)} FROM prof GROUP BY tbl),
ds AS (SELECT tbl, {', '.join(moments)} FROM sums)
SELECT a.tbl AS table_a, b.tbl AS table_b,
       round((0.0 + {dot}) / NULLIF(sqrt(0.0 + {na}) * sqrt(0.0 + {nb}), 0.0), 6) AS cosine_sim
FROM ds a CROSS JOIN ds b
WHERE a.tbl < b.tbl
"""
