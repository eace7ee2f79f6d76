"""HyperLogLog: constant-size mergeable cardinality state.

Completes the mergeable-sketch trio next to ``ops.sketch`` (Count-Min,
frequency) and ``ops.bloom`` (membership): HLL answers "how many
DISTINCT values" in ``m`` registers of state regardless of
cardinality, with ~1.04/√m relative error (Flajolet et al. 2007), and
two sketches over the same ``m`` MERGE by register-wise MAX — the
fold-per-load contract that keeps 100 TB of history summarized as an
m-row table. Spark's own ``approx_count_distinct`` is HLL++ under the
hood but exposes neither its registers nor a merge, so the sketch
can't be persisted or folded across loads — this op owns the state.

Determinism contract (mirrors the other two sketches): the hash is
md5-derived — a value routes to register ``h % m`` and contributes
``rho(h div m)``, the 1-based position of the lowest set bit of the
remaining ~56 bits, computed by an unrolled exact-integer CASE chain
capped at ``RHO_CAP``. No log2/float bit-tricks anywhere, so the
register TABLE is bit-identical in Spark and DuckDB, and the estimate
(harmonic mean + linear-counting small-range correction, rounded to 6
decimals — ln() may differ in the last ulp across libm) is exactly
oracle-checkable.

Shapes: building is one scan — each value emits its (register, rho)
pair map-side and a register-grain MAX agg collapses every task to
≤ m rows before the shuffle, so shuffle volume is O(m × tasks) no
matter the corpus. Estimation is driver-free arithmetic over the
m-row frame. Grouped sketches (one per key) just add the key to the
grain; merge stays a unionByName + MAX.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# registers never exceed RHO_CAP: P(rho > 20) = 2^-20 per update, and
# BOTH engines cap identically so content parity is unconditional.
RHO_CAP = 20


def _h_expr(value_expr: str) -> str:
    """60-bit md5 integer (Spark SQL) — same idiom as ops.sketch."""
    return (
        f"cast(conv(substr(md5(cast({value_expr} as string)), 1, 15), 16, 10)"
        " as bigint)"
    )


def _h_sql(value_expr: str) -> str:
    """DuckDB twin of :func:`_h_expr`."""
    return f"('0x' || substr(md5(cast({value_expr} as VARCHAR)), 1, 15))::BIGINT"


def _rho_case(w: str) -> str:
    """1-based lowest-set-bit position of ``w`` as an exact-integer
    CASE chain (portable SQL: no bit intrinsics, no floats). ``w = 0``
    — possible only for the 2^-56 sliver of hashes with all remaining
    bits zero — also maps to RHO_CAP."""
    arms = "\n".join(
        f"  WHEN ({w}) % {1 << i} = {1 << (i - 1)} THEN {i}"
        for i in range(1, RHO_CAP)
    )
    return f"CASE\n{arms}\n  ELSE {RHO_CAP}\nEND"


def hll_sketch(
    df: DataFrame, col: str, m: int = 64, group_cols: list[str] | None = None
) -> DataFrame:
    """Build the sketch: ``(*group_cols, register, rho)`` — one row per
    touched register holding max rho (absent register ≡ 0)."""
    h = _h_expr(col)
    reg = F.expr(f"{h} % {m}").alias("register")
    rho = F.expr(_rho_case(f"{h} div {m}")).alias("rho_one")
    keys = list(group_cols or [])
    return (
        df.where(F.col(col).isNotNull())
        .select(*keys, reg, rho)
        .groupBy(*keys, "register")
        .agg(F.max("rho_one").cast("int").alias("rho"))
    )


def hll_sketch_sql(
    table: str, col: str, m: int = 64, group_cols: list[str] | None = None
) -> str:
    """DuckDB oracle for :func:`hll_sketch`."""
    h = _h_sql(col)
    keys = list(group_cols or [])
    sel = ", ".join([*keys, f"{h} % {m} AS register",
                     f"{_rho_case(f'{h} // {m}')} AS rho_one"])
    grain = ", ".join([*keys, "register"])
    outer = ", ".join([*keys, "register", "CAST(max(rho_one) AS INT) AS rho"])
    return f"""
SELECT {outer}
FROM (SELECT {sel} FROM {table} WHERE {col} IS NOT NULL)
GROUP BY {grain}
"""


def hll_merge(*sketches: DataFrame) -> DataFrame:
    """Merge sketches built with the same m: register-wise MAX over all
    grain columns. Order-invariant — the per-load/streaming fold."""
    u = sketches[0]
    for s in sketches[1:]:
        u = u.unionByName(s)
    keys = [c for c in u.columns if c != "rho"]
    return u.groupBy(*keys).agg(F.max("rho").cast("int").alias("rho"))


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def hll_estimate(
    sketch: DataFrame, m: int = 64, group_cols: list[str] | None = None
) -> DataFrame:
    """Cardinality estimate per group: harmonic-mean raw estimate with
    the standard small-range (linear counting) correction, rounded to
    6 decimals — ``(*group_cols, est)``. Arithmetic over the ≤ m-row
    register frame only."""
    keys = list(group_cols or [])
    agg = sketch.groupBy(*keys).agg(
        F.sum(F.pow(F.lit(2.0), -F.col("rho"))).alias("s"),
        F.count(F.lit(1)).alias("nz"),
    )
    alpha = _alpha(m)
    raw = F.lit(alpha * m * m) / (F.col("s") + (F.lit(m) - F.col("nz")))
    zeros = F.lit(m) - F.col("nz")
    linear = F.lit(float(m)) * F.log(F.lit(float(m)) / zeros)
    est = F.when((raw <= F.lit(2.5 * m)) & (zeros > 0), linear).otherwise(raw)
    return agg.select(*keys, F.round(est, 6).alias("est"))


def hll_estimate_sql(
    sketch_sql: str, m: int = 64, group_cols: list[str] | None = None
) -> str:
    """DuckDB oracle for :func:`hll_estimate` over a sketch subquery."""
    keys = list(group_cols or [])
    ksel = "".join(f"{k}, " for k in keys)
    grain = f"GROUP BY {', '.join(keys)}" if keys else ""
    # alpha spelled as an explicit DOUBLE cast: DuckDB would otherwise
    # type the long literal DECIMAL(18,*) and overflow on * m * m.
    alpha = f"CAST({_alpha(m)!r} AS DOUBLE)"
    raw = f"{alpha} * {m} * {m} / (s + ({m} - nz))"
    return f"""
WITH agg AS (
  SELECT {ksel}sum(power(2.0, -rho)) AS s, count(*) AS nz
  FROM ({sketch_sql}) {grain}
)
SELECT {ksel}round(
  CASE WHEN {raw} <= {2.5 * m} AND ({m} - nz) > 0
       THEN {float(m)} * ln({float(m)} / ({m} - nz))
       ELSE {raw} END, 6) AS est
FROM agg
"""


def hll_distinct_audit(
    df: DataFrame, col: str, group_col: str, m: int = 64
) -> DataFrame:
    """Audit query pairing each group's HLL estimate with its exact
    distinct count — ``(group, est, exact_n, rel_err)`` — the shape
    that PROVES the ~1.04/√m error contract on real data (same audit
    pattern as ``sketch.cm_heavy_hitters`` and
    ``bloom.bloom_decontaminate``). At production scale the exact side
    is the expensive pass the sketch replaces."""
    sk = hll_sketch(df, col, m, [group_col])
    est = hll_estimate(sk, m, [group_col])
    exact = (
        df.where(F.col(col).isNotNull())
        .groupBy(group_col)
        .agg(F.count_distinct(F.col(col)).cast("bigint").alias("exact_n"))
    )
    return est.join(exact, group_col).select(
        group_col,
        "est",
        "exact_n",
        F.round((F.col("est") - F.col("exact_n")) / F.col("exact_n"), 6).alias(
            "rel_err"
        ),
    )


def hll_distinct_audit_sql(table: str, col: str, group_col: str, m: int = 64) -> str:
    """DuckDB oracle for :func:`hll_distinct_audit`."""
    sk = hll_sketch_sql(table, col, m, [group_col]).strip()
    est = hll_estimate_sql(sk, m, [group_col]).strip()
    return f"""
WITH est AS ({est}),
exact AS (
  SELECT {group_col}, CAST(count(DISTINCT {col}) AS BIGINT) AS exact_n
  FROM {table} WHERE {col} IS NOT NULL GROUP BY {group_col}
)
SELECT est.{group_col}, est.est, exact.exact_n,
       round((est.est - exact.exact_n) / exact.exact_n, 6) AS rel_err
FROM est JOIN exact ON est.{group_col} = exact.{group_col}
"""


def hll_overlap(df: DataFrame, col: str, group_col: str, m: int = 64) -> DataFrame:
    """Pairwise distinct-value OVERLAP estimates between groups by
    sketch inclusion–exclusion: |A∩B| ≈ est(A) + est(B) − est(A∪B),
    where the union sketch is register-wise MAX — the question
    ``source_overlap_matrix`` answers exactly with an inverted-index
    join, answered here from O(#groups·m) sketch state with NO
    value-keyed corpus join (the 100 TB shape: sketches persist per
    load, overlaps come free afterwards). Audit form: each pair also
    carries its exact intersection count, so the error contract is
    visible on real data (same pattern as hll_distinct_audit).

    Returns ``(group_a, group_b, est_overlap, exact_overlap)`` for
    group_a < group_b; ``est_overlap`` is inclusion–exclusion over the
    6-dp-rounded estimates, floored at 0 (the estimator can go
    negative on disjoint sets).
    """
    sk = hll_sketch(df, col, m, [group_col])
    est = hll_estimate(sk, m, [group_col])
    groups = sk.select(F.col(group_col).alias("group_a")).distinct()
    pairs = groups.crossJoin(
        groups.select(F.col("group_a").alias("group_b"))
    ).where(F.col("group_a") < F.col("group_b"))
    # pair-expand both sides' registers; #groups^2 x m rows max
    left = pairs.join(
        F.broadcast(sk), pairs["group_a"] == sk[group_col]
    ).select("group_a", "group_b", "register", "rho")
    right = pairs.join(
        F.broadcast(sk), pairs["group_b"] == sk[group_col]
    ).select("group_a", "group_b", "register", "rho")
    union_sk = (
        left.unionByName(right)
        .groupBy("group_a", "group_b", "register")
        .agg(F.max("rho").cast("int").alias("rho"))
    )
    est_u = hll_estimate(union_sk, m, ["group_a", "group_b"]).withColumnRenamed(
        "est", "est_union"
    )
    ea = est.select(F.col(group_col).alias("group_a"), F.col("est").alias("est_a"))
    eb = est.select(F.col(group_col).alias("group_b"), F.col("est").alias("est_b"))
    est_pairs = est_u.join(F.broadcast(ea), "group_a").join(F.broadcast(eb), "group_b")
    # exact side of the audit: values present in BOTH groups
    gv = df.where(F.col(col).isNotNull()).select(
        F.col(group_col).alias("g"), F.col(col).alias("v")
    ).distinct()
    a, b = gv.alias("a"), gv.alias("b")
    exact = (
        a.join(b.hint("merge"), (F.col("a.v") == F.col("b.v")) & (F.col("a.g") < F.col("b.g")))
        .groupBy(F.col("a.g").alias("group_a"), F.col("b.g").alias("group_b"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("exact_overlap"))
    )
    return (
        est_pairs.join(exact, ["group_a", "group_b"], "left")
        .select(
            "group_a",
            "group_b",
            F.round(
                F.greatest(
                    F.lit(0.0), F.col("est_a") + F.col("est_b") - F.col("est_union")
                ),
                6,
            ).alias("est_overlap"),
            F.coalesce(F.col("exact_overlap"), F.lit(0)).cast("bigint").alias("exact_overlap"),
        )
    )


def hll_overlap_sql(table: str, col: str, group_col: str, m: int = 64) -> str:
    """DuckDB oracle for :func:`hll_overlap`."""
    sk = hll_sketch_sql(table, col, m, [group_col]).strip()
    est = hll_estimate_sql(sk, m, [group_col]).strip()
    union_sk = f"""
SELECT group_a, group_b, register, CAST(max(rho) AS INT) AS rho
FROM (
  SELECT p.group_a, p.group_b, s.register, s.rho
  FROM pairs p JOIN sk s ON p.group_a = s.{group_col}
  UNION ALL
  SELECT p.group_a, p.group_b, s.register, s.rho
  FROM pairs p JOIN sk s ON p.group_b = s.{group_col}
)
GROUP BY 1, 2, 3
"""
    est_u = hll_estimate_sql("SELECT * FROM union_sk", m, ["group_a", "group_b"]).strip()
    return f"""
WITH sk AS ({sk}),
est AS ({est}),
groups AS (SELECT DISTINCT {group_col} AS g FROM sk),
pairs AS (
  SELECT a.g AS group_a, b.g AS group_b FROM groups a JOIN groups b ON a.g < b.g
),
union_sk AS ({union_sk}),
est_u AS ({est_u}),
gv AS (SELECT DISTINCT {group_col} AS g, {col} AS v FROM {table} WHERE {col} IS NOT NULL),
exact AS (
  SELECT a.g AS group_a, b.g AS group_b, CAST(count(*) AS BIGINT) AS exact_overlap
  FROM gv a JOIN gv b ON a.v = b.v AND a.g < b.g
  GROUP BY 1, 2
)
SELECT eu.group_a, eu.group_b,
       round(greatest(0.0, ea.est + eb.est - eu.est), 6) AS est_overlap,
       CAST(COALESCE(exact.exact_overlap, 0) AS BIGINT) AS exact_overlap
FROM est_u eu
JOIN est ea ON ea.{group_col} = eu.group_a
JOIN est eb ON eb.{group_col} = eu.group_b
LEFT JOIN exact ON exact.group_a = eu.group_a AND exact.group_b = eu.group_b
"""
