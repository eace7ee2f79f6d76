"""Count-Min sketch: mergeable frequency state for monitoring at scale.

The CM sketch answers "how often does value v occur" within additive
error ε·N using ``depth × width`` counters — O(1) state per stream
regardless of cardinality, and two sketches MERGE by cell-wise
addition, the property that lets 100 TB of history stay summarized as
a tiny table folded in per load (same design as the mergeable-stats
profiler state and the HLL distinct sketches).

Determinism contract: the d hash rows are md5-derived (row i hashes
``md5(i || ':' || value)``), so the sketch CONTENT — not just its
estimates — is identical in Spark and DuckDB, giving exact oracle
hash-matches for both the sketch and any point estimate.

Shapes: building is one scan — each row emits its ``depth`` (row,
bucket) cells map-side and a (row, bucket)-grain hash agg sums them
(partial aggregation collapses every task to ≤ depth×width rows, so
the shuffle is O(depth×width×tasks) no matter the corpus). Estimation
joins the queried values against the depth×width-row sketch —
broadcast-sized by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bucket_expr(value_expr: str, row: int, width: int) -> str:
    """Spark SQL bucket for hash row ``row`` — md5-derived, portable."""
    return (
        f"cast(conv(substr(md5(concat('{row}:', {value_expr})), 1, 15), 16, 10)"
        f" as bigint) % {width}"
    )


def _bucket_sql(value_expr: str, row: int, width: int) -> str:
    """DuckDB twin of :func:`_bucket_expr` (same 60-bit md5 prefix,
    same ``('0x'||hex)::BIGINT`` idiom the dedup oracles use)."""
    return (
        f"('0x' || substr(md5(concat('{row}:', {value_expr})), 1, 15))::BIGINT"
        f" % {width}"
    )


def cm_sketch(
    df: DataFrame, col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """Build the sketch: ``(row, bucket, n)`` — depth×width cells (cells
    never touched stay absent, equivalent to zero)."""
    cells = F.array(
        *[
            F.struct(
                F.lit(r).alias("row"),
                F.expr(_bucket_expr(col, r, width)).alias("bucket"),
            )
            for r in range(depth)
        ]
    )
    return (
        df.where(F.col(col).isNotNull())
        .select(F.explode(cells).alias("c"))
        .groupBy(F.col("c.row").alias("row"), F.col("c.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def cm_sketch_sql(table: str, col: str, depth: int = 4, width: int = 256) -> str:
    """DuckDB oracle for :func:`cm_sketch`."""
    rows = "\nUNION ALL\n".join(
        f"SELECT {r} AS row, {_bucket_sql(col, r, width)} AS bucket"
        f" FROM {table} WHERE {col} IS NOT NULL"
        for r in range(depth)
    )
    return f"""
WITH cells AS ({rows})
SELECT row, bucket, count(*) AS n FROM cells GROUP BY row, bucket
"""


def cm_merge(*sketches: DataFrame) -> DataFrame:
    """Merge sketches built with the same (depth, width): cell-wise sum.
    Order-invariant, so per-load partial sketches fold into the running
    state in any order — the streaming/backfill contract."""
    u = sketches[0]
    for s in sketches[1:]:
        u = u.unionByName(s)
    return u.groupBy("row", "bucket").agg(F.sum("n").alias("n"))


def cm_estimate(
    sketch: DataFrame, values: DataFrame, col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """Point estimates for each value in ``values[col]``: min over the
    depth cells — ``(value, est)``. ``est ≥ true`` always; the
    overcount is bounded by ~N/width per the CM guarantee. The sketch
    side is depth×width rows → broadcast."""
    probes = (
        values.where(F.col(col).isNotNull())
        .select(F.col(col).alias("value"))
        .distinct()
        .select(
            "value",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(r).alias("row"),
                            F.expr(_bucket_expr("value", r, width)).alias("bucket"),
                        )
                        for r in range(depth)
                    ]
                )
            ).alias("c"),
        )
        .select("value", F.col("c.row").alias("row"), F.col("c.bucket").alias("bucket"))
    )
    return (
        probes.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .groupBy("value")
        .agg(F.min(F.coalesce(F.col("n"), F.lit(0))).cast("bigint").alias("est"))
    )


def cm_heavy_hitters_sql(
    table: str, col: str, depth: int = 4, width: int = 256
) -> str:
    """DuckDB oracle for the heavy-hitter audit query: per distinct
    value, the CM estimate next to the exact count and the overcount."""
    sk = cm_sketch_sql(table, col, depth, width).strip()
    rows = "\nUNION ALL\n".join(
        f"SELECT value, {r} AS row, {_bucket_sql('value', r, width)} AS bucket"
        f" FROM (SELECT DISTINCT {col} AS value FROM {table} WHERE {col} IS NOT NULL)"
        for r in range(depth)
    )
    return f"""
WITH sketch AS ({sk}),
probes AS ({rows}),
est AS (
  SELECT p.value, CAST(min(COALESCE(s.n, 0)) AS BIGINT) AS est
  FROM probes p LEFT JOIN sketch s ON p.row = s.row AND p.bucket = s.bucket
  GROUP BY p.value
),
exact AS (
  SELECT {col} AS value, count(*) AS exact_n FROM {table}
  WHERE {col} IS NOT NULL GROUP BY {col}
)
SELECT est.value, est.est, CAST(exact.exact_n AS BIGINT) AS exact_n,
       CAST(est.est - exact.exact_n AS BIGINT) AS overcount
FROM est JOIN exact ON est.value = exact.value
"""


def cm_heavy_hitters(
    df: DataFrame, col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """Audit query pairing each distinct value's CM estimate with its
    exact count — ``(value, est, exact_n, overcount)``. At production
    scale the exact side is the expensive pass this sketch replaces;
    pairing them here is what PROVES the estimate contract
    (est ≥ exact, bounded overcount) on real data."""
    sk = cm_sketch(df, col, depth, width)
    est = cm_estimate(sk, df, col, depth, width)
    exact = (
        df.where(F.col(col).isNotNull())
        .groupBy(F.col(col).alias("value"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("exact_n"))
    )
    return est.join(exact, "value").select(
        "value",
        "est",
        "exact_n",
        (F.col("est") - F.col("exact_n")).cast("bigint").alias("overcount"),
    )
