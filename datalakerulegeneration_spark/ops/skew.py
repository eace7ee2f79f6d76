"""Skew-mitigation helpers: salting for hot keys.

AQE's skew-join handling (on by default in the session factory) splits
oversized shuffle partitions at runtime, but it only applies to
sort-merge joins AFTER a shuffle materializes. Explicit salting is the
plan-level tool for the cases AQE can't reach: hot-key aggregations
(one reducer owns the key) and broadcast-ineligible joins against a
replicable side.

Both helpers are deterministic (md5-free hash salting, no rand()), so
results are stable run-to-run and testable by equality against the
unsalted plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_group_count(df: DataFrame, keys: list[str], n_salts: int = 16) -> DataFrame:
    """``groupBy(keys).count()`` in two stages: rows first aggregate
    under (keys, salt) — spreading a hot key over ``n_salts`` reducers —
    then the per-salt partials (≤ n_salts rows per key) merge. The salt
    is a deterministic hash of the whole row, so identical inputs give
    identical plans and results."""
    salt = F.pmod(F.hash(F.struct(*[F.col(c) for c in df.columns])), F.lit(n_salts))
    partial = (
        df.withColumn("__salt", salt)
        .groupBy(*keys, "__salt")
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    return partial.groupBy(*keys).agg(F.sum("__n").alias("count"))


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``left`` has hot keys and ``right`` is small
    enough to replicate ``n_salts`` times (but perhaps not small enough
    to broadcast outright).

    Left rows get a deterministic salt in [0, n_salts); right rows are
    exploded across every salt value; the join key becomes
    (on, salt) — a hot key's rows now land on ``n_salts`` different
    reducers instead of one. Result is row-identical to
    ``left.join(right, on, how)`` for 'inner' and 'left'.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left (right side is replicated)")
    salt = F.pmod(F.hash(F.struct(*[F.col(c) for c in left.columns])), F.lit(n_salts))
    l = left.withColumn("__salt", salt)
    r = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return l.join(r, [on, "__salt"], how).drop("__salt")
