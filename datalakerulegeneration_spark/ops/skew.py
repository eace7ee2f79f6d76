"""Skew-mitigation helpers: salting for hot keys.

AQE's skew-join handling (on by default in the session factory) splits
oversized shuffle partitions at runtime, but it only applies to
sort-merge joins AFTER a shuffle materializes. Explicit salting is the
plan-level tool for the cases AQE can't reach: hot-key aggregations
(one reducer owns the key) and broadcast-ineligible joins against a
replicable side.

Salts derive from the row's physical position (partition id + offset),
NOT from row content: a content hash would send the canonical worst
case — millions of IDENTICAL rows under one hot key — to a single
(key, salt) group and mitigate nothing. The salt assignment therefore
depends on the input's physical layout; the RESULTS never do (any salt
assignment aggregates/joins to the same rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _position_salt(n_salts: int):
    # spark_partition_id is stable for a given layout; the intra-task
    # monotonic id spreads rows WITHIN a partition across salts
    return F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(n_salts))


def salted_group_count(df: DataFrame, keys: list[str], n_salts: int = 16) -> DataFrame:
    """``groupBy(keys).count()`` in two stages: rows first aggregate
    under (keys, salt) — spreading a hot key over ``n_salts`` reducers —
    then the per-salt partials (≤ n_salts rows per key) merge."""
    partial = (
        df.withColumn("__salt", _position_salt(n_salts))
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
    l = left.withColumn("__salt", _position_salt(n_salts))
    r = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return l.join(r, [on, "__salt"], how).drop("__salt")
