"""Ground truth: positional dirty↔clean cell diff (reference J1).

The reference walks every cell of both frames (dataset.py:56-62,
utils/metrics.py:74-109). Spark version: both tables get a row id
(a shared key column — fixture CSVs carry ``index``/``tuple_id``/``id``;
SURVEY §7.3.3), then ONE equi-join on the id and ONE ``stack`` unpivot
produce the cell-grain mismatch set. AQE handles the join; no
cell loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_row_id(df: DataFrame, key: str | None = None) -> DataFrame:
    """Stable row id: a real key column when available, else a
    contiguous 0..n-1 surrogate in partition order (order-dependent —
    documented), built ENTIRELY JVM-side: ``monotonically_increasing_id``
    packs (partition, local index), partition counts give the offsets
    via a tiny partition-grain aggregate broadcast back. No ``.rdd``
    round-trip through the Python serializer (r02 verdict item)."""
    if key and key in df.columns:
        return df.withColumn("__row_id", F.col(key).cast("string"))
    from pyspark.sql import Window

    # mid = (partition id << 33) + row index within partition
    local_mask = (1 << 33) - 1
    d = df.withColumn("_pid", F.spark_partition_id()).withColumn(
        "_local", F.monotonically_increasing_id().bitwiseAND(F.lit(local_mask))
    )
    # #partitions-row frame; the unpartitioned window scans only those rows
    wp = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    off = (
        d.groupBy("_pid")
        .agg(F.count(F.lit(1)).alias("_n"))
        .withColumn("_off", F.coalesce(F.sum("_n").over(wp), F.lit(0)))
        .select("_pid", "_off")
    )
    return (
        d.join(F.broadcast(off), "_pid")
        .withColumn("__row_id", (F.col("_off") + F.col("_local")).cast("string"))
        .drop("_pid", "_local", "_off")
    )


def cell_diff(dirty: DataFrame, clean: DataFrame, key: str | None = None) -> DataFrame:
    """Cells where dirty != clean → ``(row_id, column, dirty_value,
    clean_value)`` (the actual-error set).

    Null semantics: a cell differs when exactly one side is null/empty
    or both present and unequal — matching the reference's string-level
    comparison on all-string frames.
    """
    cols = [c for c in dirty.columns if c in set(clean.columns)]
    d = with_row_id(dirty, key)
    c = with_row_id(clean, key)
    d_cells = _melt_cells(d, cols, "dirty_value")
    c_cells = _melt_cells(c, cols, "clean_value")
    joined = d_cells.join(c_cells, ["__row_id", "column"], "inner")
    dv = F.coalesce(F.col("dirty_value"), F.lit(""))
    cv = F.coalesce(F.col("clean_value"), F.lit(""))
    return (
        joined.where(dv != cv)
        .select(
            F.col("__row_id").alias("row_id"),
            "column",
            "dirty_value",
            "clean_value",
        )
    )


def _melt_cells(df: DataFrame, cols: list[str], value_name: str) -> DataFrame:
    parts = [f"'{c}', CAST(`{c}` AS STRING)" for c in cols]
    stack_expr = f"stack({len(parts)}, {', '.join(parts)}) as (column, {value_name})"
    return df.select("__row_id", F.expr(stack_expr))
