"""Streaming monitors over persisted mergeable sketches (CM + HLL).

The batch sketches (``ops.sketch``, ``ops.hll``) are mergeable by
construction — cell-wise addition / register-wise MAX — which makes
their streaming forms trivial and restart-safe: each micro-batch
builds its partial sketch (one scan, O(state) rows out) and folds it
into the on-disk state, exactly the incremental-profiler pattern. The
monitors then answer "how often has value v occurred" / "how many
distinct values" across the WHOLE stream history from constant-size
state, regardless of how many loads or how high the cardinality — the
100 TB shape for monitoring questions that don't justify an exact
distinct-value table.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from datalakerulegeneration_spark.ops.hll import hll_estimate, hll_merge, hll_sketch
from datalakerulegeneration_spark.ops.sketch import cm_estimate, cm_merge, cm_sketch


class CMSketchMonitor:
    """foreachBatch sink folding per-batch sketches into parquet state."""

    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        col: str,
        depth: int = 4,
        width: int = 256,
    ):
        self.spark = spark
        self.state_path = os.path.join(state_dir, "cm_state")
        self.col = col
        self.depth = depth
        self.width = width

    def update(self, batch: DataFrame, batch_id: int) -> None:
        part = cm_sketch(batch, self.col, self.depth, self.width)
        if os.path.exists(self.state_path):
            prev = self.spark.read.parquet(self.state_path)
            merged = cm_merge(prev, part)
        else:
            merged = part
        tmp = self.state_path + ".tmp"
        merged.write.mode("overwrite").parquet(tmp)
        self.spark.read.parquet(tmp).write.mode("overwrite").parquet(self.state_path)

    def sketch(self) -> DataFrame:
        return self.spark.read.parquet(self.state_path)

    def estimate(self, values: DataFrame) -> DataFrame:
        """Point estimates ``(value, est)`` for ``values[self.col]``
        against the full stream history."""
        return cm_estimate(self.sketch(), values, self.col, self.depth, self.width)


def sketch_stream(
    spark: SparkSession,
    stream: DataFrame,
    state_dir: str,
    col: str,
    depth: int = 4,
    width: int = 256,
    checkpoint_dir: str | None = None,
):
    """Wire a streaming DataFrame into the sketch monitor; returns
    ``(StreamingQuery, CMSketchMonitor)``."""
    mon = CMSketchMonitor(spark, state_dir, col, depth, width)
    writer = (
        stream.writeStream.foreachBatch(mon.update)
        .outputMode("update")
        .trigger(availableNow=True)
    )
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start(), mon


class HLLMonitor:
    """foreachBatch sink folding per-batch HLL registers into parquet
    state — the streaming distinct-count monitor (optionally grouped,
    e.g. distinct users per event_type across all loads)."""

    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        col: str,
        m: int = 256,
        group_cols: list[str] | None = None,
    ):
        self.spark = spark
        self.state_path = os.path.join(state_dir, "hll_state")
        self.col = col
        self.m = m
        self.group_cols = list(group_cols or [])

    def update(self, batch: DataFrame, batch_id: int) -> None:
        part = hll_sketch(batch, self.col, self.m, self.group_cols)
        if os.path.exists(self.state_path):
            prev = self.spark.read.parquet(self.state_path)
            merged = hll_merge(prev, part)
        else:
            merged = part
        tmp = self.state_path + ".tmp"
        merged.write.mode("overwrite").parquet(tmp)
        self.spark.read.parquet(tmp).write.mode("overwrite").parquet(self.state_path)

    def sketch(self) -> DataFrame:
        return self.spark.read.parquet(self.state_path)

    def estimate(self) -> DataFrame:
        """Distinct-count estimate per group over the full history."""
        return hll_estimate(self.sketch(), self.m, self.group_cols)


def hll_stream(
    spark: SparkSession,
    stream: DataFrame,
    state_dir: str,
    col: str,
    m: int = 256,
    group_cols: list[str] | None = None,
    checkpoint_dir: str | None = None,
):
    """Wire a streaming DataFrame into the HLL monitor; returns
    ``(StreamingQuery, HLLMonitor)``."""
    mon = HLLMonitor(spark, state_dir, col, m, group_cols)
    writer = (
        stream.writeStream.foreachBatch(mon.update)
        .outputMode("update")
        .trigger(availableNow=True)
    )
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start(), mon
