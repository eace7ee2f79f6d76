"""Streaming monitors over persisted mergeable sketches (CM + HLL).

The batch sketches (``ops.sketch``, ``ops.hll``) are mergeable by
construction — cell-wise addition / register-wise MAX — which makes
their streaming forms trivial: each micro-batch builds its partial
sketch (one scan, O(state) rows out) and folds it into the on-disk
state, exactly the incremental-profiler pattern. The monitors then
answer "how often has value v occurred" / "how many distinct values"
across the WHOLE stream history from constant-size state, regardless
of how many loads or how high the cardinality — the 100 TB shape for
monitoring questions that don't justify an exact distinct-value table.

**Replay idempotency.** ``foreachBatch`` re-delivers the last
uncommitted micro-batch after a crash (state write succeeded, source
checkpoint commit didn't). For the ADDITIVE Count-Min fold, folding
that batch twice double-counts silently; even the max-merge HLL is
only safe by accident. Both monitors therefore keep exactly-once state
the standard way: the merged sketch is written to a per-batch
VERSIONED directory (``*_state_{batch_id}``) and a marker file is
atomically flipped (``os.replace``) to point at it only after the
write completes. ``update`` no-ops when the incoming batch_id is ≤ the
marker's. Crash before the flip → replay rebuilds the same versioned
dir from the still-marked previous state and flips; crash after →
replay no-ops. The guard assumes what foreachBatch itself assumes: one
logical stream per state dir with a CHECKPOINTED source, so batch ids
are monotone across restarts (an un-checkpointed stream restarts ids
at 0 — there the guard, like foreachBatch replay semantics generally,
does not apply).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession

from datalakerulegeneration_spark.ops.hll import hll_estimate, hll_merge, hll_sketch
from datalakerulegeneration_spark.ops.sketch import cm_estimate, cm_merge, cm_sketch


class _MergeMonitor:
    """Shared exactly-once fold: versioned state dirs + atomic marker."""

    def __init__(self, spark: SparkSession, state_dir: str, name: str):
        self.spark = spark
        self.state_dir = state_dir
        self._prefix = os.path.join(state_dir, f"{name}_state")
        self._marker = os.path.join(state_dir, f"{name}_APPLIED")

    def applied_batch_id(self) -> int | None:
        """batch_id of the last fully-committed fold, or None."""
        if os.path.exists(self._marker):
            with open(self._marker) as f:
                return int(f.read().strip())
        return None

    def _state_path(self, batch_id: int) -> str:
        return f"{self._prefix}_{batch_id}"

    def sketch(self) -> DataFrame:
        b = self.applied_batch_id()
        if b is None:
            raise FileNotFoundError(f"no committed sketch state under {self.state_dir}")
        return self.spark.read.parquet(self._state_path(b))

    def _fold(self, part: DataFrame, batch_id: int, merge) -> None:
        last = self.applied_batch_id()
        if last is not None and batch_id <= last:
            return  # replayed, already-committed batch: exactly-once no-op
        merged = part if last is None else merge(
            self.spark.read.parquet(self._state_path(last)), part
        )
        # versioned dir: reads prev state while writing the new one —
        # no overwrite-while-reading tmp dance needed (one write, not two)
        merged.write.mode("overwrite").parquet(self._state_path(batch_id))
        os.makedirs(self.state_dir, exist_ok=True)
        tmp = self._marker + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(batch_id))
        os.replace(tmp, self._marker)  # atomic commit point
        if last is not None:
            shutil.rmtree(self._state_path(last), ignore_errors=True)


class CMSketchMonitor(_MergeMonitor):
    """foreachBatch sink folding per-batch CM sketches into parquet
    state — additive cell merge, so the replay guard is load-bearing."""

    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        col: str,
        depth: int = 4,
        width: int = 256,
    ):
        super().__init__(spark, state_dir, "cm")
        self.col = col
        self.depth = depth
        self.width = width

    def update(self, batch: DataFrame, batch_id: int) -> None:
        self._fold(cm_sketch(batch, self.col, self.depth, self.width), batch_id, cm_merge)

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


class HLLMonitor(_MergeMonitor):
    """foreachBatch sink folding per-batch HLL registers into parquet
    state — the streaming distinct-count monitor (optionally grouped,
    e.g. distinct users per event_type across all loads). Register
    merge is MAX (idempotent on its own), but the same versioned-state
    commit keeps the two monitors' crash semantics identical."""

    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        col: str,
        m: int = 256,
        group_cols: list[str] | None = None,
    ):
        super().__init__(spark, state_dir, "hll")
        self.col = col
        self.m = m
        self.group_cols = list(group_cols or [])

    def update(self, batch: DataFrame, batch_id: int) -> None:
        self._fold(
            hll_sketch(batch, self.col, self.m, self.group_cols), batch_id, hll_merge
        )

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
