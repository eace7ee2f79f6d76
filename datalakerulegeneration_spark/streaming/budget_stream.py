"""Streaming token-budget admission: ingest documents until the
budget is spent, then stop admitting — "give me the first N tokens of
the stream", the arrival-order twin of the batch
``ops.sampling.token_budget_select`` (which ranks by quality; a
stream can't rank what hasn't arrived, so admission is greedy by
arrival, deterministic within each micro-batch).

Per micro-batch: documents take the deterministic hash order
(``ops.packing.pack_sequences``' two-level exclusive prefix sum — no
task sorts the batch), and a document is admitted iff its stream
offset + weight fits the remaining budget. Within a batch an
oversized document is skipped but still advances the running position
— the same documented cutoff convention as ``token_budget_select``;
across batches only ADMITTED tokens consume budget. Token weights use
the regex-proxy default or a plugged real tokenizer
(``ops.tokenize.TokenizerFn``) — budget admission is exactly the
accounting decision the tokenizer seam exists for.

State is one (admitted_tokens) row, committed per batch through the
same versioned-dir + atomic-marker flip as the sketch monitors, so a
replayed committed batch is a full no-op (state AND survivors).
Crash between the survivors append and the marker flip re-admits at
most that one batch on replay (duplicate rows, recoverable by exact
dedup on id) — the fail-safe order the persisted dedup index uses:
re-admit, never drop.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datalakerulegeneration_spark.ops import packing


class BudgetAdmitter:
    """foreachBatch sink admitting documents until ``budget`` tokens
    have been admitted across the whole stream history."""

    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        budget: int,
        id_col: str = "doc_id",
        text_col: str = "text",
        tokenizer_fn=None,
    ):
        if budget <= 0:
            raise ValueError("budget must be positive")
        self.spark = spark
        self.state_dir = state_dir
        self.budget = int(budget)
        self.id_col = id_col
        self.text_col = text_col
        self.tokenizer_fn = tokenizer_fn
        self.out_path = os.path.join(state_dir, "survivors")
        self._prefix = os.path.join(state_dir, "budget_state")
        self._marker = os.path.join(state_dir, "budget_APPLIED")

    # -- exactly-once state plumbing (sketch-monitor pattern) -------------

    def applied_batch_id(self) -> int | None:
        if os.path.exists(self._marker):
            with open(self._marker) as f:
                return int(f.read().strip())
        return None

    def admitted_tokens(self) -> int:
        b = self.applied_batch_id()
        if b is None:
            return 0
        return self.spark.read.parquet(f"{self._prefix}_{b}").first()["admitted_tokens"]

    # -- foreachBatch hook -------------------------------------------------

    def update(self, batch: DataFrame, batch_id: int) -> None:
        last = self.applied_batch_id()
        if last is not None and batch_id <= last:
            return  # replayed committed batch: exactly-once no-op
        cum = 0 if last is None else int(
            self.spark.read.parquet(f"{self._prefix}_{last}").first()["admitted_tokens"]
        )
        remaining = self.budget - cum
        admitted_w = 0
        if remaining > 0:
            from datalakerulegeneration_spark.ops.tokenize import token_count_col

            carry = tuple(c for c in batch.columns if c != self.id_col)
            d = batch.withColumn(
                "_w",
                F.coalesce(
                    token_count_col(self.text_col, self.tokenizer_fn), F.lit(0)
                ),
            )
            packed = packing.pack_sequences(
                d,
                self.id_col,
                "_w",
                seq_len=1 << 40,
                salt="budget",
                carry_cols=carry,
            )
            adm = packed.where(
                F.col("offset") + F.col("weight") <= F.lit(remaining)
            ).select(F.col("id").alias(self.id_col), *carry, "weight")
            # stage once; both the survivor append and the token total
            # derive from the SAME persisted rows (the dedup-index trick)
            staging = os.path.join(self.state_dir, f".staging_{batch_id}")
            adm.write.mode("overwrite").parquet(staging)
            staged = self.spark.read.parquet(staging)
            admitted_w = staged.agg(
                F.coalesce(F.sum("weight"), F.lit(0)).cast("bigint")
            ).first()[0]
            staged.drop("weight").write.mode("append").parquet(self.out_path)
            shutil.rmtree(staging, ignore_errors=True)
        self.spark.createDataFrame(
            [(int(cum + admitted_w),)], "admitted_tokens bigint"
        ).write.mode("overwrite").parquet(f"{self._prefix}_{batch_id}")
        os.makedirs(self.state_dir, exist_ok=True)
        tmp = self._marker + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(batch_id))
        os.replace(tmp, self._marker)  # atomic commit point
        if last is not None:
            shutil.rmtree(f"{self._prefix}_{last}", ignore_errors=True)

    def survivors(self) -> DataFrame:
        return self.spark.read.parquet(self.out_path)


def budget_admission_stream(
    spark: SparkSession,
    stream: DataFrame,
    state_dir: str,
    budget: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokenizer_fn=None,
    checkpoint_dir: str | None = None,
):
    """Wire a streaming document DataFrame into the budget admitter;
    returns ``(StreamingQuery, BudgetAdmitter)``."""
    adm = BudgetAdmitter(spark, state_dir, budget, id_col, text_col, tokenizer_fn)
    writer = (
        stream.writeStream.foreachBatch(adm.update)
        .outputMode("update")
        .trigger(availableNow=True)
    )
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start(), adm
