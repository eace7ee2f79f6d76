"""Streaming corpus curation (beyond-reference capability).

The batch flagship (``ops.curate.curate_corpus``) assumes a finished
corpus; a live ingestion pipeline wants the same gates applied as
documents ARRIVE. This module runs the streaming-expressible prefix of
that pipeline on an unbounded document stream:

  1. score  — quality / fingerprint / token count folded into the
              stream's map stage (same column expressions as batch)
  2. filter — quality threshold (map-only)
  3. dedup  — ``dropDuplicatesWithinWatermark`` on the fingerprint:
              exact streaming dedup with watermark-bounded state
  4. decon  — stream-static ANTI join against the eval-set fingerprint
              frame (static side broadcasts; the stream never shuffles
              for this step)

Rebalancing and packing are corpus-global decisions (they need final
group counts and a total ordering), so they stay batch post-passes
over the curated stream's sink — the standard lambda split for this
workload. On a batch frame the same function degrades to the exact
first-four-stage prefix of the batch pipeline (tested equal).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datalakerulegeneration_spark.ops import textqa
from datalakerulegeneration_spark.streaming.windows import _watermarked


def curate_stream(
    stream: DataFrame,
    eval_fps: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "source",
    ts_col: str = "ts",
    quality_min: float = 0.5,
    watermark: str = "1 hour",
) -> DataFrame:
    """Quality-gate, fingerprint-dedup, and decontaminate a document
    stream; emits the thin manifest (id, grp, fp, n_tokens[, ts]).

    ``eval_fps`` must be a STATIC frame with one ``eval_fp`` column
    (build it with ``textqa.fingerprint`` over the eval corpus).
    """
    if eval_fps.isStreaming:
        raise ValueError("eval_fps must be a static frame (it broadcasts)")
    has_ts = ts_col in stream.columns
    if stream.isStreaming and not has_ts:
        # without event time the dedup stage would fall into the batch
        # row_number branch, which Structured Streaming rejects with an
        # unrelated analysis error — fail with the real cause instead
        raise ValueError(
            f"curate_stream: streaming input has no {ts_col!r} column; "
            "watermarked dedup needs an event-time column (pass ts_col=)"
        )
    cols = [
        F.col(id_col).alias("id"),
        F.col(group_col).alias("grp"),
        textqa.quality_col(text_col).alias("quality"),
        textqa.fingerprint_col(text_col).alias("fp"),
        textqa.ntokens_col(text_col).alias("n_tokens"),
    ] + ([F.col(ts_col)] if has_ts else [])
    scored = stream.select(*cols).where(F.col("quality") >= quality_min)
    if stream.isStreaming and has_ts:
        scored = _watermarked(scored, ts_col, watermark)
        deduped = scored.dropDuplicatesWithinWatermark(["fp"])
    else:
        # batch twin: lowest id wins (deterministic, matches ops.curate)
        from pyspark.sql import Window

        w = Window.partitionBy("fp").orderBy(F.col("id").asc())
        deduped = (
            scored.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .drop("_rn")
        )
    out = deduped.join(
        F.broadcast(eval_fps), deduped["fp"] == eval_fps["eval_fp"], "left_anti"
    )
    keep = ["id", "grp", "fp", "n_tokens"] + ([ts_col] if has_ts else [])
    return out.select(*keep)
