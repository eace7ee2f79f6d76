"""Streaming continuous aggregate: the hypertable rollup maintained
incrementally (beyond-reference capability; the batch twin is
``ops.temporal.time_rollup``).

The design hinges on the same invariant the batch operator proves
against its DuckDB ROLLUP oracle: the hour-grain state
``(day_num, hr, n_events, decimal sum, min, max)`` is MERGEABLE —
counts add, DECIMAL(18,6) sums add exactly, extrema fold — so

* the stream side only ever maintains ONE watermark-bounded windowed
  aggregation (state = O(open hours), never raw rows),
* micro-batch outputs / backfill partials fold into a persisted state
  table in any order or tree shape (``merge_hour_grain``), and
* every coarser grain (day, grand total) is DERIVED from the tiny
  state frame at read time (``ops.temporal.rollup_from_hour``) —
  bit-identical to a from-scratch batch rollup, which is what the
  parity test pins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datalakerulegeneration_spark.ops.temporal import rollup_from_hour
from datalakerulegeneration_spark.streaming.windows import _watermarked

__all__ = ["hour_grain_stream", "merge_hour_grain", "finalize_rollup"]


def hour_grain_stream(
    events: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Hour-grain mergeable state from a (possibly streaming) event
    frame: one watermarked windowed aggregation. Batch frames take the
    identical plan (windows degrade to groupBy buckets) — the
    batch/stream-unified shape every other streaming op here uses.

    Hour windows are epoch-aligned, so ``day_num``/``hr`` derived from
    the window start equal the batch operator's pure floor arithmetic.
    """
    src = _watermarked(events, ts_col, watermark)
    w = F.window(F.col(ts_col), "1 hour")
    out = src.groupBy(w.alias("_w")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.expr(f"cast({value_col} as decimal(18,6))")).alias("_s"),
        F.min(value_col).alias("value_min"),
        F.max(value_col).alias("value_max"),
    )
    start = F.unix_timestamp(F.col("_w.start"))
    return out.select(
        F.floor(start / 86400).cast("bigint").alias("day_num"),
        F.floor((start % 86400) / 3600).cast("int").alias("hr"),
        "n_events",
        "_s",
        "value_min",
        "value_max",
    )


def merge_hour_grain(*states: DataFrame) -> DataFrame:
    """Fold any number of hour-grain partials (micro-batch outputs,
    backfills, per-source shards) into one state: exact in any merge
    order — counts/decimal-sums add, extrema fold."""
    out = states[0]
    for s in states[1:]:
        out = out.unionByName(s)
    return out.groupBy("day_num", "hr").agg(
        F.sum("n_events").alias("n_events"),
        F.sum("_s").cast("decimal(18,6)").alias("_s"),
        F.min("value_min").alias("value_min"),
        F.max("value_max").alias("value_max"),
    )


def finalize_rollup(hour_state: DataFrame) -> DataFrame:
    """All grains (hour/day/total) from the merged state — same
    derivation (and therefore same rows) as the batch
    ``time_rollup``."""
    return rollup_from_hour(hour_state)
