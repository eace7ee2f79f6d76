"""Event-time streaming operators (beyond-reference Spark capabilities).

The reference has no event-time semantics (SURVEY §2.11); these are the
Structured Streaming counterparts a lake-quality pipeline needs when
the events table is a live stream: watermarked windowed aggregation and
a streaming 3σ monitor (the dBoost Gaussian model applied per window).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _watermarked(events: DataFrame, ts_col: str, watermark: str) -> DataFrame:
    """Watermark a streaming source; event-time watermarks require
    TIMESTAMP (with zone), so a TIMESTAMP_NTZ event column (what the
    parquet testdata carries) is cast first — a no-op on wall-clock
    values, and batch frames pass through untouched."""
    if not events.isStreaming:
        return events
    if dict(events.dtypes).get(ts_col) == "timestamp_ntz":
        events = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return events.withWatermark(ts_col, watermark)


def windowed_event_counts(
    events: DataFrame,
    window: str = "10 minutes",
    slide: str | None = None,
    watermark: str = "30 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-type event counts in event-time windows with late-data
    handling. Works identically on a batch frame (windows become plain
    groupBy buckets) — the batch/stream-unified plan."""
    w = F.window(F.col(ts_col), window, slide) if slide else F.window(F.col(ts_col), window)
    src = _watermarked(events, ts_col, watermark)
    return (
        src.groupBy(w.alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.expr("cast(value as decimal(18,6))")).cast("double").alias("value_sum"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n",
            "value_sum",
        )
    )


def streaming_gaussian_monitor(
    events: DataFrame,
    tol: float = 3.0,
    window: str = "1 hour",
    watermark: str = "30 minutes",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Windowed mean/std so a downstream join can flag |x−μ| > tol·σ
    per window — the streaming shape of dBoost's Gaussian model. The
    stats stream (not row-level flags) is emitted: at scale you
    broadcast these tiny per-window stats back onto the raw stream."""
    src = _watermarked(events, ts_col, watermark)
    return (
        src.groupBy(F.window(F.col(ts_col), window).alias("win"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg(value_col).alias("mu"),
            F.stddev_samp(value_col).alias("sd"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "n",
            "mu",
            "sd",
            F.lit(tol).alias("tol"),
        )
    )


def dedup_stream(
    events: DataFrame,
    id_cols: tuple[str, ...] = ("event_id",),
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup with BOUNDED state:
    ``dropDuplicatesWithinWatermark`` evicts seen-key state once the
    watermark passes, so a perpetual stream holds only one horizon's
    keys — plain ``dropDuplicates`` on a stream grows state forever.
    On a batch frame this degrades to ordinary dropDuplicates (the
    batch/stream-unified contract, same as windowed_event_counts)."""
    src = _watermarked(events, ts_col, watermark)
    if events.isStreaming:
        return src.dropDuplicatesWithinWatermark(list(id_cols))
    return src.dropDuplicates(list(id_cols))


def sessionize_stream(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "30 minutes",
    agg_col: str | None = "value",
) -> DataFrame:
    """Streaming sessionization via the native ``session_window``:
    dynamic-gap windows merge as events arrive and CLOSE once the
    watermark passes gap's end — state per key is bounded by open
    sessions, not history. The batch twin (ops.temporal.sessionize,
    lag + running sum) produces the same per-session aggregates for
    the same gap; this one runs incrementally on an unbounded stream.
    """
    src = _watermarked(events, ts_col, watermark)
    aggs = [
        F.count(F.lit(1)).alias("n_events"),
    ]
    if agg_col is not None:
        aggs.append(
            F.sum(F.expr(f"cast({agg_col} as decimal(18,6))"))
            .cast("double")
            .alias("value_sum")
        )
    out_cols = ["n_events"] + (["value_sum"] if agg_col is not None else [])
    return (
        src.groupBy(F.session_window(F.col(ts_col), gap).alias("win"), F.col(key_col))
        .agg(*aggs)
        .select(
            key_col,
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            *out_cols,
        )
    )
