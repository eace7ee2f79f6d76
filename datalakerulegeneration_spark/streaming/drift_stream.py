"""Streaming distribution-drift monitor (beyond-reference capability).

The batch PSI operators (``ops.drift``) compare two static frames; a
production lake wants the SAME statistic computed continuously against
a frozen baseline as data streams in. This module bins a watermarked
event stream into event-time windows and emits one PSI row per window.

Scale shape: the baseline is reduced ONCE to an ``n_bins``-row share
vector (the natural driver/broadcast boundary — same policy as the
batch operator's 1-row totals); the stream side is a single windowed
aggregation whose state is O(open windows × n_bins) conditional
counters, never raw rows. Works identically on a batch frame (windows
become plain groupBy buckets), which is how the parity test pins it to
``ops.drift.psi_bins``.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datalakerulegeneration_spark.ops.drift import _EPS
from datalakerulegeneration_spark.streaming.windows import _watermarked


def baseline_shares(
    baseline: DataFrame, col: str, lo: float, hi: float, n_bins: int
) -> list[float]:
    """Reduce a static baseline frame to its per-bin share vector
    (one small aggregation; nulls/non-castables drop, mirroring
    ``ops.drift.psi_bins``)."""
    if hi < lo:
        raise ValueError(f"baseline_shares: hi ({hi!r}) < lo ({lo!r})")
    width = (hi - lo) / n_bins or 1.0
    b = F.least(
        F.lit(n_bins - 1),
        F.greatest(
            F.lit(0),
            F.floor((F.expr(f"try_cast({col} as double)") - lo) / width).cast("int"),
        ),
    )
    rows = (
        baseline.where(F.expr(f"try_cast({col} as double)").isNotNull())
        .groupBy(b.alias("bin"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    counts = [0] * n_bins
    for r in rows:
        counts[r["bin"]] = r["n"]
    total = sum(counts)
    if total == 0:
        raise ValueError(f"baseline_shares: no castable values in column {col!r}")
    return [c / total for c in counts]


def psi_drift_stream(
    stream: DataFrame,
    baseline: DataFrame,
    col: str,
    lo: float,
    hi: float,
    n_bins: int = 10,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Per-event-time-window PSI of ``col`` against a static baseline.

    One windowed aggregation: ``n_bins`` conditional counters per
    window plus a row count; PSI folds into the projection with the
    baseline shares as literals, so the whole monitor is a single
    incremental stateful operator — no stream-stream join, no
    per-row Python. Emits (window_start, window_end, n, psi).
    """
    shares = baseline_shares(baseline, col, lo, hi, n_bins)
    width = (hi - lo) / n_bins or 1.0
    v = F.expr(f"try_cast({col} as double)")
    b = F.least(
        F.lit(n_bins - 1),
        F.greatest(F.lit(0), F.floor((v - lo) / width).cast("int")),
    )
    src = _watermarked(stream, ts_col, watermark).where(v.isNotNull())
    agg = (
        src.withColumn("_bin", b)
        .groupBy(F.window(F.col(ts_col), window).alias("win"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            *[
                F.sum(F.when(F.col("_bin") == i, 1).otherwise(0)).alias(f"_c{i}")
                for i in range(n_bins)
            ],
        )
    )
    n = F.col("n").cast("double")
    psi = None
    for i in range(n_bins):
        ba = max(shares[i], _EPS)
        cu = F.greatest(F.col(f"_c{i}").cast("double") / n, F.lit(_EPS))
        term = (F.lit(ba) - cu) * (F.lit(math.log(ba)) - F.log(cu))
        psi = term if psi is None else psi + term
    return agg.select(
        F.col("win.start").alias("window_start"),
        F.col("win.end").alias("window_end"),
        "n",
        F.round(psi, 6).alias("psi"),
    )
