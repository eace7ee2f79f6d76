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
    # double-space clamp BEFORE floor/int-cast (ops.drift convention):
    # extreme values land in an edge bin instead of an ANSI cast throw
    b = F.floor(
        F.least(
            F.lit(float(n_bins - 1)),
            F.greatest(
                F.lit(0.0),
                (F.expr(f"try_cast({col} as double)") - lo) / width,
            ),
        )
    ).cast("int")
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
    baseline: DataFrame | None,
    col: str,
    lo: float,
    hi: float,
    n_bins: int = 10,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "30 minutes",
    shares: list[float] | None = None,
) -> DataFrame:
    """Per-event-time-window PSI of ``col`` against a static baseline.

    One windowed aggregation: ``n_bins`` conditional counters per
    window plus a row count; PSI folds into the projection with the
    baseline shares as literals, so the whole monitor is a single
    incremental stateful operator — no stream-stream join, no
    per-row Python. Emits (window_start, window_end, n, psi).

    Pass ``shares`` to skip the baseline scan entirely — the frozen
    serving splits' STREAMING refit trigger: feed the freeze-time
    reference distribution (e.g. ``fixture_quality_ref_dist.json``'s
    counts normalized) and monitor the live scored stream against it
    continuously; refit + re-freeze when a window's PSI crosses 0.2
    (the batch twin is ``ops.drift.psi_frozen``)."""
    if shares is None:
        if baseline is None:
            raise ValueError("psi_drift_stream: need a baseline frame or shares")
        shares = baseline_shares(baseline, col, lo, hi, n_bins)
    if len(shares) != n_bins:
        raise ValueError(
            f"psi_drift_stream: {len(shares)} shares for n_bins={n_bins}"
        )
    width = (hi - lo) / n_bins or 1.0
    v = F.expr(f"try_cast({col} as double)")
    b = F.floor(
        F.least(
            F.lit(float(n_bins - 1)),
            F.greatest(F.lit(0.0), (v - lo) / width),
        )
    ).cast("int")
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


def baseline_cdf_at(
    baseline: DataFrame, col: str, edges: list[float]
) -> list[float]:
    """The baseline's EXACT empirical CDF evaluated at ``edges``: one
    small aggregation (len(edges) conditional counters + a total)."""
    v = F.expr(f"try_cast({col} as double)")
    row = (
        baseline.where(v.isNotNull())
        .agg(
            F.count(F.lit(1)).alias("n"),
            *[
                F.sum(F.when(v <= F.lit(float(e)), 1).otherwise(0)).alias(f"_e{i}")
                for i, e in enumerate(edges)
            ],
        )
        .collect()[0]
    )
    if row["n"] == 0:
        raise ValueError(f"baseline_cdf_at: no castable values in column {col!r}")
    return [row[f"_e{i}"] / row["n"] for i in range(len(edges))]


def baseline_edges(baseline: DataFrame, col: str, n_edges: int = 32) -> list[float]:
    """Deduped approximate-quantile edge grid of the baseline column
    (the grid placement only affects RESOLUTION, never correctness —
    the CDF values at the grid are computed exactly)."""
    probs = ", ".join(f"{i / (n_edges + 1)!r}" for i in range(1, n_edges + 1))
    row = baseline.agg(
        F.expr(
            f"approx_percentile(try_cast({col} as double), array({probs}), 1000)"
        ).alias("e")
    ).collect()[0]
    return sorted({e for e in (row["e"] or []) if e is not None})


def ks_drift_stream(
    stream: DataFrame,
    baseline: DataFrame,
    col: str,
    n_edges: int = 32,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Per-event-time-window KS statistic of ``col`` against a static
    baseline, evaluated on a fixed edge grid: ``(window_start,
    window_end, n, ks)`` with ks = max over grid edges e of
    |F_window(e) − F_baseline(e)|.

    The grid form is what makes KS streamable with bounded state: the
    true two-sample KS needs the full distinct-value ECDF (unbounded
    per-window state), while the grid statistic needs ``n_edges``
    conditional counters per window — the SAME incremental windowed-
    aggregation shape as the PSI monitor — and is exact at every grid
    edge (both CDFs are computed exactly there), so it lower-bounds the
    true KS and converges to it as the grid refines (error ≤ the
    baseline mass of the widest grid cell). Edges come from baseline
    quantiles, so cells carry ~equal mass where it matters.
    """
    edges = baseline_edges(baseline, col, n_edges)
    if not edges:
        raise ValueError(f"ks_drift_stream: baseline column {col!r} has no values")
    fb = baseline_cdf_at(baseline, col, edges)
    v = F.expr(f"try_cast({col} as double)")
    src = _watermarked(stream, ts_col, watermark).where(v.isNotNull())
    agg = (
        src.groupBy(F.window(F.col(ts_col), window).alias("win"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            *[
                F.sum(F.when(v <= F.lit(float(e)), 1).otherwise(0)).alias(f"_e{i}")
                for i, e in enumerate(edges)
            ],
        )
    )
    n = F.col("n").cast("double")
    ks = None
    for i, e in enumerate(edges):
        gap = F.abs(F.col(f"_e{i}").cast("double") / n - F.lit(fb[i]))
        ks = gap if ks is None else F.greatest(ks, gap)
    return agg.select(
        F.col("win.start").alias("window_start"),
        F.col("win.end").alias("window_end"),
        "n",
        F.round(ks, 6).alias("ks"),
    )
