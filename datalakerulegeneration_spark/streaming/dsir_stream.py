"""Stateless streaming DSIR scoring against a persisted bucket LM.

Importance resampling deploys as train-once / score-forever: the
≤n_buckets-row log-ratio LM (ops.textqa.dsir_lm) is a tiny persisted
artifact, and scoring an ARRIVING document needs nothing but that
artifact — so the streaming scorer is a pure map: the dense LM folds
into one literal MAP column (n_buckets entries, bounded by
construction), and each row computes Σ_tokens lam[bucket(token)] with
a higher-order fold. No aggregation state, no watermark, append-mode
safe; a restart re-scores nothing because nothing is remembered.

Batch twin: on a static frame the same function reproduces
ops.textqa.dsir_weights' log_importance per id up to the 6-dp rounding
of two different float accumulation orders (per-token fold here,
per-bucket grouped sum there) — parity-tested at tolerance 2e-6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dsir_score_stream(
    stream: DataFrame,
    lm: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 1024,
    min_log_importance: float | None = None,
) -> DataFrame:
    """Score a document stream against a static DSIR LM.

    ``lm`` must be the DENSE (b, lam) frame from
    ``ops.textqa.dsir_lm`` (collected driver-side — it is the bounded
    model artifact, not data). With ``min_log_importance`` set, rows
    below the threshold are DROPPED (the admission-gate deployment);
    otherwise every row passes through with (n_tokens,
    log_importance) appended.
    """
    if lm.isStreaming:
        raise ValueError("lm must be a static frame (it is the model artifact)")
    rows = lm.collect()
    if len(rows) != n_buckets:
        raise ValueError(
            f"lm must be dense: expected {n_buckets} buckets, got {len(rows)}"
        )
    lam = [0.0] * n_buckets
    for r in rows:
        lam[int(r["b"])] = float(r["lam"])
    lam_arr = F.array(*[F.lit(v) for v in lam])
    toks = F.array_remove(F.split(F.lower(F.col(text_col)), r"\s+"), "")
    scored = (
        stream.withColumn("_lam", lam_arr)
        .withColumn("_toks", toks)
        .withColumn(
            "log_importance",
            F.round(
                F.expr(
                    "aggregate(_toks, cast(0.0 as double), (acc, t) -> acc +"
                    " element_at(_lam, cast(cast(conv(substr(md5(t), 1, 7), 16, 10)"
                    f" as bigint) % {n_buckets} + 1 as int)))"
                ),
                6,
            ),
        )
        .withColumn("n_tokens", F.size("_toks").cast("bigint"))
        .drop("_lam", "_toks")
    )
    if min_log_importance is not None:
        return scored.where(
            F.col("log_importance") >= F.lit(min_log_importance)
        ).drop("log_importance", "n_tokens")
    return scored
