"""Hierarchical rule transfer (M8).

Reference (rule_generation_piplepline_org.py:183-330): rules live at
four levels with minimum-similarity gates; transfer confidence =
base · similarity · level-penalty · success-rate, with an EMA success
update (α = 0.1). Pure scalar policy over the profiles/similarity
DataFrames — state lives in a small rule-stats table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# level → (min similarity, confidence penalty)
TRANSFER_LEVELS = {
    "universal": (0.0, 1.00),
    "domain": (0.5, 0.90),
    "table": (0.7, 0.80),
    "instance": (0.9, 0.70),
}
EMA_ALPHA = 0.1


def transfer_confidence(
    candidates: DataFrame,
    base_confidence: float = 1.0,
) -> DataFrame:
    """Filter + score transfer candidates.

    ``candidates``: (rule, level, similarity, success_rate). Keeps rows
    whose similarity clears their level's gate; confidence =
    base · similarity · level_penalty · success_rate.
    """
    gates = [(lvl, lo, pen) for lvl, (lo, pen) in TRANSFER_LEVELS.items()]
    gate_df = candidates.sparkSession.createDataFrame(
        gates, "level string, min_sim double, penalty double"
    )
    return (
        candidates.join(F.broadcast(gate_df), "level")
        .where(F.col("similarity") >= F.col("min_sim"))
        .withColumn(
            "confidence",
            F.round(
                F.lit(base_confidence)
                * F.col("similarity")
                * F.col("penalty")
                * F.coalesce(F.col("success_rate"), F.lit(1.0)),
                6,
            ),
        )
        .drop("min_sim", "penalty")
    )


def update_success_rate(
    stats: DataFrame, outcomes: DataFrame, alpha: float = EMA_ALPHA
) -> DataFrame:
    """EMA success update: new = (1−α)·old + α·outcome
    (rule_generation_piplepline_org.py:50-114). ``outcomes``:
    (rule, success ∈ {0.0, 1.0})."""
    return (
        stats.join(outcomes, "rule", "left")
        .withColumn(
            "success_rate",
            F.when(
                F.col("success").isNotNull(),
                F.round((1 - alpha) * F.col("success_rate") + alpha * F.col("success"), 6),
            ).otherwise(F.col("success_rate")),
        )
        .drop("success")
    )
