"""Cluster auto-labeling → default rule configuration.

The reference (rules/auto_labeler.py:7-40) labels each column cluster
from its aggregate profile features — ID_like / Numeric_like /
Text_like / Date_like / Other — and merges the labels with per-label
default rules and manual overrides into a YAML config. Here the
feature aggregation and the label cascade are one DataFrame plan over
(profiles ⋈ clusters); the config assembly is a driver-side artifact
(it is configuration, not data).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# per-label default rules (reference auto_labeler.py:28-40)
LABEL_DEFAULTS: dict[str, list[dict]] = {
    "ID_like": [{"rule": "is_unique"}],
    "Numeric_like": [{"rule": "value_in_range"}],
    "Text_like": [
        {"rule": "is_nullable"},
        {"rule": "length_within", "min_length": 2, "max_length": 255},
    ],
    "Date_like": [{"rule": "date_format"}],
    "Other": [],
}


def auto_label_clusters(profiles: DataFrame, clusters: DataFrame) -> DataFrame:
    """``(cluster_id, label, n_members, members)`` via the reference's
    cascade (auto_labeler.py:7-21):

    1. avg unique_ratio > 0.95 and avg null_ratio < 0.05 → ID_like
    2. majority data type numeric → Numeric_like
    3. majority string, avg len > 25 → Text_like
    4. majority string, any member column NAMED like date/time →
       Date_like, else Text_like
    5. otherwise Other
    """
    j = profiles.join(clusters, "unique_id")
    num_types = ("integer", "float")
    per = j.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.avg("unique_ratio").alias("avg_distinct_ratio"),
        F.avg("null_ratio").alias("avg_null_ratio"),
        F.avg("avg_len").alias("avg_length"),
        (
            F.sum(F.when(F.col("basic_data_type").isin(*num_types), 1).otherwise(0))
            > F.count(F.lit(1)) / 2
        ).alias("mostly_numeric"),
        F.max(
            F.when(F.col("column").rlike("(?i)(date|time)"), F.lit(1)).otherwise(F.lit(0))
        ).alias("any_date_name"),
        F.sort_array(F.collect_list("unique_id")).alias("members"),
    )
    label = (
        F.when(
            (F.col("avg_distinct_ratio") > 0.95) & (F.col("avg_null_ratio") < 0.05),
            F.lit("ID_like"),
        )
        .when(F.col("mostly_numeric"), F.lit("Numeric_like"))
        .when(F.coalesce(F.col("avg_length"), F.lit(0.0)) > 25, F.lit("Text_like"))
        .when(F.col("any_date_name") == 1, F.lit("Date_like"))
        .otherwise(F.lit("Text_like"))
    )
    # the reference's final else branch ("Other") only triggers for
    # non-numeric non-string types; with our basic types everything
    # else is stringy, so Other applies when the cluster is empty of
    # usable stats
    label = F.when(F.col("avg_distinct_ratio").isNull(), F.lit("Other")).otherwise(label)
    return per.select("cluster_id", label.alias("label"), "n_members", "members")


def build_rule_config(
    labeled: DataFrame, overrides: dict[str, list[dict]] | None = None
) -> dict:
    """The merged cluster-rule configuration (auto_labeler.py:24-52):
    per-label defaults + per-cluster assignments + manual overrides.
    Returns a plain dict; pass it to ``to_yaml`` for the reference's
    serialized form."""
    rows = labeled.collect()
    return {
        "cluster_profiles": {
            lbl: {"defaults": list(defs)} for lbl, defs in LABEL_DEFAULTS.items()
        },
        "clusters": [
            {
                "cluster_id": r["cluster_id"],
                "cluster_profile": r["label"],
                "members": list(r["members"]),
            }
            for r in rows
        ],
        "overrides": overrides or {},
    }


def to_yaml(config: dict) -> str:
    """YAML rendering when pyyaml is present; deterministic repr
    fallback otherwise (the config is consumed as a dict either way)."""
    try:
        import yaml

        return yaml.dump(config, sort_keys=False)
    except ImportError:
        import json

        return json.dumps(config, indent=2, sort_keys=False)
