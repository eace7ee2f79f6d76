"""Rule sharing across clusters + profile-threshold training (R20/A3/M4).

* ``shared_rules_by_sample_column`` — the reference's primary sharing
  semantics (rules/evaluation.py:266-300): a rule attaches to a cluster
  iff one of its declared sample_columns is a member (a quirk
  consciously preserved — SURVEY §7.3.6).
* ``shared_rules_by_threshold`` — the ≥70%-of-members variant
  (rules/evaluation.py:244-263), computed as one join + ratio agg.
* ``train_profile_thresholds`` — 5th/95th percentile + mean/std of
  profile features over CLEAN columns (rules/train_clean_rules.py:44-97)
  via ``percentile_approx``; materialized rule params.
* ``rule_centric_confidence`` — M4: cosine between a rule's feature
  token vector (all-ones) and the column's profile feature vector
  (utils/strategy2_rule_centric.py:13-57).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datalakerulegeneration_spark.rules.compiler import applies_predicate, rules_for_profiles
from datalakerulegeneration_spark.rules.spec import Rule


def shared_rules_by_sample_column(
    clusters: DataFrame, rules: list[Rule]
) -> DataFrame:
    """(cluster_id, rule) — rule joins a cluster when any of its
    sample_columns is a cluster member."""
    spark = clusters.sparkSession
    anchor_rows = [
        (sc, r.name) for r in rules for sc in r.sample_columns
    ]
    anchors = spark.createDataFrame(anchor_rows or [], "unique_id string, rule string")
    return (
        clusters.join(anchors, "unique_id")
        .select("cluster_id", "rule")
        .distinct()
    )


def shared_rules_by_threshold(
    profiles: DataFrame,
    clusters: DataFrame,
    rules: list[Rule],
    threshold: float = 0.7,
) -> DataFrame:
    """(cluster_id, rule) — rule shared when ≥ threshold of member
    columns satisfy its applies() predicate. One profiles×rules select
    + one join + one ratio aggregation."""
    applicable = rules_for_profiles(profiles, rules)  # (unique_id, rule)
    members = clusters.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("n_members"))
    hits = (
        clusters.join(applicable.select("unique_id", "rule"), "unique_id")
        .groupBy("cluster_id", "rule")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return (
        hits.join(F.broadcast(members), "cluster_id")
        .where(F.col("n_hits").cast("double") / F.col("n_members") >= threshold)
        .select("cluster_id", "rule")
    )


TRAINABLE_FEATURES = [
    "null_ratio",
    "unique_ratio",
    "avg_len",
    "numeric_min",
    "numeric_max",
    "numeric_mean",
    "numeric_std",
]


def train_profile_thresholds(
    clean_profiles: DataFrame,
    clusters: DataFrame | None = None,
    features: list[str] | None = None,
    lo_pct: float = 0.05,
    hi_pct: float = 0.95,
) -> DataFrame:
    """Per-cluster (or global) trained feature thresholds:
    ``(cluster_id, feature, lo, hi, mean, std)``.

    percentile_approx keeps this one aggregation at any scale; the
    output is the materialized rule-parameter table the reference
    serializes to trained_rules_*.json.
    """
    feats = [f for f in (features or TRAINABLE_FEATURES) if f in clean_profiles.columns]
    src = clean_profiles
    if clusters is not None:
        src = src.join(clusters, "unique_id")
        group = ["cluster_id"]
    else:
        src = src.withColumn("cluster_id", F.lit(-1))
        group = ["cluster_id"]
    aggs = []
    for f in feats:
        aggs.append(F.percentile_approx(f, lo_pct).alias(f"lo_{f}"))
        aggs.append(F.percentile_approx(f, hi_pct).alias(f"hi_{f}"))
        aggs.append(F.avg(f).alias(f"mean_{f}"))
        aggs.append(F.stddev_samp(f).alias(f"std_{f}"))
    wide = src.groupBy(*group).agg(*aggs)
    parts = []
    for f in feats:
        parts.append(f"'{f}', `lo_{f}`, `hi_{f}`, `mean_{f}`, `std_{f}`")
    stack = (
        f"stack({len(parts)}, {', '.join(parts)}) as (feature, lo, hi, mean, std)"
    )
    return wide.select("cluster_id", F.expr(stack))


def thresholds_to_rules(thresholds: DataFrame) -> list[Rule]:
    """Materialize trained thresholds into applies()-style range rules
    (rules/modular_rule_system.py:44-55)."""
    out = []
    for r in thresholds.collect():
        if r["lo"] is None or r["hi"] is None:
            continue
        out.append(
            Rule(
                name=f"trained_{r['feature']}_in_range_c{r['cluster_id']}",
                applies={"all": [
                    {"feature": r["feature"], "op": ">=", "value": float(r["lo"])},
                    {"feature": r["feature"], "op": "<=", "value": float(r["hi"])},
                ]},
                description=f"trained {r['feature']} ∈ [{r['lo']:.4g}, {r['hi']:.4g}]",
            )
        )
    return out


def rule_centric_confidence(
    profiles: DataFrame, rules: list[Rule], features: list[str] | None = None
) -> DataFrame:
    """M4: confidence(column, rule) = cosine(column feature indicator
    vector, rule feature token vector). The rule vector is all-ones over
    the features its applies() expression mentions; the column vector is
    the indicator of non-null profile features — pure expressions."""
    def _feats_of(expr: dict) -> set[str]:
        if expr is None:
            return set()
        if "feature" in expr:
            return {expr["feature"]}
        for k in ("all", "any"):
            if k in expr:
                return set().union(*[_feats_of(e) for e in expr[k]])
        if "not" in expr:
            return _feats_of(expr["not"])
        return set()

    feats = features or TRAINABLE_FEATURES
    cols = [F.when(F.col(f).isNotNull(), 1.0).otherwise(0.0).alias(f"i_{f}") for f in feats if f in profiles.columns]
    ind = profiles.select("unique_id", *cols)
    plans = []
    for r in rules:
        rf = _feats_of(r.applies) & set(feats)
        if not rf:
            continue
        dot = None
        for f in rf:
            term = F.col(f"i_{f}")
            dot = term if dot is None else dot + term
        col_norm = None
        for f in feats:
            if f"i_{f}" in ind.columns:
                t = F.col(f"i_{f}") * F.col(f"i_{f}")
                col_norm = t if col_norm is None else col_norm + t
        conf = dot / (F.sqrt(col_norm) * F.lit(float(len(rf)) ** 0.5))
        plans.append(
            ind.select(
                "unique_id",
                F.lit(r.name).alias("rule"),
                F.round(F.coalesce(conf, F.lit(0.0)), 6).alias("confidence"),
            )
        )
    if not plans:
        return profiles.sparkSession.createDataFrame(
            [], "unique_id string, rule string, confidence double"
        )
    out = plans[0]
    for p in plans[1:]:
        out = out.unionByName(p)
    return out
