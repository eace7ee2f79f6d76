"""Schema matching: source × target column scoring (J5, M5).

The reference scores every (source, target) column pair on five
components — name, structure, distribution, content, table context —
(method_2/pipleline_2.py:153-206) with type-specialized profile
similarity (rules/cluster_matcher.py:72-198). Spark version: a
crossJoin of the two PROFILE frames (columns × columns — tiny) with all
five components as native expressions; raw data is touched only via
stored profile stats, never rescanned per pair.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# component weights (method_2/pipleline_2.py:181-206)
W_NAME, W_STRUCT, W_DIST, W_CONTENT = 0.3, 0.25, 0.25, 0.2
CROSS_CLUSTER_PENALTY = 0.15  # rules/cluster_matcher.py:108


def column_match_scores(
    src_profiles: DataFrame,
    tgt_profiles: DataFrame,
    clusters: DataFrame | None = None,
) -> DataFrame:
    """(src_id, tgt_id, name_sim, struct_sim, dist_sim, content_sim,
    score) for every source × target column pair.

    * name: char-trigram Jaccard of column names (F6);
    * structure: 1 − normalized |Δ| over length/char-class profile stats;
    * distribution: 1 − |Δ| over numeric min/max/mean/std (scale-normed);
    * content: type agreement + keyword-map overlap;
    * cross-cluster penalty when both sides carry cluster ids.
    """
    s = src_profiles.select(
        *[F.col(c).alias(f"s_{c}") for c in src_profiles.columns]
    )
    t = tgt_profiles.select(
        *[F.col(c).alias(f"t_{c}") for c in tgt_profiles.columns]
    )
    pairs = s.crossJoin(t)

    # trigram jaccard via expression on padded names
    pairs = pairs.withColumn("p_s", F.concat(F.lit("  "), F.lower("s_column"), F.lit("  ")))
    pairs = pairs.withColumn("p_t", F.concat(F.lit("  "), F.lower("t_column"), F.lit("  ")))
    pairs = pairs.withColumn(
        "tri_s",
        F.expr("array_distinct(transform(sequence(1, greatest(length(p_s) - 2, 1)), i -> substring(p_s, i, 3)))"),
    ).withColumn(
        "tri_t",
        F.expr("array_distinct(transform(sequence(1, greatest(length(p_t) - 2, 1)), i -> substring(p_t, i, 3)))"),
    )
    name_sim = F.size(F.array_intersect("tri_s", "tri_t")).cast("double") / F.nullif(
        F.size(F.array_union("tri_s", "tri_t")).cast("double"), F.lit(0.0)
    )

    def rel_sim(a, b):
        d = F.abs(F.coalesce(a, F.lit(0.0)) - F.coalesce(b, F.lit(0.0)))
        scale = F.greatest(F.abs(F.coalesce(a, F.lit(0.0))), F.abs(F.coalesce(b, F.lit(0.0))), F.lit(1e-9))
        return F.lit(1.0) - F.least(d / scale, F.lit(1.0))

    struct_sim = (
        rel_sim(F.col("s_avg_len"), F.col("t_avg_len"))
        + rel_sim(F.col("s_characters_alphabet"), F.col("t_characters_alphabet"))
        + rel_sim(F.col("s_characters_numeric"), F.col("t_characters_numeric"))
        + rel_sim(F.col("s_null_ratio"), F.col("t_null_ratio"))
    ) / 4.0

    dist_sim = (
        rel_sim(F.col("s_numeric_min"), F.col("t_numeric_min"))
        + rel_sim(F.col("s_numeric_max"), F.col("t_numeric_max"))
        + rel_sim(F.col("s_numeric_mean"), F.col("t_numeric_mean"))
        + rel_sim(F.col("s_numeric_std"), F.col("t_numeric_std"))
    ) / 4.0

    type_agree = (F.col("s_basic_data_type") == F.col("t_basic_data_type")).cast("double")
    kw_overlap = F.when(
        F.col("s_top_keywords").isNotNull() & F.col("t_top_keywords").isNotNull(),
        F.size(
            F.array_intersect(
                F.map_keys("s_top_keywords"), F.map_keys("t_top_keywords")
            )
        ).cast("double")
        / F.nullif(
            F.size(
                F.array_union(F.map_keys("s_top_keywords"), F.map_keys("t_top_keywords"))
            ).cast("double"),
            F.lit(0.0),
        ),
    ).otherwise(F.lit(0.0))
    content_sim = (type_agree + kw_overlap) / 2.0

    score = (
        W_NAME * F.coalesce(name_sim, F.lit(0.0))
        + W_STRUCT * struct_sim
        + W_DIST * dist_sim
        + W_CONTENT * content_sim
    )

    out = pairs.select(
        F.col("s_unique_id").alias("src_id"),
        F.col("t_unique_id").alias("tgt_id"),
        F.round(F.coalesce(name_sim, F.lit(0.0)), 6).alias("name_sim"),
        F.round(struct_sim, 6).alias("struct_sim"),
        F.round(dist_sim, 6).alias("dist_sim"),
        F.round(content_sim, 6).alias("content_sim"),
        F.round(score, 6).alias("score"),
    )

    if clusters is not None:
        cs = clusters.select(F.col("unique_id").alias("src_id"), F.col("cluster_id").alias("s_cid"))
        ct = clusters.select(F.col("unique_id").alias("tgt_id"), F.col("cluster_id").alias("t_cid"))
        out = (
            out.join(F.broadcast(cs), "src_id", "left")
            .join(F.broadcast(ct), "tgt_id", "left")
            .withColumn(
                "score",
                F.round(
                    F.when(
                        F.col("s_cid").isNotNull()
                        & F.col("t_cid").isNotNull()
                        & (F.col("s_cid") != F.col("t_cid")),
                        F.greatest(F.col("score") - CROSS_CLUSTER_PENALTY, F.lit(0.0)),
                    ).otherwise(F.col("score")),
                    6,
                ),
            )
            .drop("s_cid", "t_cid")
        )
    return out
