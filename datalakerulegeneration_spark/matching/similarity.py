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


def _rel_sim_sql(a: str, b: str) -> str:
    """DuckDB twin of column_match_scores' rel_sim: 1 − min(|Δ|/scale, 1)
    with NULL stats coalesced to 0 and a 1e-9 scale floor."""
    ca, cb = f"COALESCE({a}, 0.0)", f"COALESCE({b}, 0.0)"
    return (
        f"(1.0 - LEAST(abs({ca} - {cb})"
        f" / GREATEST(abs({ca}), abs({cb}), 1e-9), 1.0))"
    )


def column_match_scores_sql(
    src_table: str,
    src_cols_kinds: list[tuple[str, str]],
    tgt_table: str,
    tgt_cols_kinds: list[tuple[str, str]],
) -> str:
    """DuckDB oracle for :func:`column_match_scores` over LIVE profiles
    (the with_tokens=False mode the registered query uses, so
    kw_overlap is the 0.0 branch and content_sim = type_agree / 2).

    End-to-end: the wide profile CTEs re-derive every input stat from
    the raw tables via the stat registry's paired SQL, the trigram
    Jaccard is computed in SQL from the column-name literals, and the
    component arithmetic mirrors the Spark expressions term for term
    (same left-associated float order), so 6-dp rounds agree.
    """
    from datalakerulegeneration_spark.profiling.wide_sql import wide_profile_sql

    tri = (
        "list_distinct(list_transform(generate_series(1, greatest(length({p}) - 2, 1)),"
        " i -> substring({p}, i, 3)))"
    )
    rel = _rel_sim_sql
    struct_sim = (
        f"({rel('s_avg_len', 't_avg_len')} + {rel('s_ca', 't_ca')}"
        f" + {rel('s_cn', 't_cn')} + {rel('s_nr', 't_nr')}) / 4.0"
    )
    dist_sim = (
        f"({rel('s_nmin', 't_nmin')} + {rel('s_nmax', 't_nmax')}"
        f" + {rel('s_nmean', 't_nmean')} + {rel('s_nstd', 't_nstd')}) / 4.0"
    )
    content_sim = "((CASE WHEN s_bdt = t_bdt THEN 1.0 ELSE 0.0 END) + 0.0) / 2.0"
    return f"""
WITH sprof AS ({wide_profile_sql(src_table, src_cols_kinds, with_values=False)}),
tprof AS ({wide_profile_sql(tgt_table, tgt_cols_kinds, with_values=False)}),
pairs AS (
  SELECT s.unique_id AS src_id, t.unique_id AS tgt_id,
         '  ' || lower(s.colname) || '  ' AS p_s,
         '  ' || lower(t.colname) || '  ' AS p_t,
         s.avg_len AS s_avg_len, t.avg_len AS t_avg_len,
         s.characters_alphabet AS s_ca, t.characters_alphabet AS t_ca,
         s.characters_numeric AS s_cn, t.characters_numeric AS t_cn,
         s.null_ratio AS s_nr, t.null_ratio AS t_nr,
         s.numeric_min AS s_nmin, t.numeric_min AS t_nmin,
         s.numeric_max AS s_nmax, t.numeric_max AS t_nmax,
         s.numeric_mean AS s_nmean, t.numeric_mean AS t_nmean,
         s.numeric_std AS s_nstd, t.numeric_std AS t_nstd,
         s.basic_data_type AS s_bdt, t.basic_data_type AS t_bdt
  FROM sprof s CROSS JOIN tprof t
),
comp AS (
  SELECT src_id, tgt_id,
         CAST(len(list_intersect({tri.format(p='p_s')}, {tri.format(p='p_t')})) AS DOUBLE)
           / NULLIF(CAST(len(list_distinct(list_concat({tri.format(p='p_s')}, {tri.format(p='p_t')}))) AS DOUBLE), 0.0) AS name_sim,
         {struct_sim} AS struct_sim,
         {dist_sim} AS dist_sim,
         {content_sim} AS content_sim
  FROM pairs
)
SELECT src_id, tgt_id,
       round(COALESCE(name_sim, 0.0), 6) AS name_sim,
       round(struct_sim, 6) AS struct_sim,
       round(dist_sim, 6) AS dist_sim,
       round(content_sim, 6) AS content_sim,
       round(0.3 * COALESCE(name_sim, 0.0) + 0.25 * struct_sim
             + 0.25 * dist_sim + 0.2 * content_sim, 6) AS score
FROM comp
"""
