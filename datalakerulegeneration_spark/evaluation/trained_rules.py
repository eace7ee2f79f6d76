"""Golden parity with the reference's PUBLISHED trained-rules and
cluster-analysis artifacts (r11).

The reference ships four result artifacts produced by its
rule-training pipeline (reference ``rules/train_clean_rules.py:44-97``
percentile thresholds, serialized by ``utils/rule_utils.py:16-38``;
cluster profiling by ``rules/cluster_matcher.py:202-247,352-415``):

* ``results/trained_rules_clean.json``   — cluster 1, 28 numeric fields
* ``results/trained_rules_eps_0.5.json`` — clusters 0+1, 56 fields
* ``results/cluster_analysis.json``      — cluster 1 full analysis
* ``results/trained_rules_with_ranges.json`` — a 4-byte truncated stub
  (``{`` + newline); nothing to replicate, pinned as-is.

This module re-runs that protocol Spark-first over the vendored public
benchmark CSVs and reproduces every published numeric field bit-for-bit
(tests/test_trained_rules_golden.py).

Input adjudication (the part the artifacts don't state directly):

* **The input corpus is Quintet + a 7,390-row movies_1 table.** The
  published cluster statistics embed ``unique_ratio = 7199/7390`` and a
  fully-unique id column of 7,390 rows — exactly the concatenation of
  the reference's ``datasets/Quintet_Split/movies_1 + movies_2`` dirty
  halves (the ``results/Quintet/movies_1`` profile pickle was later
  regenerated empty, so the movies profile is reconstructed from the
  vendored halves).
* **Cluster membership is uniquely determined by the artifacts' own
  statistics.** The artifact-era DBSCAN input cannot be byte-replayed
  (the profiler's pattern alphabet and numeric-field dtypes changed
  after publication), but the published means/percentiles over five
  features (distinct_num, null_ratio, unique_ratio, min_len, max_len)
  admit EXACTLY ONE 29-member subset of the 66 candidate columns
  (exhaustive subset search over the published sufficient statistics),
  and the published ``error_patterns`` index sets then admit exactly
  one dataset ordering — flights, hospital, rayyan, movies_1, beers.
  Cluster 0 of the eps_0.5 artifact is likewise the unique 6-column
  ID set (its 95th-percentile distinct count 6145 = 2410 + 0.75 ×
  (7390 − 2410)).
* **NaN convention.** ``np.percentile``/``np.mean`` NaN-poison: any
  member whose Q1/Q3 is NaN (a string column — pandas ``quantile`` of
  an empty numeric coercion) makes all four published range stats NaN.
  Here a string column's q1/q3 is NULL, so the engine emits NULL for a
  poisoned range — the pinned mapping is published-NaN ≡ NULL.
* **basic_data_type era convention.** The published quality metrics
  only reproduce when every member's ``basic_data_type`` compares
  equal — the artifact-era profiler ran ``infer_dtype`` over
  ``dtype=str`` frames, returning ``'string'`` for every column, so
  the +0.3 type term of ``_fallback_match`` fires for every pair.

Scale note: every frame here is column-profile grain (≤66 rows) on
top of the shared one-scan wide-agg profiler; the pairwise quality
join is 29×29 — the same #columns² class as the sanctioned column
matcher (matching/similarity.py).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datalakerulegeneration_spark.catalog import read_csv_all_string
from datalakerulegeneration_spark.evaluation.golden import (
    csv_header,
    quintet_fixture_dir,
    s1_ingest_sql,
)

# ---------------------------------------------------------------------------
# fixtures
# ---------------------------------------------------------------------------


def quintet_split_fixture_dir() -> str:
    """Vendored movies_1/movies_2 dirty halves (public benchmark CSVs,
    reference datasets/Quintet_Split/)."""
    pkg = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    return os.path.join(os.path.dirname(pkg), "tests", "fixtures", "quintet_split")


def published_fixture_dir() -> str:
    """Vendored published result artifacts (reference results/)."""
    pkg = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    return os.path.join(os.path.dirname(pkg), "tests", "fixtures", "published")


#: artifact-era dataset discovery order, solved uniquely from the
#: published error_patterns index sets (module docstring)
ARTIFACT_TABLE_ORDER = ("flights", "hospital", "rayyan", "movies_1", "beers")

#: trained_rules_eps_0.5.json cluster 0 — the six fully-unique ID
#: columns (unique solution, module docstring)
CLUSTER_0 = (
    "flights_tuple_id",
    "hospital_index",
    "rayyan_id",
    "movies_1_id",
    "beers_index",
    "beers_id",
)

#: cluster 1 of all three artifacts, in the artifact's member order
#: (the order is observable through the published error_patterns
#: indices and the common_patterns tie-breaks)
CLUSTER_1 = (
    "flights_src",
    "flights_flight",
    "hospital_provider_number",
    "hospital_name",
    "hospital_address_1",
    "hospital_city",
    "hospital_state",
    "hospital_zip",
    "hospital_county",
    "hospital_type",
    "hospital_owner",
    "hospital_emergency_service",
    "hospital_condition",
    "hospital_measure_code",
    "hospital_score",
    "hospital_sample",
    "hospital_state_average",
    "rayyan_article_jvolumn",
    "rayyan_article_jissue",
    "rayyan_article_jcreated_at",
    "movies_1_name",
    "beers_style",
    "beers_ounces",
    "beers_abv",
    "beers_ibu",
    "beers_brewery_id",
    "beers_brewery_name",
    "beers_city",
    "beers_state",
)

#: feature keys of the published feature_ranges (reference
#: train_clean_rules.py:47 — the union of the rule profiles' feature
#: lists), mapped published-name → engine stat name
RANGE_FEATURES = {
    "distinct_num": "distinct_num",
    "null_ratio": "null_ratio",
    "Q1": "q1",
    "Q3": "q3",
    "max_len": "max_len",
    "unique_ratio": "unique_ratio",
    "min_len": "min_len",
}

#: the artifact-era rule-profile structure the serialized "rules"
#: section derives from (reference utils/rule_utils.py:25-33:
#: a numeric condition serializes as the cluster's feature MEAN, a
#: callable as the literal string "lambda"); recorded as data — the
#: dict this exact set came from predates the current
#: rules/dictionary_rule.py SIMPLE_RULE_PROFILES
RULE_PROFILES_V0 = {
    "is_identical": {
        "features": ("unique_ratio", "null_ratio"),
        "kind": "mean",
        "description": "All values are unique and non-null",
    },
    "is_single_value": {
        "features": ("distinct_num",),
        "kind": "mean",
        "description": "Only one distinct value",
    },
    "is_primary_key": {
        "features": ("unique_ratio", "null_ratio"),
        "kind": "mean",
        "description": "Column is a primary key (unique & non-null)",
    },
    "is_unique": {
        "features": ("unique_ratio",),
        "kind": "mean",
        "description": "All values are unique",
    },
    "is_nullable": {
        "features": ("null_ratio",),
        "kind": "lambda",
        "description": "Contains null values",
    },
    "has_low_cardinality": {
        "features": ("unique_ratio",),
        "kind": "lambda",
        "description": "Low cardinality (distinct values < 10%)",
    },
    "quartile_thresholds": {
        "features": ("Q1", "Q3"),
        "kind": "lambda",
        "description": "Quartile thresholds within acceptable range",
    },
    "length_within": {
        "features": ("min_len", "max_len"),
        "kind": "lambda",
        "description": "String length within expected range",
    },
}

#: cluster_analysis typical_ranges / importance feature lists
#: (reference cluster_matcher.py:226-228, 385-386)
TYPICAL_RANGE_FEATURES = (
    "null_ratio",
    "unique_ratio",
    "characters_numeric",
    "characters_alphabet",
    "avg_len",
    "most_freq_value_ratio",
)
IMPORTANCE_FEATURES = (
    "null_ratio",
    "unique_ratio",
    "characters_numeric",
    "characters_alphabet",
    "avg_len",
)


def _table_paths() -> dict[str, list[str]]:
    """dataset → dirty CSV path(s); movies_1 is the two vendored
    halves (their union IS the artifact-era 7,390-row table)."""
    q = quintet_fixture_dir()
    s = quintet_split_fixture_dir()
    return {
        "flights": [os.path.join(q, "flights", "dirty.csv")],
        "hospital": [os.path.join(q, "hospital", "dirty.csv")],
        "rayyan": [os.path.join(q, "rayyan", "dirty.csv")],
        "movies_1": [
            os.path.join(s, "movies_1", "dirty.csv"),
            os.path.join(s, "movies_2", "dirty.csv"),
        ],
        "beers": [os.path.join(q, "beers", "dirty.csv")],
    }


def artifact_tables(spark: SparkSession) -> dict[str, DataFrame]:
    """S1 all-string ingest of the five artifact-era tables."""
    out = {}
    for ds, paths in _table_paths().items():
        df = read_csv_all_string(spark, paths[0])
        for p in paths[1:]:
            df = df.unionByName(read_csv_all_string(spark, p))
        out[ds] = df
    return out


def _members_df(spark: SparkSession) -> DataFrame:
    rows = [(m, 0, i) for i, m in enumerate(CLUSTER_0)]
    rows += [(m, 1, i) for i, m in enumerate(CLUSTER_1)]
    return spark.createDataFrame(rows, "member string, cluster_id int, seq int")


def _member_sql_values() -> str:
    rows = [f"('{m}', 0, {i})" for i, m in enumerate(CLUSTER_0)]
    rows += [f"('{m}', 1, {i})" for i, m in enumerate(CLUSTER_1)]
    return ", ".join(rows)


# ---------------------------------------------------------------------------
# engine side — profile the five tables, aggregate per cluster
# ---------------------------------------------------------------------------


#: session-keyed cache of the (tiny) member-profile frame: the three
#: golden trained-rules queries each consume the SAME 66-row profile of
#: the same five fixture CSVs, so the profiling pass runs once per
#: session and variant; the frame is materialized as a local relation
#: (66 collected rows) so downstream plans carry no repeated CSV scans
#: or thousand-expression profile subtrees. The DuckDB oracles still
#: recompute end-to-end from the raw CSVs. (r12 — r11 verdict item 4.)
import weakref

_MEMBER_PROFILE_CACHE: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def member_profiles(spark: SparkSession, with_values: bool = True) -> DataFrame:
    cache = _MEMBER_PROFILE_CACHE.setdefault(spark, {})
    df = cache.get(with_values)
    if df is None:
        live = _member_profiles_live(spark, with_values)
        df = spark.createDataFrame(live.collect(), live.schema)
        cache[with_values] = df
    return df


def _member_profiles_live(spark: SparkSession, with_values: bool = True) -> DataFrame:
    """One row per member column with every profile stat the artifacts
    consume — the shared wide-agg profiler in its CSV-coerce mode
    (the same plan family as the oracle-green quintet_beers_profile)."""
    from datalakerulegeneration_spark.profiling.profiler import profile_tables

    members = {m for m in CLUSTER_0} | {m for m in CLUSTER_1}
    # profile ONLY member columns — movies' non-member text columns
    # (full_cast, description: megabytes of cells) would dominate the
    # char-class scans for stats nothing downstream reads
    tables = {}
    for ds, df in artifact_tables(spark).items():
        keep = [c for c in df.columns if f"{ds}_{c}" in members]
        if keep:
            tables[ds] = df.select(*keep)
    prof = profile_tables(
        spark,
        tables,
        with_tokens=False,
        with_values=with_values,
        coerce_numeric=True,
    )
    return prof.withColumn(
        "member", F.concat(F.col("table"), F.lit("_"), F.col("column"))
    ).where(F.col("member").isin(*sorted(members)))


def _mean_std_exprs(v: str, n: str) -> tuple[str, str]:
    """Order-independent mean / population std: exact DECIMAL(18,6)
    sums; the square is a DECIMAL×DECIMAL product — (18,6)×(18,6) →
    (37,12), EXACT in both engines with no per-element double→decimal
    conversion whose last-ulp rounding could differ (a double-squared
    variant crossed a round(6) boundary between engines — r11). Final
    algebra runs in double over the bit-identical decimal sums."""
    d = f"try_cast({v} as decimal(18,6))"
    s = f"cast(sum({d}) as double)"
    sq = f"cast(sum({d} * {d}) as double)"
    mean = f"({s} / {n})"
    std = f"sqrt(greatest(0.0, {sq} / {n} - {mean} * {mean}))"
    return mean, std


def trained_feature_ranges(spark: SparkSession) -> DataFrame:
    """R20/A3 under the reference protocol: per (cluster, feature) the
    5th/95th percentile (linear interpolation ≡ np.percentile ≡
    quantile_cont), mean and population std of the member columns'
    profile stats — the feature_ranges frame of the published
    trained_rules artifacts (reference train_clean_rules.py:44-58).
    NULL in all four stats ⇔ the published NaN poisoning (module
    docstring)."""
    prof = member_profiles(spark, with_values=False)
    stack = ", ".join(
        f"'{pub}', cast(`{eng}` as double)" for pub, eng in RANGE_FEATURES.items()
    )
    long = prof.selectExpr(
        "member", f"stack({len(RANGE_FEATURES)}, {stack}) as (feature, value)"
    ).join(_members_df(spark), "member")
    mean, std = _mean_std_exprs("value", "cast(count(value) as double)")
    g = long.groupBy("cluster_id", "feature").agg(
        F.expr("max(case when value is null then 1 else 0 end)").alias("poisoned"),
        F.expr("percentile(value, 0.05)").alias("low_raw"),
        F.expr("percentile(value, 0.95)").alias("high_raw"),
        F.expr(mean).alias("mean_raw"),
        F.expr(std).alias("std_raw"),
    )
    keep = lambda c: F.when(F.col("poisoned") == 0, F.col(c))  # noqa: E731
    # percentiles are interpolation over bit-identical inputs (raw);
    # mean/std come from sums whose double→DECIMAL conversion rounds
    # differently in the two engines' last ulp — round(6), the
    # registry convention for summation-derived floats
    return g.select(
        "cluster_id",
        "feature",
        keep("low_raw").alias("low"),
        keep("high_raw").alias("high"),
        F.round(keep("mean_raw"), 6).alias("mean"),
        F.round(keep("std_raw"), 6).alias("std"),
    ).orderBy("cluster_id", "feature")


def _member_profile_sql(stats: dict[str, str]) -> str:
    """DuckDB per-member profile rows: for each member column one row
    with the requested stats (name → SQL-template key in the stats
    registry), via the shared S1 ingest twin."""
    from datalakerulegeneration_spark.profiling import stats as S

    by_name = {st.name: st for st in S.stats_for_kind(S.COERCED)}
    paths = _table_paths()
    ctes = []
    selects = []
    members = set(CLUSTER_0) | set(CLUSTER_1)
    for ds, ps in paths.items():
        src = " UNION ALL ".join(s1_ingest_sql(p) for p in ps)
        # r13: one MATERIALIZED ingest CTE per dataset — the previous
        # shape inlined the full multiLine-CSV ingest subquery into
        # EVERY member column's branch (plus once more inside each
        # modal-value scalar subquery), so DuckDB re-parsed each CSV
        # ~2× per member column (the cluster-analysis oracle measured
        # 110 s; identical rows in 1-2 s with the shared ingest)
        cte = f"__mp_{ds}"
        ctes.append(f"{cte} AS MATERIALIZED ({src})")
        cols = csv_header(ps[0])
        for c in cols:
            member = f"{ds}_{c}"
            if member not in members:
                continue
            qc = '"' + c.replace('"', '""') + '"'
            exprs = []
            for out, eng in stats.items():
                if eng == "most_freq_value_ratio":
                    # reference: value_counts(normalize=True).iloc[0]
                    # over the numeric coercion — modal numeric value's
                    # share of the numeric count (the value_stats twin)
                    e = (
                        f"(SELECT CAST(max(cnt) AS DOUBLE) / CAST(sum(cnt) AS DOUBLE)"
                        f" FROM (SELECT count(*) AS cnt FROM {cte}"
                        f" WHERE TRY_CAST({qc} AS DOUBLE) IS NOT NULL"
                        f" GROUP BY TRY_CAST({qc} AS DOUBLE)))"
                    )
                else:
                    e = f"({by_name[eng].sql(qc)})"
                exprs.append(f"{e} AS {out}")
            selects.append(
                f"SELECT '{member}' AS member, {', '.join(exprs)} FROM {cte}"
            )
    return (
        "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(selects)
    )


def trained_feature_ranges_sql() -> str:
    """DuckDB twin of :func:`trained_feature_ranges`."""
    stats = {f"s_{pub.lower()}": eng for pub, eng in RANGE_FEATURES.items()}
    prof = _member_profile_sql(stats)
    unpivot = " UNION ALL ".join(
        f"SELECT member, '{pub}' AS feature, s_{pub.lower()} AS value FROM prof"
        for pub in RANGE_FEATURES
    )
    # exact-decimal recipe — see _mean_std_exprs; the multiply operands
    # are DECIMAL(19,6): width<=18 keeps DuckDB's product in int64 (it
    # overflows), width 19 promotes to int128 and the (38,12) product
    # is EXACT — the same exact value Spark's (18,6)x(18,6)->(37,12)
    # computes, so the engines agree bit-for-bit
    s = "CAST(sum(TRY_CAST(value AS DECIMAL(18,6))) AS DOUBLE)"
    sq = (
        "CAST(sum(TRY_CAST(value AS DECIMAL(19,6))"
        " * TRY_CAST(value AS DECIMAL(19,6))) AS DOUBLE)"
    )
    n = "CAST(count(value) AS DOUBLE)"
    return f"""
WITH prof AS ({prof}),
members(member, cluster_id, seq) AS (VALUES {_member_sql_values()}),
long AS (SELECT m.cluster_id, u.feature, u.value
         FROM ({unpivot}) u JOIN members m USING (member)),
agg AS (
  SELECT cluster_id, feature,
         max(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS poisoned,
         quantile_cont(value, 0.05) AS low_raw,
         quantile_cont(value, 0.95) AS high_raw,
         {s} / {n} AS mean_raw,
         sqrt(greatest(0.0, {sq} / {n} - ({s} / {n}) * ({s} / {n}))) AS std_raw
  FROM long GROUP BY 1, 2)
SELECT cluster_id, feature,
       CASE WHEN poisoned = 0 THEN low_raw END AS low,
       CASE WHEN poisoned = 0 THEN high_raw END AS high,
       round(CASE WHEN poisoned = 0 THEN mean_raw END, 6) AS mean,
       round(CASE WHEN poisoned = 0 THEN std_raw END, 6) AS std
FROM agg ORDER BY cluster_id, feature
"""


# ---------------------------------------------------------------------------
# cluster_analysis.json — A4 under the reference protocol
# ---------------------------------------------------------------------------


def cluster_analysis_metrics(spark: SparkSession) -> DataFrame:
    """The numeric surface of the published cluster_analysis.json for
    cluster 1 as (section, feature, stat, value) rows: size,
    typical_ranges (min/max/mean/std ×6 features,
    cluster_matcher.py:226-237), feature_importance (normalized
    population variance with None→0, :385-401) and quality_metrics
    (mean / 1−std of pairwise ``_fallback_match`` scores, :402-415;
    the type term is constant — era convention, module docstring)."""
    prof = member_profiles(spark)
    m1 = _members_df(spark).where(F.col("cluster_id") == 1)
    p = prof.join(m1, "member")

    # size
    size = p.groupBy().agg(F.count("*").cast("double").alias("value")).selectExpr(
        "'profile' as section", "'size' as feature", "'n' as stat", "value"
    )

    # typical_ranges: None-filtered min/max/mean/std
    parts = [size]
    for feat in TYPICAL_RANGE_FEATURES:
        mean, std = _mean_std_exprs(f"`{feat}`", f"cast(count(`{feat}`) as double)")
        g = p.groupBy().agg(
            F.min(F.col(feat)).cast("double").alias("mn"),
            F.max(F.col(feat)).cast("double").alias("mx"),
            F.round(F.expr(mean), 6).alias("me"),
            F.round(F.expr(std), 6).alias("sd"),
        )
        parts.append(
            g.selectExpr(
                "'typical_ranges' as section",
                f"'{feat}' as feature",
                "stack(4, 'min', mn, 'max', mx, 'mean', me, 'std', sd) as (stat, value)",
            )
        )

    # feature_importance: var over coalesce(value, 0), normalized
    var_aggs = []
    for feat in IMPORTANCE_FEATURES:
        v = f"coalesce(cast(`{feat}` as double), 0.0)"
        _, std = _mean_std_exprs(v, "cast(count(*) as double)")
        var_aggs.append(F.expr(f"{std} * {std}").alias(f"var_{feat}"))
    iv = p.groupBy().agg(*var_aggs)
    total = " + ".join(f"`var_{f}`" for f in IMPORTANCE_FEATURES)
    imp_stack = ", ".join(
        f"'{f}', round(`var_{f}` / ({total}), 6)" for f in IMPORTANCE_FEATURES
    )
    parts.append(
        iv.selectExpr(
            "'feature_importance' as section",
            f"stack({len(IMPORTANCE_FEATURES)}, {imp_stack}) as (feature, value)",
        ).selectExpr("section", "feature", "'share' as stat", "value")
    )

    # quality_metrics: pairwise fallback sims over (null_ratio,
    # unique_ratio) — 29×29/2 pairs, column-profile grain
    lite = p.select(
        "seq",
        F.col("null_ratio").alias("nr"),
        F.col("unique_ratio").alias("ur"),
    )
    a, b = lite.alias("a"), lite.alias("b")
    pairs = a.join(b, F.col("a.seq") < F.col("b.seq")).select(
        F.expr(
            "least(1.0, 0.3 + (1.0 - abs(a.nr - b.nr)) * 0.3"
            " + (1.0 - abs(a.ur - b.ur)) * 0.4)"
        ).alias("sim")
    )
    mean, std = _mean_std_exprs("sim", "cast(count(sim) as double)")
    q = pairs.groupBy().agg(F.expr(mean).alias("coh"), F.expr(std).alias("sd"))
    parts.append(
        q.selectExpr(
            "'quality_metrics' as section",
            "stack(2, 'cohesion', round(coh, 6),"
            " 'consistency', round(greatest(0.0, 1.0 - sd), 6))"
            " as (feature, value)",
        ).selectExpr("section", "feature", "'value' as stat", "value")
    )

    # error_patterns: member indices per condition (:352-375)
    ep = p.selectExpr(
        "'error_patterns' as section",
        """stack(3,
            'high_null_columns', case when null_ratio > 0.5 then cast(seq as double) end,
            'low_uniqueness',   case when unique_ratio < 0.1 then cast(seq as double) end,
            'outlier_lengths',  case when avg_len < 2 or avg_len > 100 then cast(seq as double) end
        ) as (feature, value)""",
    ).where("value is not null").selectExpr(
        "section", "feature", "cast(cast(value as int) as string) as stat", "value"
    )
    parts.append(ep)

    out = parts[0]
    for x in parts[1:]:
        out = out.unionByName(x)
    return out.orderBy("section", "feature", "stat")


def cluster_analysis_metrics_sql() -> str:
    """DuckDB twin of :func:`cluster_analysis_metrics`."""
    stats = {
        "nr": "null_ratio",
        "ur": "unique_ratio",
        "cn": "characters_numeric",
        "ca": "characters_alphabet",
        "al": "avg_len",
        "mf": "most_freq_value_ratio",
    }
    prof = _member_profile_sql(stats)
    alias = {
        "null_ratio": "nr",
        "unique_ratio": "ur",
        "characters_numeric": "cn",
        "characters_alphabet": "ca",
        "avg_len": "al",
        "most_freq_value_ratio": "mf",
    }

    def dec_mean_std(v: str, n: str) -> tuple[str, str]:
        # exact-decimal recipe — see _mean_std_exprs; DECIMAL(19,6)
        # square operands for DuckDB's int128 path (exact, = Spark)
        d = f"TRY_CAST({v} AS DECIMAL(18,6))"
        d19 = f"TRY_CAST({v} AS DECIMAL(19,6))"
        s = f"CAST(sum({d}) AS DOUBLE)"
        sq = f"CAST(sum({d19} * {d19}) AS DOUBLE)"
        mean = f"({s} / {n})"
        std = f"sqrt(greatest(0.0, {sq} / {n} - {mean} * {mean}))"
        return mean, std

    agg_cols = []
    for feat in TYPICAL_RANGE_FEATURES:
        c = alias[feat]
        mean, std = dec_mean_std(c, f"CAST(count({c}) AS DOUBLE)")
        agg_cols += [
            f"CAST(min({c}) AS DOUBLE) AS min_{c}",
            f"CAST(max({c}) AS DOUBLE) AS max_{c}",
            f"round({mean}, 6) AS mean_{c}",
            f"round({std}, 6) AS std_{c}",
        ]
    var_cols = []
    for feat in IMPORTANCE_FEATURES:
        c = alias[feat]
        v = f"coalesce({c}, 0.0)"
        _, std = dec_mean_std(v, "CAST(count(*) AS DOUBLE)")
        var_cols.append(f"({std} * {std}) AS var_{c}")
    total = " + ".join(f"var_{alias[f]}" for f in IMPORTANCE_FEATURES)

    metric_selects = [
        "SELECT 'profile' AS section, 'size' AS feature, 'n' AS stat,"
        " n_members AS value FROM p1"
    ]
    for feat in TYPICAL_RANGE_FEATURES:
        c = alias[feat]
        for stat in ("min", "max", "mean", "std"):
            metric_selects.append(
                f"SELECT 'typical_ranges', '{feat}', '{stat}', {stat}_{c} FROM p1"
            )
    for feat in IMPORTANCE_FEATURES:
        c = alias[feat]
        metric_selects.append(
            f"SELECT 'feature_importance', '{feat}', 'share',"
            f" round(var_{c} / ({total}), 6) FROM p1"
        )
    metric_selects.append(
        "SELECT 'quality_metrics', 'cohesion', 'value', round(coh, 6) FROM q"
    )
    metric_selects.append(
        "SELECT 'quality_metrics', 'consistency', 'value',"
        " round(greatest(0.0, 1.0 - sd), 6) FROM q"
    )
    metric_selects.append(
        """SELECT 'error_patterns', s.kind, CAST(CAST(s.value AS INT) AS VARCHAR), s.value
FROM (
  SELECT kind, CAST(seq AS DOUBLE) AS value FROM (
    SELECT 'high_null_columns' AS kind, seq FROM p WHERE nr > 0.5
    UNION ALL SELECT 'low_uniqueness', seq FROM p WHERE ur < 0.1
    UNION ALL SELECT 'outlier_lengths', seq FROM p WHERE al < 2 OR al > 100
  )
) s"""
    )
    sim = (
        "least(1.0, 0.3 + (1.0 - abs(a.nr - b.nr)) * 0.3"
        " + (1.0 - abs(a.ur - b.ur)) * 0.4)"
    )
    pmean, pstd = dec_mean_std("sim", "CAST(count(sim) AS DOUBLE)")
    body = "\nUNION ALL\n".join(metric_selects)
    # r13: every CTE is MATERIALIZED — the ~32 metric UNION branches
    # each read p/p1/q, and DuckDB's default inlining re-executed the
    # whole profile subtree once per branch (53 s; 1-2 s materialized,
    # identical rows — pure evaluation-strategy hint)
    return f"""
WITH prof AS MATERIALIZED ({prof}),
members(member, cluster_id, seq) AS MATERIALIZED (VALUES {_member_sql_values()}),
p AS MATERIALIZED (SELECT prof.*, m.seq FROM prof JOIN members m USING (member) WHERE m.cluster_id = 1),
p1 AS MATERIALIZED (SELECT {", ".join(agg_cols)}, {", ".join(var_cols)},
              CAST(count(*) AS DOUBLE) AS n_members FROM p),
pairs AS MATERIALIZED (SELECT {sim} AS sim FROM p a JOIN p b ON a.seq < b.seq),
q AS MATERIALIZED (SELECT {pmean} AS coh, {pstd} AS sd FROM pairs)
{body}
ORDER BY section, feature, stat
"""


# ---------------------------------------------------------------------------
# common_patterns — the published top-5 modal generalize-patterns
# ---------------------------------------------------------------------------


def generalize_pattern_expr(col: str) -> str:
    """Spark SQL replica of the artifact-era ``generalize_pattern``
    (reference profiler.py:135-152): per char, digit→'0', letter→'A',
    ASCII punctuation kept, whitespace→'_', anything else→'?'.
    Sequential regexp passes classify ORIGINAL characters only
    (inserted '0'/'A'/'_' are never letters/digits/whitespace to a
    later pass)."""
    s = f"regexp_replace({col}, '\\\\p{{Nd}}', '0')"
    s = f"regexp_replace({s}, '\\\\p{{L}}', 'A')"
    s = f"regexp_replace({s}, '[\\\\s\\\\u00A0\\\\u1680\\\\u2000-\\\\u200A\\\\u2028\\\\u2029\\\\u202F\\\\u205F\\\\u3000\\\\u001C-\\\\u001F\\\\u0085]', '_')"
    return f"regexp_replace({s}, '[^0A_\\\\p{{Punct}}]', '?')"


def generalize_pattern_duck(col: str) -> str:
    """DuckDB (RE2) twin of :func:`generalize_pattern_expr`."""
    s = f"regexp_replace({col}, '\\p{{Nd}}', '0', 'g')"
    s = f"regexp_replace({s}, '\\p{{L}}', 'A', 'g')"
    s = (
        f"regexp_replace({s}, '[\\s\\x{{00A0}}\\x{{1680}}\\x{{2000}}-\\x{{200A}}"
        f"\\x{{2028}}\\x{{2029}}\\x{{202F}}\\x{{205F}}\\x{{3000}}"
        f"\\x{{001C}}-\\x{{001F}}\\x{{0085}}]', '_', 'g')"
    )
    return f"regexp_replace({s}, '[^0A_[:punct:]]', '?', 'g')"


def common_patterns(spark: SparkSession) -> DataFrame:
    """The published common_patterns top-5 (cluster_matcher.py:239-245):
    each member's MODAL generalize-pattern, counted across the cluster,
    top 5 by (count desc, first-appearance asc along the member order —
    Python's stable sort over insertion-ordered counts). The
    within-column modal tie-break is (count desc, pattern asc); the one
    tied member (hospital_name) has a count-1 modal either way, so the
    top-5 is insensitive to it (pinned in the parity test)."""
    tables = artifact_tables(spark)
    melted = []
    for ds in ARTIFACT_TABLE_ORDER:
        df = tables[ds]
        cols = [c for c in df.columns if f"{ds}_{c}" in set(CLUSTER_1)]
        if not cols:
            continue
        stack = ", ".join(f"'{ds}_{c}', `{c}`" for c in cols)
        melted.append(
            df.selectExpr(f"stack({len(cols)}, {stack}) as (member, cell)")
        )
    cells = melted[0]
    for m in melted[1:]:
        cells = cells.unionByName(m)
    pats = cells.selectExpr("member", f"{generalize_pattern_expr('cell')} as pattern")
    counts = pats.groupBy("member", "pattern").count()
    from pyspark.sql.window import Window

    w = Window.partitionBy("member").orderBy(
        F.col("count").desc(), F.col("pattern").asc()
    )
    modal = (
        counts.withColumn("rn", F.row_number().over(w))
        .where("rn = 1")
        .select("member", "pattern")
        .join(_members_df(spark).where("cluster_id = 1"), "member")
    )
    top = modal.groupBy("pattern").agg(
        F.count("*").alias("cnt"), F.min("seq").alias("first_seq")
    )
    w2 = Window.orderBy(F.col("cnt").desc(), F.col("first_seq").asc())
    return (
        top.withColumn("rank", F.row_number().over(w2))
        .where("rank <= 5")
        .select("rank", "pattern", F.col("cnt").cast("double").alias("cnt"))
        .orderBy("rank")
    )


def common_patterns_sql() -> str:
    """DuckDB twin of :func:`common_patterns`."""
    paths = _table_paths()
    melts = []
    for ds in ARTIFACT_TABLE_ORDER:
        ps = paths[ds]
        src = " UNION ALL ".join(s1_ingest_sql(p) for p in ps)
        cols = [c for c in csv_header(ps[0]) if f"{ds}_{c}" in set(CLUSTER_1)]
        for c in cols:
            qc = '"' + c.replace('"', '""') + '"'
            melts.append(
                f"SELECT '{ds}_{c}' AS member, {qc} AS cell FROM ({src})"
            )
    cells = "\nUNION ALL\n".join(melts)
    return f"""
WITH cells AS ({cells}),
members(member, cluster_id, seq) AS (VALUES {_member_sql_values()}),
pats AS (SELECT member, {generalize_pattern_duck('cell')} AS pattern FROM cells),
counts AS (SELECT member, pattern, count(*) AS c FROM pats GROUP BY 1, 2),
modal AS (
  SELECT member, pattern FROM (
    SELECT member, pattern,
           row_number() OVER (PARTITION BY member ORDER BY c DESC, pattern ASC) AS rn
    FROM counts) WHERE rn = 1),
top AS (
  SELECT m.pattern, count(*) AS cnt, min(mm.seq) AS first_seq
  FROM modal m JOIN members mm USING (member)
  WHERE mm.cluster_id = 1 GROUP BY 1)
SELECT rank, pattern, cnt FROM (
  SELECT row_number() OVER (ORDER BY cnt DESC, first_seq ASC) AS rank,
         pattern, CAST(cnt AS DOUBLE) AS cnt
  FROM top)
WHERE rank <= 5 ORDER BY rank
"""


#: published dataset-profile field → (engine column stat, divide-by-n)
#: — the reference normalizes per-column TOTALS by row count before the
#: across-columns mean/var (profiler.py:581-585 f()/g()); ratio-valued
#: stats (null_ratio ≡ cells_null/n, avg_len ≡ cells_length/n) are
#: already normalized
DATASET_PROFILE_FAMILIES = {
    "cells_null": ("null_ratio", False),
    "cells_unique": ("distinct_num", True),
    "cells_length": ("avg_len", False),
    "cells_numeric": ("cells_numeric", True),
    "cells_punctuation": ("cells_punctuation", True),
    "characters_alphabet": ("characters_alphabet", True),
    "characters_numeric": ("characters_numeric", True),
}


def dataset_profile_golden(spark: SparkSession, csv_path: str, name: str) -> DataFrame:
    """P20 on the published-artifact grain (r11, path-parameterized
    r12): a DATASET profile's seven convention-shared stat families as
    (field, value) rows — per-column profile stats from the S1 CSV
    ingest, scaled to the reference's per-row normalization, then the
    across-columns mean and population variance via the registry's
    exact-decimal recipe (shared with dataset_similarity). The
    published ``dataset_profile.dictionary`` values for these fields
    replicate (tests/test_published_artifacts.py pins all eleven
    datasets)."""
    from datalakerulegeneration_spark.profiling import dataset_profile, profile_table

    df = read_csv_all_string(spark, csv_path)
    prof = profile_table(
        spark, df, name, with_tokens=False, with_values=False, coerce_numeric=True
    )
    ds = dataset_profile(prof)
    nrow = prof.groupBy().agg(F.max("row_num").cast("double").alias("n"))
    j = ds.crossJoin(F.broadcast(nrow))
    rows = []
    for fam, (stat, divide) in DATASET_PROFILE_FAMILIES.items():
        m = f"`{stat}_mean`" + (" / n" if divide else "")
        v = f"`{stat}_var`" + (" / (n * n)" if divide else "")
        rows.append(f"'{fam}_mean', round({m}, 6)")
        rows.append(f"'{fam}_variance', round({v}, 6)")
    return j.selectExpr(
        f"stack({2 * len(DATASET_PROFILE_FAMILIES)}, {', '.join(rows)})"
        " as (field, value)"
    ).orderBy("field")


def dataset_profile_golden_sql(path: str, name: str) -> str:
    """DuckDB twin of :func:`dataset_profile_golden` — the
    dataset_similarity oracle's sums/moments recipe over the S1 CSV
    ingest, scaled identically."""
    from datalakerulegeneration_spark.profiling import stats as S
    from datalakerulegeneration_spark.profiling.wide_sql import wide_profile_sql

    kinds = [(c, S.COERCED) for c in csv_header(path)]
    prof = wide_profile_sql(name, kinds, with_values=False)
    src = s1_ingest_sql(path)
    stats = sorted({stat for stat, _ in DATASET_PROFILE_FAMILIES.values()})
    sums = []
    for c in stats:
        d = f"CAST(TRY_CAST({c} AS DECIMAL(18,6)) AS DECIMAL(19,6))"
        sums.append(f"sum({d}) AS s1_{c}")
        sums.append(f"sum({d} * {d}) AS s2_{c}")
        sums.append(f"CAST(count({d}) AS DOUBLE) AS n_{c}")
    moments = []
    for c in stats:
        mean = f"(CAST(s1_{c} AS DOUBLE) / NULLIF(n_{c}, 0.0))"
        moments.append(f"{mean} AS {c}_mean")
        moments.append(
            f"(CAST(s2_{c} AS DOUBLE) / NULLIF(n_{c}, 0.0) - {mean} * {mean}) AS {c}_var"
        )
    rows = []
    for fam, (stat, divide) in DATASET_PROFILE_FAMILIES.items():
        m = f"{stat}_mean" + (" / n" if divide else "")
        v = f"{stat}_var" + (" / (n * n)" if divide else "")
        rows.append(f"SELECT '{fam}_mean' AS field, round({m}, 6) AS value FROM ds")
        rows.append(f"SELECT '{fam}_variance', round({v}, 6) FROM ds")
    # MATERIALIZED (r13): the 14 field branches each read ds — default
    # CTE inlining re-executed the whole wide profile per branch
    return f"""
WITH {name} AS MATERIALIZED ({src}),
prof AS MATERIALIZED ({prof}),
nrow AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM {name}),
sums AS (SELECT {', '.join(sums)} FROM prof),
ds AS MATERIALIZED (SELECT {', '.join(moments)}, nrow.n FROM sums CROSS JOIN nrow)
{" UNION ALL ".join(rows)}
ORDER BY field
"""


def dataset_profile_beers(spark: SparkSession) -> DataFrame:
    return dataset_profile_golden(
        spark, os.path.join(quintet_fixture_dir(), "beers", "dirty.csv"), "beers"
    )


def dataset_profile_beers_sql() -> str:
    return dataset_profile_golden_sql(
        os.path.join(quintet_fixture_dir(), "beers", "dirty.csv"), "beers"
    )


def dataset_profile_estuary(spark: SparkSession) -> DataFrame:
    """The second registered dataset-profile golden group (r12 — r11
    verdict item 6): the temp estuary 2008 assessment, a structurally
    different schema family from every Quintet pair; its published
    pickle replicates with zero adjudicated fields."""
    from datalakerulegeneration_spark.evaluation.golden import temp_fixture_dir

    return dataset_profile_golden(
        spark, os.path.join(temp_fixture_dir(), "estuary2008", "dirty.csv"), "estuary2008"
    )


def dataset_profile_estuary_sql() -> str:
    from datalakerulegeneration_spark.evaluation.golden import temp_fixture_dir

    return dataset_profile_golden_sql(
        os.path.join(temp_fixture_dir(), "estuary2008", "dirty.csv"), "estuary2008"
    )


def dataset_rule_suggestions(profile: dict) -> list[tuple[str, dict]]:
    """A5 rule suggestion from a DATASET profile (reference
    rule_generation_pipleline.py:37-60 ``rule_with_params``): each
    template fires on a threshold over the dataset-level stats and
    emits its parameter dict; the published
    ``results/Quintet/beers/dataset_rules.dictionary`` is this list
    (shared across all 54 keyword keys) — replicated exactly in
    tests/test_trained_rules_golden.py."""
    g = profile.get
    kw = profile.get("dataset_top_keywords", {})
    out = [
        ("is_unique", {"min_uniqueness_ratio": 1.0})
        if g("distinct_values", 0) / max(g("num_rows", 1), 1) >= 1.0
        else None,
        ("is_nullable", {"null_threshold": 0.02})
        if g("characters_unique_mean", 0) < 0.02
        else None,
        ("is_constant", {"unique_word_mean": g("words_unique_mean")})
        if g("words_unique_mean", 1) < 0.1
        else None,
        ("has_low_cardinality", {"threshold": 0.3})
        if g("words_unique_mean", 1) < 0.3
        else None,
        ("value_in_range", {"min": 0, "max": g("characters_numeric_mean", 0) * 3})
        if g("characters_numeric_mean", 0) > 1.0
        else None,
        ("value_histogram_match", {"variance_threshold": 1.0})
        if g("characters_numeric_variance", 0) > 1.0
        else None,
        ("top_n_frequency_check", {"alphabet_mean": g("characters_alphabet_mean")})
        if g("characters_alphabet_mean", 0) > 3.0
        else None,
        ("quartile_thresholds", {"alphabet_variance": g("characters_alphabet_variance")})
        if g("characters_alphabet_variance", 0) > 30
        else None,
        ("benford_conformity", {"numeric_mean": g("characters_numeric_mean")})
        if g("characters_numeric_mean", 0) > 1.5
        else None,
        ("matches_regex", {"alphabet_variance": g("characters_alphabet_variance")})
        if g("characters_alphabet_variance", 0) > 40
        else None,
        ("length_within", {"min_length": 3, "max_length": g("characters_alphabet_mean")})
        if g("characters_alphabet_mean", 0) > 5
        else None,
        ("decimal_precision", {"max_precision": 3})
        if g("characters_numeric_variance", 0) < 3
        else None,
        ("semantic_class_is", {"class": "percentage"}) if "abv" in kw else None,
        ("domain_is", {"domain": "US States"}) if "state" in kw else None,
    ]
    return [r for r in out if r]


# ---------------------------------------------------------------------------
# driver-side artifact assembly (pytest parity vs the vendored JSON)
# ---------------------------------------------------------------------------


def trained_rules_artifact(spark: SparkSession, clusters: tuple[int, ...] = (1,)) -> dict:
    """Assemble the serialized trained-rules dict exactly as the
    reference's serialize_trained_rules writes it (rule_utils.py:16-38):
    feature_ranges (np-precision — driver two-pass mean/std over the
    collected member stats, matching np.mean/np.std bit-for-bit) plus
    the rules section (numeric condition → feature mean, callable →
    the literal "lambda")."""
    import numpy as np

    prof = {
        r["member"]: r.asDict()
        for r in member_profiles(spark, with_values=False).collect()
    }
    members = {0: CLUSTER_0, 1: CLUSTER_1}
    out = {}
    for cid in clusters:
        vals_by_feat = {}
        for pub, eng in RANGE_FEATURES.items():
            # published-NaN convention: a string column's Q1/Q3 is NULL
            # here but NaN (poisoning) in the artifact-era pandas frame;
            # keep MEMBER ORDER — np.mean/np.std pairwise summation is
            # order-sensitive in the last ulp and the parity is bit-exact
            vals_by_feat[pub] = [
                prof[m][eng] if prof[m][eng] is not None else float("nan")
                for m in members[cid]
            ]
        ranges = {
            pub: {
                "low": float(np.percentile(v, 5)),
                "high": float(np.percentile(v, 95)),
                "mean": float(np.mean(v)),
                "std": float(np.std(v)),
            }
            for pub, v in vals_by_feat.items()
        }
        rules = {}
        for name, spec in RULE_PROFILES_V0.items():
            conditions = {}
            for feat in spec["features"]:
                if spec["kind"] == "mean":
                    conditions[feat] = ranges[feat]["mean"]
                else:
                    conditions[feat] = "lambda"
            rules[name] = {
                "description": spec["description"],
                "conditions": conditions,
            }
        out[str(cid)] = {"feature_ranges": ranges, "rules": rules}
    return out


def cluster_analysis_artifact(spark: SparkSession) -> dict:
    """Assemble the published cluster_analysis.json structure for
    cluster 1 (cluster_matcher.analyze_clusters) from the engine
    frames + driver np math (np-precision parity)."""
    import numpy as np

    prof = {r["member"]: r.asDict() for r in member_profiles(spark).collect()}
    feats = [prof[m] for m in CLUSTER_1]
    cp = [
        (r["pattern"], int(r["cnt"]))
        for r in common_patterns(spark).collect()
    ]
    typical = {}
    for feat in TYPICAL_RANGE_FEATURES:
        vals = [f[feat] for f in feats if f.get(feat) is not None]
        typical[feat] = {
            "min": min(vals),
            "max": max(vals),
            "mean": float(np.mean(vals)),
            "std": float(np.std(vals)),
        }
    importance = {}
    for feat in IMPORTANCE_FEATURES:
        vals = [f[feat] if f.get(feat) is not None else 0.0 for f in feats]
        importance[feat] = float(np.var(vals))
    total = sum(importance.values())
    importance = {k: v / total for k, v in importance.items()}
    sims = []
    for i in range(len(feats)):
        for j in range(i + 1, len(feats)):
            a, b = feats[i], feats[j]
            # +0.3 type term: artifact-era basic_data_type is 'string'
            # for every member (module docstring)
            s = (
                0.3
                + (1.0 - abs(a["null_ratio"] - b["null_ratio"])) * 0.3
                + (1.0 - abs(a["unique_ratio"] - b["unique_ratio"])) * 0.4
            )
            sims.append(min(1.0, s))
    quality = {
        "cohesion": float(np.mean(sims)),
        "consistency": max(0.0, 1.0 - float(np.std(sims))),
        "size": len(feats),
    }
    error_patterns = {
        "high_null_columns": [
            i for i, f in enumerate(feats) if f["null_ratio"] > 0.5
        ],
        "low_uniqueness": [
            i for i, f in enumerate(feats) if f["unique_ratio"] < 0.1
        ],
        "outlier_lengths": [
            i for i, f in enumerate(feats) if f["avg_len"] < 2 or f["avg_len"] > 100
        ],
        "inconsistent_types": [],
    }
    rules = [
        {
            "type": "pattern_match",
            "pattern": cp[0][0],
            "flexibility": 0.2,
            "weight": 0.5,
        },
        {
            "type": "null_consistency",
            "expected_range": [
                typical["null_ratio"]["min"],
                typical["null_ratio"]["max"],
            ],
            "weight": 0.1,
        },
    ]
    return {
        "1": {
            "profile": {
                "size": len(feats),
                "type": "structured",
                "common_patterns": [[p, c] for p, c in cp],
                "typical_ranges": typical,
                "dominant_features": {},
                "variance_features": {},
            },
            "rules": rules,
            "error_patterns": error_patterns,
            "feature_importance": importance,
            "quality_metrics": quality,
        }
    }
