"""Golden matcher run on the reference's OWN Quintet_Match benchmark
(r11 — r10 verdict item 2).

The reference's method_2 schema-matching benchmark is
``datasets/Quintet_Match/{beers,flights,hospital,rayyan}_{1,2}`` driven
by ``method_2/pipleline_2.py`` (ColumnMatcher :153-206, BatchMatcher +
Hungarian global assignment :369-477, BatchRuleApplier :507-594).

**Data adjudication:** every ``<ds>_1`` and ``<ds>_2`` file is
byte-identical to the corresponding ``datasets/Quintet/<ds>`` pair
(verified with ``cmp`` across all 16 files) — the benchmark matches a
table against an identical copy of itself, so the GROUND-TRUTH
assignment is the identity mapping and no new fixtures are needed: the
vendored ``tests/fixtures/quintet`` CSVs are the benchmark inputs.

The engine's matcher is the documented profile-based re-expression of
the reference's five-component scorer (matching/similarity.py — no
sklearn TF-IDF; name trigram Jaccard + profile-stat components): the
golden run certifies it the way r10 certified the pipeline —

* per-pair score frames over the REAL data, oracle-checked end-to-end
  (raw CSV → coerced wide profiles → pair arithmetic in BOTH engines);
* Hungarian assignment recovers the identity mapping on all four real
  pairs (pytest-pinned per pair);
* bound-rule execution round-trips: rules bound from ``<ds>_1``
  columns onto their matched ``<ds>_2`` columns reproduce the source
  table's own violation counts (same bytes ⇒ same violations).

Scale: profile frames are #columns rows; the crossJoin is the
sanctioned #cols² matcher grain; raw data is scanned once per side by
the shared wide-agg profiler.
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

MATCH_DATASETS = ("beers", "flights", "hospital", "rayyan")


def _pair_path(ds: str) -> str:
    return os.path.join(quintet_fixture_dir(), ds, "dirty.csv")


def match_pair_profiles(
    spark: SparkSession, ds: str
) -> tuple[DataFrame, DataFrame]:
    """Wide coerced profiles of ``<ds>_1`` and ``<ds>_2`` (both the
    vendored dirty CSV — see the data adjudication above)."""
    from datalakerulegeneration_spark.profiling import profile_table

    df = read_csv_all_string(spark, _pair_path(ds))
    src = profile_table(
        spark, df, f"{ds}_1", with_tokens=False, coerce_numeric=True
    )
    # The benchmark's two sides are byte-identical files (module
    # docstring adjudication), so every data-derived stat of <ds>_2
    # equals <ds>_1's — only the table label and unique_id differ.
    # Relabel the one profile instead of running the identical profile
    # job twice (r12 optimization: the two eager profile passes were
    # ~6.5 s of the query's wall; guide §1.2 — don't compute things
    # you already have).
    tgt = src.withColumn("table", F.lit(f"{ds}_2")).withColumn(
        "unique_id", F.concat(F.lit(f"{ds}_2::"), F.col("column"))
    )
    return src, tgt


def match_pair_scores(spark: SparkSession, ds: str) -> DataFrame:
    """J5/M5 on the real benchmark pair: every ``<ds>_1`` column scored
    against every ``<ds>_2`` column (#cols² rows)."""
    from datalakerulegeneration_spark.matching.similarity import (
        column_match_scores,
    )

    src, tgt = match_pair_profiles(spark, ds)
    out = column_match_scores(src, tgt)
    return out.select(
        "src_id",
        "tgt_id",
        *[
            F.round(F.col(c), 6).alias(c)
            for c in ("name_sim", "struct_sim", "dist_sim", "content_sim", "score")
        ],
    ).orderBy("src_id", "tgt_id")


def match_pair_scores_sql(ds: str) -> str:
    """DuckDB twin: the S1 CSV ingest as CTEs named ``<ds>_1``/
    ``<ds>_2`` feeding the shared column_match_scores_sql builder with
    every column in COERCED kind (all-string ingest + numeric family
    over try_cast — the profile convention the golden profile queries
    pinned)."""
    from datalakerulegeneration_spark.matching.similarity import (
        column_match_scores_sql,
    )
    from datalakerulegeneration_spark.profiling import stats as S

    path = _pair_path(ds)
    kinds = [(c, S.COERCED) for c in csv_header(path)]
    inner = column_match_scores_sql(f"{ds}_1", kinds, f"{ds}_2", kinds)
    src = s1_ingest_sql(path)
    head, rest = inner.split("WITH ", 1)
    return (
        f"{head}WITH {ds}_1 AS ({src}),\n{ds}_2 AS ({src}),\n{rest}"
        + "\nORDER BY src_id, tgt_id"
    )


def golden_assignments(spark: SparkSession) -> dict[str, list[tuple[str, str, float]]]:
    """Hungarian 1-1 assignment per pair (J6) — the frame the parity
    test pins against the identity ground truth."""
    from datalakerulegeneration_spark.matching.binding import global_assignment

    out = {}
    for ds in MATCH_DATASETS:
        a = global_assignment(match_pair_scores(spark, ds))
        out[ds] = sorted(
            (r["src_id"], r["tgt_id"], r["score"]) for r in a.collect()
        )
    return out


def golden_bound_run(
    spark: SparkSession, ds: str = "beers"
) -> tuple[DataFrame, DataFrame]:
    """J7/A8 on the real pair: legacy rules derived for the SOURCE
    columns, bound via the assignment onto the matched TARGET columns,
    executed by the shared engine → (violations, runs). Identity data
    ⇒ the run report must equal the source table's own counts (the
    parity test checks beers against its published 17,416-cell error
    artifact counts)."""
    from datalakerulegeneration_spark.evaluation.golden import (
        beers_rules_map,
        pandas_na_normalized,
    )
    from datalakerulegeneration_spark.matching.binding import (
        apply_bound_rules,
        bind_rules,
        global_assignment,
    )
    from datalakerulegeneration_spark.rules.spec import parse_legacy_rule

    assignment = global_assignment(match_pair_scores(spark, ds))
    df = pandas_na_normalized(read_csv_all_string(spark, _pair_path(ds)))
    legacy = beers_rules_map(df.columns)
    rules_by_src = {
        f"{ds}_1::{col}": [parse_legacy_rule(col, t) for t in rtexts]
        for col, rtexts in legacy.items()
    }
    bound = bind_rules(assignment, rules_by_src)
    # the published artifact keeps all-rows-flagged rules (no R18
    # suppressor): the beers NUMERIC rules flag whole text columns
    return apply_bound_rules(
        spark, {f"{ds}_2": df}, bound, suppress_full_column=False
    )
