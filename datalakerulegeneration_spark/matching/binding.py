"""Global assignment + rule binding + bound-rule execution (J6, J7, A8).

``global_assignment`` collects the (tiny) score matrix and solves 1-1
assignment with the Hungarian algorithm (method_2/pipleline_2.py:
428-477); ``bind_rules`` joins assignments × per-source-column rules
(pipleline_2.py:507-531); ``apply_bound_rules`` reuses the RuleEngine
so matched targets are validated in one batched pass and summarized by
violation rate (pipleline_2.py:558-594).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datalakerulegeneration_spark.matching.hungarian import hungarian
from datalakerulegeneration_spark.rules.engine import Binding, RuleEngine
from datalakerulegeneration_spark.rules.spec import Rule


def global_assignment(scores: DataFrame, min_score: float = 0.0) -> DataFrame:
    """(src_id, tgt_id, score) — optimal 1-1 assignment maximizing the
    total score (cost = −score). Assignments under ``min_score`` drop."""
    rows = scores.select("src_id", "tgt_id", "score").collect()
    srcs = sorted({r["src_id"] for r in rows})
    tgts = sorted({r["tgt_id"] for r in rows})
    si = {v: i for i, v in enumerate(srcs)}
    ti = {v: i for i, v in enumerate(tgts)}
    mat = np.zeros((len(srcs), len(tgts)))
    for r in rows:
        mat[si[r["src_id"]], ti[r["tgt_id"]]] = r["score"]
    ri, ci = hungarian(-mat)
    out = [
        (srcs[a], tgts[b], float(mat[a, b]))
        for a, b in zip(ri, ci)
        if mat[a, b] >= min_score
    ]
    return scores.sparkSession.createDataFrame(
        out or [], "src_id string, tgt_id string, score double"
    )


def bind_rules(
    assignment: DataFrame, rules_by_src: dict[str, list[Rule]]
) -> list[tuple[str, str, Rule, float]]:
    """[(tgt_table, tgt_column, rule, match_score)] — rules attached to
    the target columns their source columns matched."""
    out = []
    for r in assignment.collect():
        tgt_table, tgt_col = r["tgt_id"].split("::", 1)
        for rule in rules_by_src.get(r["src_id"], []):
            out.append((tgt_table, tgt_col, rule, r["score"]))
    return out


def apply_bound_rules(
    spark: SparkSession,
    tables: dict[str, DataFrame],
    bound: list[tuple[str, str, Rule, float]],
    row_id_cols: dict[str, str] | None = None,
    suppress_full_column: bool = True,
    **engine_kwargs,
) -> tuple[DataFrame, DataFrame]:
    """Execute bound rules per target table → (violations, runs).

    ``runs`` summarizes each binding with its violation count and rate,
    sorted by rate (the reference's explainable run report).
    ``suppress_full_column=False`` keeps rules that flag EVERY row (the
    R18 suppressor off) — the reference's published artifacts keep
    them (a NUMERIC rule on a text column flags the whole column)."""
    row_id_cols = row_id_cols or {}
    eng = RuleEngine(spark, **engine_kwargs)
    all_v = None
    for table, df in tables.items():
        bindings = [
            Binding(col, rule) for (t, col, rule, _) in bound if t == table
        ]
        if not bindings:
            continue
        v = eng.detect(
            df,
            table,
            bindings,
            row_id_col=row_id_cols.get(table),
            suppress_full_column=suppress_full_column,
        )
        all_v = v if all_v is None else all_v.unionByName(v)
    if all_v is None:
        all_v = spark.createDataFrame(
            [], "table string, column string, row_id string, rule string, value string"
        )
    totals = {t: df.count() for t, df in tables.items()}
    totals_df = spark.createDataFrame(list(totals.items()), "table string, n_rows long")
    runs = (
        all_v.groupBy("table", "column", "rule")
        .agg(F.count(F.lit(1)).alias("n_violations"))
        .join(F.broadcast(totals_df), "table")
        .withColumn(
            "violation_rate",
            F.round(F.col("n_violations").cast("double") / F.col("n_rows"), 6),
        )
        .orderBy(F.desc("violation_rate"), F.asc("table"), F.asc("column"), F.asc("rule"))
    )
    return all_v, runs
