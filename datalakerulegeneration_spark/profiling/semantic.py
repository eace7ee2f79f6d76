"""P19 semantic-domain typing with a pluggable model seam.

The reference infers a semantic type per column with the pre-trained
Doduo column-type model (profiling/profiler.py:129-131,520). No model
ships here (SURVEY §7.3.1 sanctions a deterministic substitute), but
the SEAM the reference implies is real: pass ``model_fn`` and your
model scores each column from a bounded value sample via one
``applyInPandas`` — the same hook shape as two_stage_clustering's
``name_embedding_fn``.

* default (no model): ONE stacked aggregation computes per-column
  match ratios against built-in domain regexes entirely JVM-side —
  scale-independent of column count, no sampling, no Python.
* ``model_fn(column_name, values) -> (domain, confidence)``: each
  column's deterministic ``n_sample``-value sample (hash-ordered, so
  re-runs see the same rows) goes through Arrow to the model once.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# value-shape domains decidable without a model; ratios over non-null cells
DOMAIN_PATTERNS: dict[str, str] = {
    "email": r"^[^@\s]+@[^@\s]+\.[^@\s]+$",
    "url": r"^(https?://)[^\s]+$",
    "date": r"^\d{4}-\d{2}-\d{2}$",
    "time": r"^\d{1,2}:\d{2}(:\d{2})?$",
    "phone": r"^\+?[0-9][0-9 ()-]{6,}$",
    "zipcode": r"^\d{5}(-\d{4})?$",
    "ip": r"^(\d{1,3}\.){3}\d{1,3}$",
    "numeric_id": r"^[0-9]+$",
}
DOMAIN_THRESHOLD = 0.7


def semantic_domains(
    df: DataFrame,
    table: str,
    columns: list[str] | None = None,
    model_fn: Callable[[str, list[str]], tuple[str, float]] | None = None,
    n_sample: int = 100,
) -> DataFrame:
    """Per-column semantic domain: ``(table, column, semantic_domain,
    confidence)``. Default is the deterministic regex heuristic; pass
    ``model_fn`` to plug a real column-type model (Doduo-shaped)."""
    cols = columns or df.columns
    if model_fn is not None:
        return _model_domains(df, table, cols, model_fn, n_sample)

    parts = [f"'{c}', cast(`{c}` as string)" for c in cols]
    melt = df.selectExpr(f"stack({len(parts)}, {', '.join(parts)}) as (col_name, v)")
    ratios = [
        F.avg(F.col("v").rlike(pat).cast("double")).alias(f"r_{dom}")
        for dom, pat in DOMAIN_PATTERNS.items()
    ]
    agg = (
        melt.where(F.col("v").isNotNull() & (F.col("v") != ""))
        .groupBy("col_name")
        .agg(*ratios)
    )
    # argmax over the fixed domain list; ratio ties break toward the
    # MORE SPECIFIC domain (dict order: a date string also matches the
    # phone shape, and must type as date)
    n = len(DOMAIN_PATTERNS)
    best = F.array_max(
        F.array(
            *[
                F.struct(
                    F.coalesce(F.col(f"r_{dom}"), F.lit(0.0)).alias("r"),
                    F.lit(n - i).alias("pri"),
                    F.lit(dom).alias("d"),
                )
                for i, dom in enumerate(DOMAIN_PATTERNS)
            ]
        )
    )
    return agg.select(
        F.lit(table).alias("table"),
        F.col("col_name").alias("column"),
        F.when(best["r"] >= DOMAIN_THRESHOLD, best["d"])
        .otherwise(F.lit("unknown"))
        .alias("semantic_domain"),
        F.round(best["r"], 6).alias("confidence"),
    )


def _model_domains(
    df: DataFrame,
    table: str,
    cols: list[str],
    model_fn: Callable[[str, list[str]], tuple[str, float]],
    n_sample: int,
) -> DataFrame:
    """Model path: bounded deterministic sample per column →
    ``applyInPandas`` (one model call per column per task)."""
    import pandas as pd
    from pyspark.sql import Window

    parts = [f"'{c}', cast(`{c}` as string)" for c in cols]
    melt = df.selectExpr(
        f"stack({len(parts)}, {', '.join(parts)}) as (col_name, v)"
    ).where(F.col("v").isNotNull() & (F.col("v") != ""))
    w = Window.partitionBy("col_name").orderBy(F.md5(F.col("v")), F.col("v"))
    sample = melt.withColumn("__rn", F.row_number().over(w)).where(
        F.col("__rn") <= n_sample
    )

    def score(pdf: pd.DataFrame) -> pd.DataFrame:
        name = pdf["col_name"].iloc[0]
        domain, conf = model_fn(name, list(pdf["v"]))
        return pd.DataFrame(
            {
                "table": [table],
                "column": [name],
                "semantic_domain": [domain],
                "confidence": [round(float(conf), 6)],
            }
        )

    return sample.groupBy("col_name").applyInPandas(
        score,
        schema="table string, column string, semantic_domain string, confidence double",
    )
