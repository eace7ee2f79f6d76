"""Trained document-quality classifier (fasttext-style) for corpus
curation.

The heuristic ``textqa.quality_score`` is a fixed formula; production
pipelines (CCNet, GPT-3's WebText filter) instead TRAIN a cheap linear
classifier over bag-of-words features and filter by predicted quality.
This module reproduces that shape Spark-natively:

* features = hashed token counts (``HashingTF`` — no vocabulary build,
  no driver-side dictionary broadcast: the feature space is a fixed
  2^18 hash range, so training scales to any corpus),
* model = ``LogisticRegression`` (Spark ML distributed L-BFGS),
* labels = caller-provided, or WEAK labels bootstrapped from the
  heuristic score's extremes (top tercile positive, bottom tercile
  negative, middle dropped — standard weak supervision).

Scoring is a map-only ``transform`` (hash + dot product per document);
at 100 TB the scorer never shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_FEATURES = 1 << 18

# The Spark twins split on Java-regex \s = [ \t\n\x0B\f\r]; DuckDB's
# RE2 \s OMITS U+000B (vertical tab), so the oracle twins spell the
# Java set explicitly — a '\x0B'-adjacent vocabulary token would
# otherwise count differently per engine (r9 review finding, verified).
_WS_RE2 = r"[ \t\n\x0B\f\r]+"


def weak_quality_labels(
    df: DataFrame,
    id_col: str,
    text_col: str,
    low_q: float = 1 / 3,
    high_q: float = 2 / 3,
) -> DataFrame:
    """Bootstrap binary labels from the heuristic quality score:
    documents above the ``high_q`` quantile → 1, below ``low_q`` → 0,
    the ambiguous middle band is dropped. One pass for the scores, one
    tiny 2-value quantile aggregate, one map-only filter."""
    from datalakerulegeneration_spark.ops.textqa import quality_col

    # quality folds into the ONE scan (quality_col is a column
    # expression) — a join against quality_score would rescan the
    # corpus and shuffle it on id for a self-join
    scored = df.select(
        F.col(id_col), F.col(text_col), quality_col(text_col).alias("quality")
    )
    lo, hi = scored.approxQuantile("quality", [low_q, high_q], 0.001)
    return (
        scored.where((F.col("quality") <= lo) | (F.col("quality") >= hi))
        .select(
            F.col(id_col),
            F.col(text_col),
            F.when(F.col("quality") >= hi, 1.0).otherwise(0.0).alias("label"),
        )
    )


def train_quality_classifier(
    labeled: DataFrame,
    text_col: str,
    label_col: str = "label",
    reg_param: float = 1e-4,
):
    """Fit the tokenize → hash → logistic-regression pipeline on a
    labeled frame; returns the fitted ``PipelineModel``. Feature
    hashing keeps the model a fixed-size vector (no vocabulary state),
    so the fitted model broadcasts to scorers at any corpus size."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import HashingTF, RegexTokenizer

    tok = RegexTokenizer(
        inputCol=text_col, outputCol="__toks", pattern=r"\s+", toLowercase=True
    )
    tf = HashingTF(inputCol="__toks", outputCol="__feats", numFeatures=N_FEATURES)
    lr = LogisticRegression(
        featuresCol="__feats",
        labelCol=label_col,
        regParam=reg_param,
        maxIter=50,
    )
    return Pipeline(stages=[tok, tf, lr]).fit(
        labeled.where(F.col(text_col).isNotNull())
    )


def score_quality(model, df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Score documents with a fitted classifier: ``(id, prob_quality,
    quality_pred)``. Map-only (hash + dot product inside the JVM) —
    the filtering pass of a trained-curation pipeline."""
    from pyspark.ml.functions import vector_to_array

    out = model.transform(df.where(F.col(text_col).isNotNull()))
    return out.select(
        F.col(id_col).alias("id"),
        vector_to_array("probability")[1].alias("prob_quality"),
        F.col("prediction").alias("quality_pred"),
    )


def load_frozen_weights(path: str | None = None) -> tuple[dict[str, float], float]:
    """Load the vendored frozen quality weights (``(weights, bias)``)
    — the pytest-pinned projection of a real
    :func:`train_quality_classifier` fit onto a compact vocabulary
    (``tools/gen_frozen_fixtures.py``; one occurrence of token t moves
    the logistic margin by exactly ``coef[hash(t)]``, so the table IS
    the model restricted to its vocabulary — the fasttext convention
    of shipping word→weight tables)."""
    import json
    import os

    if path is None:
        path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "resources",
            "fixture_quality_weights.json",
        )
    with open(path) as fh:
        data = json.load(fh)
    weights = {str(t): float(w) for t, w in data["weights"].items()}
    for t in weights:
        if not t or any(c in t for c in "'\"\\`") or t != t.lower():
            raise ValueError(f"frozen vocab tokens must be lowercase and quote-free: {t!r}")
    return weights, float(data["bias"])


def frozen_linear_score(
    df: DataFrame,
    id_col: str,
    text_col: str,
    weights: dict[str, float] | None = None,
    bias: float | None = None,
) -> DataFrame:
    """Score documents under a FROZEN linear bag-of-words model —
    the serving path of the trained classifier (the bpe_learn /
    bpe_encode split of r8, applied to quality): TRAINING is iterative
    ML (:func:`train_and_score`, pytest-covered), but scoring under
    frozen weights is pure expression arithmetic, exact in both
    engines. ``margin = bias + Σ w_t · count_t(doc)`` is a fixed-order
    chain of literal-weight products over per-token counts, so Spark
    and DuckDB compute BIT-IDENTICAL doubles (same literals, same IEEE
    ops, same association order); only the sigmoid is rounded (libm
    exp may differ in the last ulp). Returns ``(id, quality_score,
    prob_quality, quality_pred)``; NULL-text docs are absent (the
    :func:`score_quality` convention).

    Scale shape: map-only — one split per document, one counting fold
    per vocabulary term, no shuffle, no UDF; at 100 TB the scorer
    rides the scan exactly like the heuristic ``quality_col``."""
    if weights is None or bias is None:
        w2, b2 = load_frozen_weights()
        weights = w2 if weights is None else weights
        bias = b2 if bias is None else bias
    toks = F.split(F.lower(F.col(text_col)), r"\s+")
    d = df.where(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("id"), toks.alias("_qtoks")
    )
    def _count(tok: str):
        return F.size(F.filter(F.col("_qtoks"), lambda x: x == F.lit(tok)))

    score = F.lit(float(bias))
    for t in sorted(weights):
        score = score + F.lit(float(weights[t])) * _count(t).cast("double")
    return d.select(
        "id",
        F.round(score, 6).alias("quality_score"),
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-score)), 6).alias("prob_quality"),
        (score > F.lit(0.0)).cast("int").alias("quality_pred"),
    )


def frozen_linear_score_sql(
    table: str,
    id_col: str,
    text_col: str,
    weights: dict[str, float] | None = None,
    bias: float | None = None,
) -> str:
    """Exact DuckDB oracle for :func:`frozen_linear_score` — the same
    fixed-order chain over the same literals."""
    if weights is None or bias is None:
        w2, b2 = load_frozen_weights()
        weights = w2 if weights is None else weights
        bias = b2 if bias is None else bias
    terms = [f"CAST('{float(bias)!r}' AS DOUBLE)"]
    for t in sorted(weights):
        terms.append(
            f"CAST('{weights[t]!r}' AS DOUBLE) * CAST(len(list_filter(_qtoks, x -> x = '{t}')) AS DOUBLE)"
        )
    score = " + ".join(terms)
    return f"""
WITH toks AS (
  SELECT {id_col} AS id,
         string_split_regex(lower({text_col}), '{_WS_RE2}') AS _qtoks
  FROM {table} WHERE {text_col} IS NOT NULL
),
scored AS (SELECT id, {score} AS _score FROM toks)
SELECT id,
       round(_score, 6) AS quality_score,
       round(1.0 / (1.0 + exp(-_score)), 6) AS prob_quality,
       CAST(_score > 0.0 AS INTEGER) AS quality_pred
FROM scored
"""


def frozen_prob_col(text_col: str, weights: dict[str, float] | None = None, bias: float | None = None):
    """The frozen classifier's quality probability as ONE Column over
    ``text_col`` — the plug for ``curate_corpus(quality_fn=...)``:
    the same fixed-order literal chain as :func:`frozen_linear_score`
    (bit-identical margins), sigmoid rounded to 6. The split
    subexpression repeats per vocabulary term in the expression tree;
    whole-stage codegen's subexpression elimination computes it once
    per row, so the scorer still rides the scan map-side. NULL text →
    NULL probability (fails any >= threshold — the curate stage-1
    contract for unscorable rows)."""
    if weights is None or bias is None:
        w2, b2 = load_frozen_weights()
        weights = w2 if weights is None else weights
        bias = b2 if bias is None else bias
    toks = F.split(F.lower(F.col(text_col)), r"\s+")

    def _count(tok: str):
        return F.size(F.filter(toks, lambda x: x == F.lit(tok)))

    score = F.lit(float(bias))
    for t in sorted(weights):
        score = score + F.lit(float(weights[t])) * _count(t).cast("double")
    return F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-score)), 6)


def frozen_prob_sql_expr(text_col: str, weights: dict[str, float] | None = None, bias: float | None = None) -> str:
    """DuckDB twin of :func:`frozen_prob_col` as an inline expression
    (for composing into larger oracles, e.g. curate_corpus_sql's d0)."""
    if weights is None or bias is None:
        w2, b2 = load_frozen_weights()
        weights = w2 if weights is None else weights
        bias = b2 if bias is None else bias
    toks = f"string_split_regex(lower({text_col}), '{_WS_RE2}')"
    terms = [f"CAST('{float(bias)!r}' AS DOUBLE)"]
    for t in sorted(weights):
        terms.append(
            f"CAST('{weights[t]!r}' AS DOUBLE) * CAST(len(list_filter({toks}, x -> x = '{t}')) AS DOUBLE)"
        )
    chain = " + ".join(terms)
    return f"round(1.0 / (1.0 + exp(-({chain}))), 6)"


def train_and_score(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """End-to-end weak-label bootstrap: label from the heuristic's
    extremes, train, score the WHOLE corpus (including the ambiguous
    middle band the labeler dropped). The L-BFGS fit is deterministic
    for a given data partitioning; no seed exists to thread."""
    labeled = weak_quality_labels(df, id_col, text_col)
    model = train_quality_classifier(labeled, text_col)
    return score_quality(model, df, id_col, text_col)


def load_frozen_ref_dist(path: str | None = None) -> dict:
    """Load the vendored freeze-time score distribution of the frozen
    quality scorer (``tools/gen_frozen_fixtures.py`` qualref section)
    — the PSI reference for the serving-split refit trigger."""
    import json
    import os

    if path is None:
        path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "resources",
            "fixture_quality_ref_dist.json",
        )
    with open(path) as fh:
        ref = json.load(fh)
    if not (ref["hi"] > ref["lo"]):
        raise ValueError("frozen ref dist: hi must exceed lo")
    if len(ref["ref_counts"]) < 2 or sum(ref["ref_counts"]) <= 0:
        raise ValueError("frozen ref dist: need >= 2 bins with mass")
    return ref
