"""String functions (F2, F3, F5).

All builtin-expression based; the abbreviation map mirrors the
reference's city normalizer (rules/evaluation.py:51-61, 106-125).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ABBREVIATIONS = {
    r"\bst\.?\b": "saint",
    r"\bmt\.?\b": "mount",
    r"\bft\.?\b": "fort",
}


def normalize_value(col: Column) -> Column:
    """Whitespace collapse + trim (reference utils/read_data.py:7-15,
    minus the HTML unescape which lives in the ingest reader)."""
    return F.trim(F.regexp_replace(col.cast("string"), r"\s+", " "))


def normalize_abbreviations(col: Column) -> Column:
    """st→saint, mt→mount, ft→fort + case-fold + dot-strip
    (rules/evaluation.py:51-61)."""
    out = F.lower(col.cast("string"))
    for pat, repl in ABBREVIATIONS.items():
        out = F.regexp_replace(out, pat, repl)
    return F.trim(F.regexp_replace(out, r"\.", ""))


def tokenize_column_name(name: str, strip_fn=None) -> list[str]:
    """F4: column-name tokenization (reference utils.py:27-41) —
    underscores/punctuation → spaces, camelCase split, alpha-only
    lowercase tokens.

    The reference then strips likely prefixes with a SentenceTransformer
    similarity test (utils.py:13-25). Deterministic substitute: drop
    bare single-letter tokens (the TPC-H ``o_``/``l_`` style prefixes);
    pass ``strip_fn(token) -> token`` to plug the model-based stripper.
    """
    import re

    s = re.sub(r"[_\W]+", " ", name)
    s = re.sub(r"([a-z])([A-Z])", r"\1 \2", s)
    tokens = [t.lower() for t in re.findall(r"[a-zA-Z]+", s)]
    if strip_fn is not None:
        return [strip_fn(t) for t in tokens]
    kept = [t for t in tokens if len(t) > 1]
    return kept or tokens


def levenshtein_conflicts(
    df: DataFrame,
    col: str,
    max_distance: int = 2,
    max_values: int = 10000,
) -> DataFrame:
    """Near-identical value pairs (probable typos): distinct values
    whose edit distance ≤ max_distance (reference
    profile_similarity.py:67-74 flags typo conflicts ≤ 2).

    Self-join of the DISTINCT value set (bounded by ``max_values`` as a
    guard — at scale, pre-block by length band and first character so
    the join is not quadratic; both blocking keys are implied by the
    distance bound: |len(a)−len(b)| ≤ d).
    """
    vals = (
        df.select(F.col(col).cast("string").alias("v"))
        .where(F.col("v").isNotNull() & (F.col("v") != ""))
        .distinct()
        .limit(max_values)
        .withColumn("l", F.length("v"))
    )
    a = vals.select(F.col("v").alias("v_a"), F.col("l").alias("l_a"))
    b = vals.select(F.col("v").alias("v_b"), F.col("l").alias("l_b"))
    return (
        a.join(
            b,
            (F.col("v_a") < F.col("v_b"))
            & (F.abs(F.col("l_a") - F.col("l_b")) <= max_distance),
        )
        .withColumn("distance", F.levenshtein("v_a", "v_b"))
        .where(F.col("distance") <= max_distance)
        .select("v_a", "v_b", "distance")
    )
