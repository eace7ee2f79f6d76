"""Text analysis operators for training-data pipelines.

Language-ID (stopword/charset heuristic), quality scoring, token
counting, and document fingerprinting — all as builtin-function
expressions over the ``documents`` table, each with an exactly-matching
DuckDB oracle builder.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Tiny deterministic stopword marker sets per language — heuristic
# language ID (the reference has no lang-id; this is the pipeline
# extension). Marker words chosen to be disjoint across languages.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is", "with", "for", "that"),
    "es": ("el", "la", "los", "las", "es", "y", "de", "que", "con", "por"),
    "de": ("der", "die", "das", "und", "ist", "mit", "für", "nicht", "ein"),
    "fr": ("le", "la", "les", "et", "est", "avec", "pour", "que", "dans", "un"),
}
CJK_RE = r"[一-鿿]"


def token_count(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Whitespace token count + a BPE-ish subword estimate.

    The subword estimate counts runs of letters/digits/punctuation
    (a deterministic proxy for BPE token counts, documented as such).
    """
    toks = F.array_remove(F.split(F.lower(F.col(text_col)), r"\s+"), "")
    # RE2-safe subword proxy: alnum runs count 1, each other
    # non-space char counts 1 (no lookarounds — DuckDB is RE2 too)
    bpe_ish = F.size(F.regexp_extract_all(F.col(text_col), F.lit(r"[a-zA-Z0-9]+|[^a-zA-Z0-9\s]"), F.lit(0)))
    return df.select(
        F.col(id_col).alias("id"),
        F.size(toks).cast("bigint").alias("n_tokens"),
        bpe_ish.cast("bigint").alias("n_subwords"),
    )


def token_count_sql(table: str, id_col: str, text_col: str) -> str:
    return f"""
SELECT {id_col} AS id,
       len(list_filter(string_split_regex(lower({text_col}), '\\s+'), t -> t <> '')) AS n_tokens,
       len(regexp_extract_all({text_col}, '[a-zA-Z0-9]+|[^a-zA-Z0-9\\s]')) AS n_subwords
FROM {table}
"""


def language_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Heuristic language ID: CJK char share → 'zh'; else the language
    whose marker-stopword share of tokens is highest (ties → language
    name ascending); no markers at all → 'und'."""
    toks = F.array_remove(F.split(F.lower(F.col(text_col)), r"\s+"), "")
    d = df.select(F.col(id_col).alias("id"), F.col(text_col).alias("t"), toks.alias("toks"))
    cjk_chars = F.length(F.regexp_replace("t", r"[^一-鿿]", ""))
    scores = [
        (
            lang,
            F.size(F.array_intersect("toks", F.array(*[F.lit(w) for w in words])))
            .cast("double")
            / F.nullif(F.size("toks").cast("double"), F.lit(0.0)),
        )
        for lang, words in sorted(LANG_MARKERS.items())
    ]
    best = F.lit("und")
    best_score = F.lit(0.0)
    # fixed evaluation order → deterministic tie-break by language name
    for lang, sc in scores:
        cond = sc > best_score
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_score = F.when(cond, sc).otherwise(best_score)
    lang_col = F.when(
        cjk_chars.cast("double") / F.nullif(F.length("t").cast("double"), F.lit(0.0)) > 0.2,
        F.lit("zh"),
    ).otherwise(best)
    return d.select("id", lang_col.alias("lang_pred"))


def language_id_sql(table: str, id_col: str, text_col: str) -> str:
    """DuckDB twin of :func:`language_id`.

    The Python loop updates best only on STRICTLY greater score, so the
    earliest language (sorted order: de, en, es, fr) wins ties; the CASE
    below replicates that with >= comparisons on earlier languages.
    """
    langs = sorted(LANG_MARKERS)
    score_cols = []
    for lang in langs:
        markers = ", ".join(f"'{w}'" for w in LANG_MARKERS[lang])
        score_cols.append(
            f"CAST(len(list_intersect(toks, [{markers}])) AS DOUBLE)"
            f" / nullif(CAST(len(toks) AS DOUBLE), 0.0) AS s_{lang}"
        )
    cases = []
    for i, lang in enumerate(langs):
        conds = [f"s_{lang} >= s_{other}" for other in langs[i + 1 :]]
        conds.append(f"s_{lang} > 0")
        cases.append(f"WHEN {' AND '.join(conds)} THEN '{lang}'")
    case_sql = "\n      ".join(cases)
    return f"""
WITH t AS (
  SELECT {id_col} AS id, {text_col} AS txt,
         list_filter(string_split_regex(lower({text_col}), '\\s+'), x -> x <> '') AS toks
  FROM {table}
), s AS (
  SELECT id, txt, toks,
    {", ".join(score_cols)}
  FROM t
)
SELECT id,
  CASE WHEN CAST(length(regexp_replace(txt, '[^一-鿿]', '', 'g')) AS DOUBLE)
            / nullif(CAST(length(txt) AS DOUBLE), 0.0) > 0.2 THEN 'zh'
  ELSE (CASE
      {case_sql}
      ELSE 'und' END)
  END AS lang_pred
FROM s
"""


def quality_score(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Document quality heuristics: length band, alpha ratio, stopword
    presence, mean word length band → score in [0, 1], rounded to 6 dp.

    All components are exact integer ratios, so the score hash-matches
    across engines.
    """
    t = F.col(text_col)
    toks = F.array_remove(F.split(F.lower(t), r"\s+"), "")
    n_tok = F.size(toks).cast("double")
    n_chars = F.length(t).cast("double")
    alpha_ratio = (
        F.length(F.regexp_replace(t, r"[^A-Za-z]", "")).cast("double")
        / F.nullif(n_chars, F.lit(0.0))
    )
    mean_wlen = (
        (n_chars - (n_tok - 1)) / F.nullif(n_tok, F.lit(0.0))
    )
    len_ok = F.when((n_tok >= 10) & (n_tok <= 100000), 1.0).otherwise(0.0)
    wlen_ok = F.when((mean_wlen >= 2.0) & (mean_wlen <= 12.0), 1.0).otherwise(0.0)
    score = F.round(
        0.4 * F.coalesce(alpha_ratio, F.lit(0.0)) + 0.3 * len_ok + 0.3 * wlen_ok, 6
    )
    return df.select(F.col(id_col).alias("id"), score.alias("quality"))


def quality_score_sql(table: str, id_col: str, text_col: str) -> str:
    toks = f"list_filter(string_split_regex(lower({text_col}), '\\s+'), x -> x <> '')"
    n_tok = f"CAST(len({toks}) AS DOUBLE)"
    n_chars = f"CAST(length({text_col}) AS DOUBLE)"
    alpha = (
        f"CAST(length(regexp_replace({text_col}, '[^A-Za-z]', '', 'g')) AS DOUBLE)"
        f" / nullif({n_chars}, 0.0)"
    )
    mean_wlen = f"({n_chars} - ({n_tok} - 1)) / nullif({n_tok}, 0.0)"
    return f"""
SELECT {id_col} AS id,
  round(0.4 * COALESCE({alpha}, 0.0)
      + 0.3 * (CASE WHEN {n_tok} >= 10 AND {n_tok} <= 100000 THEN 1.0 ELSE 0.0 END)
      + 0.3 * (CASE WHEN {mean_wlen} >= 2.0 AND {mean_wlen} <= 12.0 THEN 1.0 ELSE 0.0 END),
    6) AS quality
FROM {table}
"""


def fingerprint(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Deterministic document fingerprint: md5 of the
    whitespace-normalized lowercase text (portable across engines)."""
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    return df.select(
        F.col(id_col).alias("id"), F.md5(norm).alias("fingerprint")
    )


def fingerprint_sql(table: str, id_col: str, text_col: str) -> str:
    return f"""
SELECT {id_col} AS id,
       md5(trim(regexp_replace(lower({text_col}), '\\s+', ' ', 'g'))) AS fingerprint
FROM {table}
"""


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    size: int = 200,
    overlap: int = 50,
) -> DataFrame:
    """Split documents into fixed-width overlapping character chunks —
    the standard context-window preparation step for training corpora.

    Chunk ``i`` covers characters ``[i*step+1, i*step+size]`` with
    ``step = size - overlap``; a document of length L yields
    ``floor((L-1)/step) + 1`` chunks (pure integer arithmetic, so the
    DuckDB oracle is bit-identical). Runs as one ``posexplode`` over a
    generated substring array: no shuffle at all until a consumer
    aggregates — at 100 TB this is a map-only stage whose output
    partitioning follows the input files.
    """
    if overlap >= size:
        raise ValueError("overlap must be smaller than size")
    step = size - overlap
    chunks = (
        f"transform(sequence(0, int(floor((greatest(length({text_col}), 1) - 1) / {step}))),"
        f" i -> substring({text_col}, i * {step} + 1, {size}))"
    )
    return (
        df.where(F.col(text_col).isNotNull())
        .select(F.col(id_col), F.posexplode(F.expr(chunks)).alias("chunk_idx", "chunk"))
        .select(
            F.col(id_col),
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            "chunk",
            F.length("chunk").cast("long").alias("chunk_len"),
        )
    )


def chunk_sql(
    table: str, id_col: str, text_col: str, size: int = 200, overlap: int = 50
) -> str:
    """DuckDB oracle for :func:`chunk_documents` (same integer chunk
    arithmetic via generate_series)."""
    step = size - overlap
    # list-returning generate_series + unnest: the table-function form
    # cannot take lateral column arguments in DuckDB
    return f"""
WITH base AS (
  SELECT {id_col}, {text_col},
         unnest(generate_series(0, CAST(floor((greatest(length({text_col}), 1) - 1) / {step}) AS BIGINT))) AS i
  FROM {table}
  WHERE {text_col} IS NOT NULL
)
SELECT {id_col},
       i AS chunk_idx,
       substr({text_col}, CAST(i * {step} + 1 AS BIGINT), {size}) AS chunk,
       CAST(length(substr({text_col}, CAST(i * {step} + 1 AS BIGINT), {size})) AS BIGINT) AS chunk_len
FROM base
"""


def quality_filter_by_group(
    df: DataFrame,
    id_col: str,
    text_col: str,
    group_col: str,
    keep_fraction: float = 0.5,
) -> DataFrame:
    """Corpus curation: keep the top ``keep_fraction`` of documents per
    group (e.g. per language) by quality score — cumulative
    distribution via a ranked window inside each group, one shuffle
    keyed by the group. Ties break on id so the kept set is exactly
    reproducible; percent_rank is an exact small-integer ratio, so the
    cut is engine-portable.
    """
    from pyspark.sql import Window

    q = quality_score(df, id_col, text_col)
    scored = df.select(F.col(id_col), F.col(group_col)).join(
        q, df[id_col] == q["id"]
    ).select(F.col(id_col), F.col(group_col), F.col("quality"))
    w = Window.partitionBy(group_col).orderBy(F.desc("quality"), F.asc(id_col))
    return (
        scored.withColumn("pr", F.percent_rank().over(w))
        .where(F.col("pr") <= keep_fraction)
        .select(F.col(id_col), F.col(group_col), "quality", F.col("pr").alias("quality_rank"))
    )
