"""Column profiler: one wide aggregation per table (P1-P20).

The reference profiles each table with per-cell Python loops
(profiling/profiler.py:169-357, 470-648). Here the same ~40 statistics
are computed as three declarative Spark plans per table:

1. **scalar pass** — a single wide ``agg`` over the table: every
   (column × stat) pair is one aggregate expression → one scan, one
   result row, map-side partial aggregation, no shuffle of raw data.
2. **value pass** — the table unpivoted to ``(col_name, value)`` cell
   grain (2 narrow columns only) for modal value / dominant pattern /
   first-digit (Benford) / equi-width & equi-depth bins: one shuffle
   keyed by (column, value).
3. **token pass** — tokens exploded from string columns for word-class
   counts and top-k keywords: one shuffle keyed by (column, token).

The per-column result set is tiny (#columns rows) by design, so final
assembly collects to the driver and re-creates a ``profiles``
DataFrame — the same boundary the reference's pickled profile dicts
have, but queryable.

At 100 TB: the scalar pass stays single-scan; passes 2-3 shuffle only
projected narrow columns; set ``exact=False`` to switch distinct counts
to ``approx_count_distinct`` and quantiles to ``percentile_approx``
(documented tolerance instead of an exact sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Row, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from datalakerulegeneration_spark.profiling import stats as S
from datalakerulegeneration_spark.profiling.patterns import (
    TYPE_THRESHOLD,
    symbolic_pattern,
)

TOP_K_KEYWORDS = 10  # reference profiler.py:33
TOP_K_HISTOGRAM = 10  # reference reds.py:69-71

# Deterministic stop-word list (reference uses NLTK's; we document the
# delta — SURVEY §7.3.4 tokenizer parity note).
STOPWORDS = (
    "a an and are as at be by for from has he in is it its of on or "
    "that the to was were will with this these those they them i you "
    "we our your not no so if then than but"
).split()

_NUMERIC_TYPES = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)


def column_kind(dtype: T.DataType) -> str:
    if isinstance(dtype, _NUMERIC_TYPES):
        return S.NUMERIC
    return S.STRINGY


def _q(c: str) -> str:
    """Backtick-quote a column name for expr()."""
    return f"`{c}`"


def ensure_parallelism(df: DataFrame) -> DataFrame:
    """Spread expression-heavy work across all cores.

    A small parquet file scans as 1-2 partitions, serializing the
    profiler's ~100 expressions per row onto one core. On a real
    cluster the scan already yields many splits and this is a no-op;
    locally the one-off round-robin shuffle is far cheaper than the
    lost parallelism (measured 14s → 2s on 600k-row lineitem).
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


# ---------------------------------------------------------------------------
# Pass 1 — scalar stats (single wide aggregation)
# ---------------------------------------------------------------------------

def scalar_stats_long(
    df: DataFrame, table: str, columns: list[str] | None = None, exact: bool = True
) -> DataFrame:
    """All registry stats for all columns as ``(table, col_name,
    stat_name, stat_value)``.

    Two plans, unioned lazily:

    * **non-distinct stats** — ONE wide aggregation (single scan, one
      result row) unpivoted with ``stack``;
    * **distinct counts** — a melt to (col_name, value) + groupBy with a
      single ``countDistinct`` per group. Putting N ``countDistinct``
      aggregates inside the wide agg would trigger Catalyst's Expand
      (row multiplication × N distinct groups — measured 25× slower on
      600k-row lineitem); the melt keeps it one ordinary shuffle.
      ``unique_ratio`` is derived by joining the two (tiny) results.

    With ``exact=False`` distinct counts use ``approx_count_distinct``
    inside the wide agg instead (no Expand for approx; the 100 TB mode).
    """
    cols = columns or df.columns
    kinds = {f.name: column_kind(f.dataType) for f in df.schema.fields}
    spark = df.sparkSession
    df = ensure_parallelism(df)

    # registry distinct stats are always computed outside the wide agg
    # (melt in exact mode, approx_count_distinct appended below)
    skip = {"distinct_num", "unique_ratio"}
    aggs = []
    for i, c in enumerate(cols):
        for st in S.stats_for_kind(kinds[c]):
            if st.name in skip:
                continue
            aggs.append(st.spark(_q(c)).alias(f"v{i}_{st.name}"))
        if not exact:
            aggs.append(
                F.expr(f"approx_count_distinct({_q(c)})").cast("double").alias(f"v{i}_distinct_num")
            )
    one = df.agg(*aggs)
    parts = []
    for i, c in enumerate(cols):
        for st in S.stats_for_kind(kinds[c]):
            if st.name in skip:
                continue
            parts.append(f"'{c}', '{st.name}', `v{i}_{st.name}`")
        if not exact:
            parts.append(f"'{c}', 'distinct_num', `v{i}_distinct_num`")
    stack_expr = f"stack({len(parts)}, {', '.join(parts)}) as (col_name, stat_name, stat_value)"
    wide_long = one.select(F.lit(table).alias("table"), F.expr(stack_expr))

    if exact:
        # melt (nulls preserved; Java/DuckDB double→string is injective,
        # so string-grain distinct == native distinct). A per-column
        # union of native countDistinct branches was measured SLOWER
        # (10 extra aggregation stage pairs beat the saved string casts)
        # — one melted groupBy keeps it a single shuffle.
        melt_parts = [f"'{c}', CAST({_q(c)} AS STRING)" for c in cols]
        melted = df.select(
            F.expr(
                f"stack({len(melt_parts)}, {', '.join(melt_parts)}) as (col_name, value_str)"
            )
        )
        dist = melted.groupBy("col_name").agg(
            F.countDistinct("value_str").cast("double").alias("dn")
        )
        dist_long = dist.select(
            F.lit(table).alias("table"),
            "col_name",
            F.lit("distinct_num").alias("stat_name"),
            F.col("dn").alias("stat_value"),
        )
        rn = (
            wide_long.where(F.col("stat_name") == "row_num")
            .select("col_name", F.col("stat_value").alias("rn"))
        )
        ur_long = dist.join(F.broadcast(rn), "col_name").select(
            F.lit(table).alias("table"),
            "col_name",
            F.lit("unique_ratio").alias("stat_name"),
            (F.col("dn") / F.nullif(F.col("rn"), F.lit(0.0))).alias("stat_value"),
        )
        return wide_long.unionByName(dist_long).unionByName(ur_long)
    else:
        # approx path also derives unique_ratio from the approx count
        dist = one  # distinct included in the wide agg
        ur_parts = []
        for i, c in enumerate(cols):
            ur_parts.append(
                f"'{c}', 'unique_ratio', `v{i}_distinct_num` / nullif(`v{i}_row_num`, 0.0)"
            )
        ur_expr = (
            f"stack({len(ur_parts)}, {', '.join(ur_parts)})"
            " as (col_name, stat_name, stat_value)"
        )
        ur_long = one.select(F.lit(table).alias("table"), F.expr(ur_expr))
        return wide_long.unionByName(ur_long)


# ---------------------------------------------------------------------------
# Pass 2 — value-grain stats (modal value, pattern, Benford, bins)
# ---------------------------------------------------------------------------

def _melt(df: DataFrame, columns: list[str]) -> DataFrame:
    """Unpivot to ``(col_name, value_str)`` cell grain.

    Only two narrow columns survive the shuffle — scale note: this is
    #cells rows but O(avg value width) bytes per row.
    """
    parts = [f"'{c}', CAST({_q(c)} AS STRING)" for c in columns]
    stack_expr = f"stack({len(columns)}, {', '.join(parts)}) as (col_name, value_str)"
    return df.select(F.expr(stack_expr))


def value_stats(df: DataFrame, table: str, columns: list[str] | None = None) -> DataFrame:
    """Modal value, dominant pattern, Benford first digit, fullest
    equi-width/equi-depth bins — one row per column.

    Ties break deterministically by value ascending (the reference's
    ``Counter.most_common`` is insertion-ordered, i.e. nondeterministic;
    we fix a total order).
    """
    cols = columns or df.columns
    df = ensure_parallelism(df)
    melted = _melt(df, cols).where(F.col("value_str").isNotNull() & (F.col("value_str") != ""))
    melted = melted.withColumn("value_num", F.expr("try_cast(value_str as double)"))

    # modal raw value + frequency (P13) — one shuffle on (col, value)
    vc = melted.groupBy("col_name", "value_str").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("col_name").orderBy(F.desc("cnt"), F.asc("value_str"))
    modal = (
        vc.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= TOP_K_HISTOGRAM)
        .groupBy("col_name")
        .agg(
            F.max(F.when(F.col("rn") == 1, F.col("value_str"))).alias("histogram"),
            F.max(F.when(F.col("rn") == 1, F.col("cnt"))).cast("double").alias("histogram_freq"),
            F.map_from_entries(
                F.sort_array(F.collect_list(F.struct("value_str", F.col("cnt").cast("double"))))
            ).alias("histogram_topk"),
        )
    )

    # dominant symbolic pattern (P17)
    pat = melted.select("col_name", symbolic_pattern(F.col("value_str")).alias("pattern"))
    pc = pat.groupBy("col_name", "pattern").agg(F.count(F.lit(1)).alias("cnt"))
    wp = Window.partitionBy("col_name").orderBy(F.desc("cnt"), F.asc("pattern"))
    dom_pat = (
        pc.withColumn("rn", F.row_number().over(wp))
        .where(F.col("rn") == 1)
        .select("col_name", F.col("pattern").alias("dominant_pattern"))
    )

    # Benford first digit + distribution (P11)
    fd = melted.select(
        "col_name",
        F.substring(F.regexp_replace("value_str", r"[^0-9]", ""), 1, 1).alias("digit"),
    ).where(F.col("digit") != "")
    fdc = fd.groupBy("col_name", "digit").agg(F.count(F.lit(1)).alias("cnt"))
    wd = Window.partitionBy("col_name").orderBy(F.desc("cnt"), F.asc("digit"))
    tot = Window.partitionBy("col_name")
    benford = (
        fdc.withColumn("rn", F.row_number().over(wd))
        .withColumn("share", F.col("cnt").cast("double") / F.sum("cnt").over(tot))
        .groupBy("col_name")
        .agg(
            F.max(F.when(F.col("rn") == 1, F.col("digit"))).alias("first_digit"),
            F.map_from_entries(
                F.sort_array(F.collect_list(F.struct("digit", "share")))
            ).alias("first_digit_distribution"),
        )
    )

    # most_freq_value_ratio over numeric values (P10)
    nvc = (
        melted.where(F.col("value_num").isNotNull())
        .groupBy("col_name", "value_num")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    mfr = nvc.groupBy("col_name").agg(
        (F.max("cnt").cast("double") / F.sum("cnt").cast("double")).alias(
            "most_freq_value_ratio"
        )
    )

    # equi-width fullest bin (P14): bucket on (max-min)/10
    rng = melted.groupBy("col_name").agg(
        F.min("value_num").alias("mn"), F.max("value_num").alias("mx")
    )
    ew = (
        melted.join(F.broadcast(rng), "col_name")
        .where(F.col("value_num").isNotNull() & (F.col("mx") > F.col("mn")))
        .withColumn(
            "bucket",
            F.least(
                F.lit(9),
                F.floor((F.col("value_num") - F.col("mn")) / ((F.col("mx") - F.col("mn")) / 10)),
            ),
        )
        .groupBy("col_name", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    wew = Window.partitionBy("col_name").orderBy(F.desc("cnt"), F.asc("bucket"))
    ew_top = (
        ew.withColumn("rn", F.row_number().over(wew))
        .where(F.col("rn") == 1)
        .select("col_name", F.col("bucket").cast("string").alias("equi_width_bin"))
    )

    # equi-depth fullest bin (P15): ntile(10); at scale switch to
    # percentile_approx edges (no global sort)
    wnt = Window.partitionBy("col_name").orderBy("value_num")
    ed = (
        melted.where(F.col("value_num").isNotNull())
        .withColumn("tile", F.ntile(10).over(wnt))
        .groupBy("col_name", "tile")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    wed = Window.partitionBy("col_name").orderBy(F.desc("cnt"), F.asc("tile"))
    ed_top = (
        ed.withColumn("rn", F.row_number().over(wed))
        .where(F.col("rn") == 1)
        .select("col_name", F.col("tile").cast("string").alias("equi_depth_bin"))
    )

    out = (
        modal.join(dom_pat, "col_name", "full")
        .join(benford, "col_name", "full")
        .join(mfr, "col_name", "full")
        .join(ew_top, "col_name", "full")
        .join(ed_top, "col_name", "full")
        .withColumn("table", F.lit(table))
    )
    return out


# ---------------------------------------------------------------------------
# Pass 3 — token stats (word classes, top keywords)
# ---------------------------------------------------------------------------

def token_stats(df: DataFrame, table: str, columns: list[str] | None = None) -> DataFrame:
    """Word-class counts + top-k keyword map per column (P5, P7).

    Tokenizer: lowercase, split on whitespace runs — documented delta
    from the reference's NLTK ``word_tokenize`` (SURVEY §7.3.4).
    """
    cols = columns or [f.name for f in df.schema.fields if isinstance(f.dataType, T.StringType)]
    if not cols:
        return df.sparkSession.createDataFrame(
            [],
            "col_name string, words_unique double, words_alphabet double,"
            " words_numeric double, words_length_avg double,"
            " top_keywords map<string,double>, table string",
        )
    melted = _melt(ensure_parallelism(df), cols).where(
        F.col("value_str").isNotNull() & (F.col("value_str") != "")
    )
    toks = melted.select(
        "col_name",
        F.explode(F.split(F.lower(F.col("value_str")), r"\s+")).alias("tok"),
    ).where(F.col("tok") != "")

    word_counts = toks.groupBy("col_name").agg(
        F.countDistinct("tok").cast("double").alias("words_unique"),
        F.sum(F.when(F.col("tok").rlike(r"^[a-z]+$"), 1).otherwise(0))
        .cast("double")
        .alias("words_alphabet"),
        F.sum(F.when(F.col("tok").rlike(r"^-?\d+(\.\d+)?$"), 1).otherwise(0))
        .cast("double")
        .alias("words_numeric"),
        (F.sum(F.length("tok")).cast("double") / F.count(F.lit(1)).cast("double")).alias(
            "words_length_avg"
        ),
    )

    kw = (
        toks.where(F.col("tok").rlike(r"^[a-z]+$") & ~F.col("tok").isin(STOPWORDS))
        .groupBy("col_name", "tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    wk = Window.partitionBy("col_name").orderBy(F.desc("cnt"), F.asc("tok"))
    topk = (
        kw.withColumn("rn", F.row_number().over(wk))
        .where(F.col("rn") <= TOP_K_KEYWORDS)
        .groupBy("col_name")
        .agg(
            F.map_from_entries(
                F.sort_array(F.collect_list(F.struct("tok", F.col("cnt").cast("double"))))
            ).alias("top_keywords")
        )
    )
    return word_counts.join(topk, "col_name", "full").withColumn("table", F.lit(table))


# ---------------------------------------------------------------------------
# Assembly
# ---------------------------------------------------------------------------

def profile_table(
    spark: SparkSession,
    df: DataFrame,
    table: str,
    exact: bool = True,
    with_tokens: bool = True,
    with_values: bool = True,
) -> DataFrame:
    """Full profile: one row per column, reference stat names.

    Collects the (tiny, #columns-sized) per-pass results and assembles
    a ``profiles`` DataFrame with ``unique_id = table::column``
    (reference profiler.py:303).
    """
    kinds = {f.name: column_kind(f.dataType) for f in df.schema.fields}
    scalar = {
        (r["col_name"], r["stat_name"]): r["stat_value"]
        for r in scalar_stats_long(df, table, exact=exact).collect()
    }
    vrows = {r["col_name"]: r.asDict() for r in value_stats(df, table).collect()} if with_values else {}
    trows = {r["col_name"]: r.asDict() for r in token_stats(df, table).collect()} if with_tokens else {}

    out_rows = []
    for c in df.columns:
        g = lambda s: scalar.get((c, s))  # noqa: E731
        v = vrows.get(c, {})
        t = trows.get(c, {})
        ratios = {
            "integer": g("type_ratio_integer") or 0.0,
            "float": g("type_ratio_float") or 0.0,
            "date": g("type_ratio_date") or 0.0,
            "boolean": g("type_ratio_boolean") or 0.0,
        }
        null_ratio = g("null_ratio") or 0.0
        if null_ratio >= 0.999:
            # an all-null column is 'empty' regardless of physical type
            basic = "empty"
        elif kinds[c] == S.NUMERIC:
            basic = "float" if (g("max_decimals") or 0) > 0 else "integer"
        elif ratios["date"] >= TYPE_THRESHOLD:
            basic = "date"
        elif ratios["boolean"] >= TYPE_THRESHOLD:
            basic = "boolean"
        elif ratios["integer"] >= TYPE_THRESHOLD:
            basic = "integer"
        elif ratios["integer"] + ratios["float"] >= TYPE_THRESHOLD:
            basic = "float"
        elif (g("unique_ratio") or 1.0) < 0.1:
            basic = "categorical"
        else:
            basic = "string"
        out_rows.append(
            Row(
                table=table,
                column=c,
                unique_id=f"{table}::{c}",
                basic_data_type=basic,
                row_num=g("row_num"),
                null_ratio=null_ratio,
                distinct_num=g("distinct_num"),
                unique_ratio=g("unique_ratio"),
                min_len=g("min_len"),
                max_len=g("max_len"),
                avg_len=g("avg_len"),
                characters_alphabet=g("characters_alphabet"),
                characters_numeric=g("characters_numeric"),
                characters_punctuation=g("characters_punctuation"),
                characters_miscellaneous=g("characters_miscellaneous"),
                cells_alphabet=g("cells_alphabet"),
                cells_numeric=g("cells_numeric"),
                cells_punctuation=g("cells_punctuation"),
                numeric_min=g("numeric_min"),
                numeric_max=g("numeric_max"),
                numeric_mean=g("numeric_mean"),
                numeric_std=g("numeric_std"),
                q1=g("q1"),
                q2=g("q2"),
                q3=g("q3"),
                max_digits=g("max_digits"),
                max_decimals=g("max_decimals"),
                type_ratio_integer=ratios["integer"],
                type_ratio_float=ratios["float"],
                type_ratio_date=ratios["date"],
                type_ratio_boolean=ratios["boolean"],
                histogram=v.get("histogram"),
                histogram_freq=v.get("histogram_freq"),
                histogram_topk=v.get("histogram_topk"),
                dominant_pattern=v.get("dominant_pattern"),
                first_digit=v.get("first_digit"),
                first_digit_distribution=v.get("first_digit_distribution"),
                most_freq_value_ratio=v.get("most_freq_value_ratio"),
                equi_width_bin=v.get("equi_width_bin"),
                equi_depth_bin=v.get("equi_depth_bin"),
                words_unique=t.get("words_unique"),
                words_alphabet=t.get("words_alphabet"),
                words_numeric=t.get("words_numeric"),
                words_length_avg=t.get("words_length_avg"),
                top_keywords=t.get("top_keywords"),
            )
        )
    return spark.createDataFrame(out_rows, schema=PROFILE_SCHEMA)


PROFILE_SCHEMA = T.StructType(
    [T.StructField(n, tpe, True) for n, tpe in [
        ("table", T.StringType()),
        ("column", T.StringType()),
        ("unique_id", T.StringType()),
        ("basic_data_type", T.StringType()),
        ("row_num", T.DoubleType()),
        ("null_ratio", T.DoubleType()),
        ("distinct_num", T.DoubleType()),
        ("unique_ratio", T.DoubleType()),
        ("min_len", T.DoubleType()),
        ("max_len", T.DoubleType()),
        ("avg_len", T.DoubleType()),
        ("characters_alphabet", T.DoubleType()),
        ("characters_numeric", T.DoubleType()),
        ("characters_punctuation", T.DoubleType()),
        ("characters_miscellaneous", T.DoubleType()),
        ("cells_alphabet", T.DoubleType()),
        ("cells_numeric", T.DoubleType()),
        ("cells_punctuation", T.DoubleType()),
        ("numeric_min", T.DoubleType()),
        ("numeric_max", T.DoubleType()),
        ("numeric_mean", T.DoubleType()),
        ("numeric_std", T.DoubleType()),
        ("q1", T.DoubleType()),
        ("q2", T.DoubleType()),
        ("q3", T.DoubleType()),
        ("max_digits", T.DoubleType()),
        ("max_decimals", T.DoubleType()),
        ("type_ratio_integer", T.DoubleType()),
        ("type_ratio_float", T.DoubleType()),
        ("type_ratio_date", T.DoubleType()),
        ("type_ratio_boolean", T.DoubleType()),
        ("histogram", T.StringType()),
        ("histogram_freq", T.DoubleType()),
        ("histogram_topk", T.MapType(T.StringType(), T.DoubleType())),
        ("dominant_pattern", T.StringType()),
        ("first_digit", T.StringType()),
        ("first_digit_distribution", T.MapType(T.StringType(), T.DoubleType())),
        ("most_freq_value_ratio", T.DoubleType()),
        ("equi_width_bin", T.StringType()),
        ("equi_depth_bin", T.StringType()),
        ("words_unique", T.DoubleType()),
        ("words_alphabet", T.DoubleType()),
        ("words_numeric", T.DoubleType()),
        ("words_length_avg", T.DoubleType()),
        ("top_keywords", T.MapType(T.StringType(), T.DoubleType())),
    ]]
)


def profile_tables(
    spark: SparkSession, tables: dict[str, DataFrame], exact: bool = True, **kw
) -> DataFrame:
    """Profile many tables into one ``profiles`` DataFrame."""
    out = None
    for name, df in tables.items():
        p = profile_table(spark, df, name, exact=exact, **kw)
        out = p if out is None else out.unionByName(p)
    return out


def dataset_profile(profiles: DataFrame) -> DataFrame:
    """Dataset-level profile (P20): mean & variance of per-column stats
    across each table's columns (reference profiler.py:587-630)."""
    num_cols = [
        f.name
        for f in profiles.schema.fields
        if isinstance(f.dataType, T.DoubleType) and f.name not in ("row_num",)
    ]
    aggs = []
    for c in num_cols:
        aggs.append(F.avg(c).alias(f"{c}_mean"))
        aggs.append(F.var_pop(c).alias(f"{c}_var"))
    return profiles.groupBy("table").agg(*aggs)
