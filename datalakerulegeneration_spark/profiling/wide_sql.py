"""DuckDB SQL builder for the WIDE per-column profile frame.

:func:`profile_table` assembles one row per column from the stat
registry's Spark aggregates; this module emits the equivalent DuckDB
SQL (one ``SELECT ... FROM table`` per column, UNION ALL) using the
registry's paired ``sql`` builders — so downstream operators that are
pure arithmetic over profiles (column matching J5/M5, dataset
similarity A6) get exact end-to-end oracles instead of rows-only
checks.

Stats a column's kind doesn't define are emitted as typed NULLs,
mirroring the ``Row(...)=None`` fields profile_table produces. The
``basic_data_type`` cascade (P18) is reproduced as a CASE expression
over the same registry stats, including profile_table's Python quirk
that a falsy (0.0 / None) unique_ratio falls back to 1.0.
"""

from __future__ import annotations

from datalakerulegeneration_spark.profiling import stats as S
from datalakerulegeneration_spark.profiling.patterns import TYPE_THRESHOLD

# PROFILE_SCHEMA's double-typed stats in declaration order (row_num is
# excluded by dataset_profile). Used to keep vector layouts identical
# between the Spark plan and the oracle.
DOUBLE_STATS = [
    "null_ratio", "distinct_num", "unique_ratio", "min_len", "max_len",
    "avg_len", "characters_alphabet", "characters_numeric",
    "characters_punctuation", "characters_miscellaneous",
    "cells_alphabet", "cells_numeric", "cells_punctuation",
    "numeric_min", "numeric_max", "numeric_mean", "numeric_std",
    "q1", "q2", "q3", "max_digits", "max_decimals",
    "type_ratio_integer", "type_ratio_float", "type_ratio_date",
    "type_ratio_boolean", "histogram_freq", "most_freq_value_ratio",
    "words_unique", "words_alphabet", "words_numeric", "words_length_avg",
]

# token-pass stats: NULL whenever with_tokens=False (the only mode the
# oracle-checked queries use — top_keywords maps don't hash portably)
_TOKEN_STATS = {"words_unique", "words_alphabet", "words_numeric", "words_length_avg"}
_VALUE_STATS = {"histogram_freq", "most_freq_value_ratio"}


def _basic_type_case(kind: str) -> str:
    """CASE expression mirroring profile_table's basic_data_type
    cascade (profiler.py): numeric columns decide on max_decimals,
    stringy columns walk the type-ratio thresholds."""
    t = TYPE_THRESHOLD
    if kind == S.NUMERIC:
        return (
            "CASE WHEN null_ratio >= 0.999 THEN 'empty'"
            " WHEN COALESCE(max_decimals, 0) > 0 THEN 'float'"
            " ELSE 'integer' END"
        )
    return (
        "CASE WHEN null_ratio >= 0.999 THEN 'empty'"
        f" WHEN type_ratio_date >= {t} THEN 'date'"
        f" WHEN type_ratio_boolean >= {t} THEN 'boolean'"
        f" WHEN type_ratio_integer >= {t} THEN 'integer'"
        f" WHEN type_ratio_integer + type_ratio_float >= {t} THEN 'float'"
        # Python `g('unique_ratio') or 1.0`: None AND 0.0 both fall
        # back to 1.0
        " WHEN COALESCE(NULLIF(unique_ratio, 0.0), 1.0) < 0.1 THEN 'categorical'"
        " ELSE 'string' END"
    )


def _histogram_freq_sql(table: str, col: str) -> str:
    """Modal-value count over the melt rendering (P13). Grouping is by
    the engine's own string rendering of the cell; renderings are
    injective per engine, so group SIZES (all this stat uses) are
    engine-independent even where the rendered text differs."""
    return (
        "(SELECT CAST(max(cnt) AS DOUBLE) FROM ("
        f"SELECT count(*) AS cnt FROM {table}"
        f" WHERE {col} IS NOT NULL AND CAST({col} AS VARCHAR) <> ''"
        f" GROUP BY CAST({col} AS VARCHAR)))"
    )


def _most_freq_ratio_sql(table: str, col: str) -> str:
    """Modal share over the canonical NUMERIC rendering (P10)."""
    return (
        "(SELECT CAST(max(cnt) AS DOUBLE) / CAST(sum(cnt) AS DOUBLE) FROM ("
        f"SELECT count(*) AS cnt FROM {table}"
        f" WHERE {col} IS NOT NULL AND CAST({col} AS VARCHAR) <> ''"
        f" AND TRY_CAST(CAST({col} AS VARCHAR) AS DOUBLE) IS NOT NULL"
        f" GROUP BY TRY_CAST(CAST({col} AS VARCHAR) AS DOUBLE)))"
    )


def wide_profile_sql(
    table: str,
    cols_kinds: list[tuple[str, str]],
    with_values: bool = True,
) -> str:
    """One SELECT per column UNION ALL'd into the wide profile frame:
    (tbl, colname, unique_id, basic_data_type, <DOUBLE_STATS...>).
    ``cols_kinds`` is [(column, S.NUMERIC | S.STRINGY), ...] in the
    table's column order (profile_table iterates df.columns)."""
    selects = []
    for c, kind in cols_kinds:
        # stat templates embed the name as an IDENTIFIER — always
        # double-quote so headers with parens/spaces (the temp 2008
        # schemas) parse; the colname/unique_id literals keep raw names
        qc = '"' + c.replace('"', '""') + '"'
        have = {st.name: st.sql(qc) for st in S.stats_for_kind(kind)}
        fields = [
            f"'{table}' AS tbl",
            f"'{c}' AS colname",
            f"'{table}::{c}' AS unique_id",
        ]
        for name in DOUBLE_STATS:
            if name in have:
                expr = have[name]
            elif name in _VALUE_STATS and with_values:
                expr = (
                    _histogram_freq_sql(table, qc)
                    if name == "histogram_freq"
                    else _most_freq_ratio_sql(table, qc)
                )
            else:
                expr = "CAST(NULL AS DOUBLE)"
            fields.append(f"({expr}) AS {name}")
        inner = ",\n       ".join(fields)
        # basic_data_type references sibling aliases -> wrap one level
        selects.append(
            f"SELECT *, {_basic_type_case(kind)} AS basic_data_type FROM ("
            f"SELECT {inner} FROM {table})"
        )
    return "\nUNION ALL\n".join(selects)
