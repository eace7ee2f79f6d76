"""Golden-parity surface: the reference's own published Quintet benchmark.

The reference ships four public golden pairs
(``datasets/Quintet/{beers,flights,hospital,rayyan}/{dirty,clean}.csv``,
vendored under ``tests/fixtures/quintet/``) and one non-trivial
published error artifact, ``results/Quintet/beers/error_cells.csv``
(17,416 cells; the hospital ``cell_errors.csv`` is empty — a single
newline). This module re-expresses, Spark-first, the two reference
code paths those artifacts certify:

1. **Legacy per-cell rule checks** (reference
   ``detect_error_cells.py:16-32`` ``rule_violations``): string rules
   per column — "MUST NOT be NULL", "NUMERIC FIELD …", "FIXED LENGTH
   FIELD n", "STRUCTURED FIELD …" — applied cell-by-cell in pandas.
   Here: ONE scan building an array of violated-rule structs per row,
   filtered and exploded — no UDF, no per-column scans, shuffle-free
   (the explode is map-side). The published beers artifact is exactly
   NOT-NULL + NUMERIC over every column (verified cell-for-cell in
   tests/test_golden_quintet.py).

2. **The pandas ingest quirk the artifact bakes in** (reference
   ``detect_error_cells.py:13-14``: ``pd.read_csv(dtype=str).fillna("")``):
   ``dtype=str`` does NOT disable default NA parsing, so tokens like
   "N/A"/"NA"/"NaN" become NaN and then "" — which is why the beers
   ``ibu`` column is flagged BOTH not-null and non-numeric for its
   1,005 "N/A" cells. :func:`pandas_na_normalized` applies the same
   token set to an all-string Spark frame so parity is exact.

The full-pipeline golden run (:func:`run_quintet_golden`) drives the
engine's profile → cluster → share → detect → score pipeline over the
real pairs with the reference protocol (profiles from DIRTY data,
DBSCAN eps=0.5/min_samples=1 per reference ``main.py:230-231``,
sample-column sharing per ``rules/evaluation.py:266-300``) and returns
the per-dataset P/R/F1 vector that tests pin.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# the published artifact's rule strings (reference results/Quintet/
# beers/error_cells.csv distinct violated_rule values)
LEGACY_NOT_NULL = "MUST NOT be NULL"
LEGACY_NUMERIC = "NUMERIC FIELD with FORMAT (Use regex or pattern validation)"

# reference detect_error_cells.py:23 — Python ``^[\d.,]+$``; the data
# is ASCII so [0-9] is the same class (the parity test proves it)
LEGACY_NUMERIC_REGEX = "^[0-9.,]+$"
# reference detect_error_cells.py:25 — Python ``^[\w-]+$``
LEGACY_STRUCTURED_REGEX = "^[A-Za-z0-9_-]+$"

# pandas default NA tokens (pd.read_csv parses these to NaN even under
# dtype=str; the published generator then fillna("")s them)
PANDAS_NA_TOKENS = [
    "", "#N/A", "#N/A N/A", "#NA", "-1.#IND", "-1.#QNAN", "-NaN",
    "-nan", "1.#IND", "1.#QNAN", "<NA>", "N/A", "NA", "NULL", "NaN",
    "None", "n/a", "nan", "null",
]

QUINTET_DATASETS = ("beers", "flights", "hospital", "rayyan")
QUINTET_KEYS = {
    "beers": "index",
    "flights": "tuple_id",
    "hospital": "index",
    "rayyan": "id",
}


def quintet_fixture_dir() -> str:
    """Default location of the vendored golden pairs."""
    pkg = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    return os.path.join(os.path.dirname(pkg), "tests", "fixtures", "quintet")


def csv_header(path: str) -> list[str]:
    """The file's own header row (one read, shared by the oracle
    builders so no caller re-parses it — r10 review)."""
    import csv as _csv

    with open(path) as fh:
        return next(_csv.reader(fh))


def _qi(name: str) -> str:
    """A DuckDB double-quoted identifier — embedded quotes doubled, so
    an adversarial header cannot produce malformed SQL."""
    return '"' + name.replace('"', '""') + '"'


def s1_ingest_sql(
    path: str,
    pandas_na: bool = False,
    rename_to: list[str] | None = None,
    cols: list[str] | None = None,
) -> str:
    """DuckDB twin of the S1 all-string CSV ingest: all-varchar read,
    NULL→'', trim — header-derived column list (reads the file's own
    header unless the caller already has it, so a fixture change can
    never desync an oracle's hardcoded list from the engine's — r10
    review). ``pandas_na=True`` adds the published-artifact generator's
    default-NA token mapping (:data:`PANDAS_NA_TOKENS` → '');
    ``rename_to`` aliases the columns POSITIONALLY (the golden pairs'
    clean→dirty header rename)."""
    if cols is None:
        cols = csv_header(path)
    out_names = rename_to if rename_to is not None else cols
    if len(out_names) != len(cols):
        raise ValueError(
            f"rename_to has {len(out_names)} names for {len(cols)} columns"
        )
    p = path.replace("'", "''")

    # S1 cell contract: CRLF inside quoted multiline fields normalizes
    # to LF — Spark's multiLine parser does this unconditionally, so
    # the twin must match (r10 three-reader parity probe); lone CR is
    # preserved by both engines.
    def cell(c: str) -> str:
        return (
            f"trim(replace(coalesce({_qi(c)}, ''),"
            f" chr(13) || chr(10), chr(10)))"
        )

    if pandas_na:
        toks = ", ".join(f"'{t}'" for t in PANDAS_NA_TOKENS)
        norm = ", ".join(
            f"CASE WHEN {cell(c)} IN ({toks}) THEN ''"
            f" ELSE {cell(c)} END AS {_qi(o)}"
            for c, o in zip(cols, out_names)
        )
    else:
        norm = ", ".join(
            f"{cell(c)} AS {_qi(o)}" for c, o in zip(cols, out_names)
        )
    return (
        f"SELECT {norm} FROM read_csv('{p}', header=true,"
        f" all_varchar=true, nullstr='\\x01__NONE__')"
    )


def pandas_na_normalized(df: DataFrame) -> DataFrame:
    """Map every cell matching a pandas default NA token to '' — the
    ingest semantics the published artifact was generated under
    (``pd.read_csv(dtype=str).fillna("")``). Expects an all-string
    frame (catalog.read_csv_all_string)."""
    toks = F.array(*[F.lit(t) for t in PANDAS_NA_TOKENS])
    return df.select(
        *[
            F.when(F.array_contains(toks, F.col(c)), F.lit("")).otherwise(F.col(c)).alias(c)
            for c in df.columns
        ]
    )


def load_quintet_pair(
    spark: SparkSession, dataset: str, fixture_dir: str | None = None
) -> tuple[DataFrame, DataFrame]:
    """(dirty, clean) all-string frames for one golden pair; the clean
    side's columns are renamed POSITIONALLY to the dirty names —
    the reference diffs cells by position (``utils/metrics.py:74-109``
    ``iat[row, col]``) and names errors by the dirty header, and the
    shipped pairs disagree on header spelling (hospital: CamelCase
    clean vs snake_case dirty; beers: dashes vs underscores)."""
    d = fixture_dir or quintet_fixture_dir()
    return load_pair(spark, os.path.join(d, dataset))


#: every code point Python str.strip() treats as whitespace
#: (str.isspace() — CPython's Py_UNICODE_ISSPACE table)
PY_STRIP_WS = "".join(
    chr(c)
    for c in (
        [0x09, 0x0A, 0x0B, 0x0C, 0x0D, 0x1C, 0x1D, 0x1E, 0x1F, 0x20]
        + [0x85, 0xA0, 0x1680]
        + list(range(0x2000, 0x200B))
        + [0x2028, 0x2029, 0x202F, 0x205F, 0x3000]
    )
)
# the ASCII-control portion goes through chr() (backslash escapes
# parse differently in the two engines' string literals); the Unicode
# spaces are embedded as RAW characters in the SQL text — Spark's
# chr() wraps its argument mod 256 (chr(0x2003) = chr(3)!), so chr()
# is only safe below 256
_PY_STRIP_WS_SQL = (
    "concat("
    + ", ".join(f"chr({ord(c)})" for c in PY_STRIP_WS if ord(c) < 256)
    + ", '"
    + "".join(c for c in PY_STRIP_WS if ord(c) >= 256)
    + "')"
)


def _legacy_predicate(col_sql: str, rule: str, rlike) -> str | None:
    """The WHERE clause for one legacy rule over one (trimmed,
    NA-normalized) string column — identical in both engines except
    for the regex-match spelling, injected via ``rlike(value_sql,
    regex)``. Returns None for rule kinds the reference never enforces
    at cell level (CATEGORICAL / LIKELY UNIQUE return False in
    rule_violations).

    Stripping matches Python ``str.strip()`` over its FULL whitespace
    set — ASCII (space, TAB, LF, CR, VT, FF), the C1/file-separator
    block (\\x1c-\\x1f, \\x85) and the Unicode spaces (NBSP, ogham,
    en/em family, line/para separators, narrow NBSP, math space,
    ideographic space) — SQL ``trim()`` removes spaces only, and the
    r10 six-char ASCII set silently diverged on NBSP-padded cells
    (common in scraped data — r10 ADVICE). The set is built with
    ``chr()`` because backslash escapes parse differently in the two
    engines' string literals; property-tested against the pure-python
    model in tests/test_golden_quintet.py."""
    ws = _PY_STRIP_WS_SQL
    v = f"trim(BOTH {ws} FROM coalesce({col_sql}, ''))"
    if rule == LEGACY_NOT_NULL:
        return f"{v} = ''"
    if "FIXED LENGTH FIELD" in rule:
        n = int(re.findall(r"\d+", rule)[0])
        return f"length({v}) <> {n}"
    if rule.startswith("NUMERIC FIELD"):
        return f"NOT ({rlike(v, LEGACY_NUMERIC_REGEX)})"
    if rule.startswith("STRUCTURED FIELD"):
        return f"NOT ({rlike(v, LEGACY_STRUCTURED_REGEX)})"
    return None


def _spark_pred(col: str, rule: str) -> str | None:
    return _legacy_predicate(
        f"`{col}`", rule, lambda v, rx: f"{v} RLIKE '{rx}'"
    )


def _duck_pred(col: str, rule: str) -> str | None:
    return _legacy_predicate(
        f'"{col}"', rule, lambda v, rx: f"regexp_matches({v}, '{rx}')"
    )


def legacy_error_cells(
    df: DataFrame,
    rules_map: dict[str, list[str]],
    row_index_expr: str,
) -> DataFrame:
    """Reference ``detect_error_cells.py`` as one Spark scan.

    ``rules_map``: column → legacy rule strings. ``row_index_expr``:
    SQL producing the reference's 0-based positional row index (the
    golden pairs carry 1-based key columns aligned with file order, so
    e.g. ``CAST(index AS BIGINT) - 1``). Emits ``(column_name,
    row_index, violated_rule)``.

    Scale shape: every (column, rule) check folds into ONE projection
    as a conditional struct; the array filter + explode stays in the
    same stage — a 100-column × 3-rule table is still one scan with
    no shuffle and no UDF."""
    entries = []
    for col, rules in rules_map.items():
        if col not in df.columns:
            raise ValueError(f"legacy_error_cells: unknown column {col!r}")
        for rule in rules:
            pred = _spark_pred(col, rule)
            if pred is None:
                continue
            entries.append(
                F.when(
                    F.expr(pred),
                    F.struct(
                        F.lit(col).alias("column_name"),
                        F.lit(rule).alias("violated_rule"),
                    ),
                )
            )
    if not entries:
        raise ValueError("legacy_error_cells: no enforceable rules")
    arr = F.filter(F.array(*entries), lambda x: x.isNotNull())
    return (
        df.select(
            F.expr(row_index_expr).cast("long").alias("row_index"),
            arr.alias("_v"),
        )
        .select("row_index", F.explode("_v").alias("_e"))
        .select(
            F.col("_e.column_name").alias("column_name"),
            "row_index",
            F.col("_e.violated_rule").alias("violated_rule"),
        )
    )


def legacy_error_cells_sql(
    src_sql: str,
    rules_map: dict[str, list[str]],
    row_index_sql: str,
) -> str:
    """DuckDB oracle for :func:`legacy_error_cells` — per-(column,
    rule) UNION ALL of the same predicates (oracle runs once at
    fixture scale; the Spark side keeps the single-scan shape)."""
    selects = []
    for col, rules in rules_map.items():
        for rule in rules:
            pred = _duck_pred(col, rule)
            if pred is None:
                continue
            r = rule.replace("'", "''")
            selects.append(
                f"SELECT '{col}' AS column_name,"
                f" CAST({row_index_sql} AS BIGINT) AS row_index,"
                f" '{r}' AS violated_rule FROM _src WHERE {pred}"
            )
    body = "\nUNION ALL\n".join(selects)
    return f"WITH _src AS ({src_sql})\n{body}"


def beers_rules_map(columns: list[str]) -> dict[str, list[str]]:
    """The rule assignment that generated the published beers artifact:
    NOT-NULL + NUMERIC on every column (zero-violation assignments are
    indistinguishable in the output; this minimal-assumption map
    reproduces all 17,416 published cells exactly and nothing else)."""
    return {c: [LEGACY_NOT_NULL, LEGACY_NUMERIC] for c in columns}


def quintet_beers_error_cells(
    spark: SparkSession, fixture_dir: str | None = None
) -> DataFrame:
    """The published-artifact replication query: ingest the dirty
    beers golden pair (S1 all-string scan + pandas-NA normalization)
    and emit the legacy error cells. Equal, cell for cell, to the
    reference's shipped ``results/Quintet/beers/error_cells.csv``."""
    d = fixture_dir or quintet_fixture_dir()
    from datalakerulegeneration_spark.catalog import read_csv_all_string

    df = pandas_na_normalized(
        read_csv_all_string(spark, os.path.join(d, "beers", "dirty.csv"))
    )
    return legacy_error_cells(
        df, beers_rules_map(df.columns), "CAST(`index` AS BIGINT) - 1"
    )


def quintet_beers_error_cells_oracle(fixture_dir: str | None = None) -> str:
    """DuckDB twin of :func:`quintet_beers_error_cells` reading the
    same CSV fixture (all_varchar read + the same NA token mapping)."""
    d = fixture_dir or quintet_fixture_dir()
    path = os.path.join(d, "beers", "dirty.csv")
    cols = csv_header(path)
    src = s1_ingest_sql(path, pandas_na=True, cols=cols)
    return legacy_error_cells_sql(
        src, beers_rules_map(cols), 'CAST("index" AS BIGINT) - 1'
    )


def load_pair(spark: SparkSession, pair_dir: str) -> tuple[DataFrame, DataFrame]:
    """(dirty, clean) all-string frames for a golden pair directory;
    clean columns renamed POSITIONALLY to the dirty header (the
    reference diffs by position — ``utils/metrics.py:74-109``)."""
    from datalakerulegeneration_spark.catalog import read_csv_all_string

    dirty = read_csv_all_string(spark, os.path.join(pair_dir, "dirty.csv"))
    clean = read_csv_all_string(spark, os.path.join(pair_dir, "clean.csv"))
    if len(clean.columns) != len(dirty.columns):
        raise ValueError(
            f"{pair_dir}: dirty has {len(dirty.columns)} columns, clean "
            f"{len(clean.columns)} — positional rename impossible"
        )
    return dirty, clean.toDF(*dirty.columns)


def pair_truth(spark: SparkSession, pair_dir: str, key: str) -> DataFrame:
    """A golden pair's ground-truth cell diff (J1 on REAL data):
    S1-ingest ``<pair_dir>/{dirty,clean}.csv``, rename clean
    positionally to the dirty header, key-join, emit ``(row_id,
    column, dirty_value, clean_value)`` — ``evaluation.cell_diff``."""
    from datalakerulegeneration_spark.evaluation.ground_truth import cell_diff

    dirty, clean = load_pair(spark, pair_dir)
    return cell_diff(dirty, clean, key=key)


def pair_truth_sql(pair_dir: str, key: str) -> str:
    """DuckDB twin of :func:`pair_truth`: the same all-varchar + trim
    ingest of both CSVs, positional rename, one key equi-join,
    per-column UNION ALL of the differing cells."""
    cols = csv_header(os.path.join(pair_dir, "dirty.csv"))

    def side(kind: str) -> str:
        # positional rename to the dirty header (s1_ingest_sql reads
        # each file's own header and aliases by ordinal; the dirty
        # side's header is reused, not re-parsed)
        return s1_ingest_sql(
            os.path.join(pair_dir, f"{kind}.csv"),
            rename_to=cols,
            cols=cols if kind == "dirty" else None,
        )

    selects = []
    for c in cols:
        selects.append(
            f'SELECT CAST(d."{key}" AS VARCHAR) AS row_id,'
            f" '{c}' AS \"column\","
            f' d."{c}" AS dirty_value, c."{c}" AS clean_value'
            f' FROM _d d JOIN _c c ON d."{key}" = c."{key}"'
            f' WHERE d."{c}" <> c."{c}"'
        )
    return (
        f"WITH _d AS ({side('dirty')}),\n_c AS ({side('clean')})\n"
        + "\nUNION ALL\n".join(selects)
    )


def quintet_truth(
    spark: SparkSession, dataset: str = "beers", fixture_dir: str | None = None
) -> DataFrame:
    """Quintet instantiation of :func:`pair_truth`."""
    d = fixture_dir or quintet_fixture_dir()
    return pair_truth(spark, os.path.join(d, dataset), QUINTET_KEYS[dataset])


def quintet_truth_sql(dataset: str = "beers", fixture_dir: str | None = None) -> str:
    d = fixture_dir or quintet_fixture_dir()
    return pair_truth_sql(os.path.join(d, dataset), QUINTET_KEYS[dataset])


def quintet_split_truth(spark: SparkSession, half: str = "movies_1") -> DataFrame:
    """Movies golden-pair ground truth over the vendored Quintet_Split
    half (r11 — the third golden group's text-heavy schema). The key
    column itself carries injected errors in 97/93 rows, so this KEYED
    diff covers the id-stable subset (3,902 / 3,298 aligned rows) —
    both engines drop the same corrupted-key rows; the FULL positional
    diff (4,326 / 3,349 cells, reference ``utils/metrics.py:74-109``
    iat-semantics) is pinned in tests/test_trained_rules_golden.py."""
    from datalakerulegeneration_spark.evaluation.trained_rules import (
        quintet_split_fixture_dir,
    )

    return pair_truth(spark, os.path.join(quintet_split_fixture_dir(), half), "id")


def quintet_split_truth_sql(half: str = "movies_1") -> str:
    from datalakerulegeneration_spark.evaluation.trained_rules import (
        quintet_split_fixture_dir,
    )

    return pair_truth_sql(os.path.join(quintet_split_fixture_dir(), half), "id")


def run_split_transfer_golden(spark: SparkSession) -> dict:
    """M8 rule transfer on the reference's OWN row-split benchmark
    (r11): ``Quintet_Split/rayyan + rayyan_2`` are the 1,000-row rayyan
    table's first/last 500 rows (verified: their concat is byte-equal
    to ``Quintet/rayyan``). Train on half 1 — profile its DIRTY side,
    cluster (eps=0.5/min_samples=1), share rules, derive params — then
    detect on half 2 WITHOUT re-profiling (the transferred bindings),
    scored against half 2's own clean diff. Returns per-half metrics
    plus the in-domain half-1 run for the transfer gap."""
    from datalakerulegeneration_spark.clustering.cluster import cluster_columns_dbscan
    from datalakerulegeneration_spark.clustering.sharing import (
        shared_rules_by_threshold,
    )
    from datalakerulegeneration_spark.evaluation.ground_truth import cell_diff
    from datalakerulegeneration_spark.evaluation.metrics import cell_metrics
    from datalakerulegeneration_spark.evaluation.trained_rules import (
        quintet_split_fixture_dir,
    )
    from datalakerulegeneration_spark.pipeline import generate_bindings
    from datalakerulegeneration_spark.profiling import profile_tables
    from datalakerulegeneration_spark.rules import RuleEngine
    from datalakerulegeneration_spark.rules.builtin import load_all_rules

    root = quintet_split_fixture_dir()
    halves = {
        h: load_pair(spark, os.path.join(root, h)) for h in ("rayyan", "rayyan_2")
    }
    rules = load_all_rules()
    profiles = profile_tables(
        spark, {"rayyan": halves["rayyan"][0]}, with_tokens=False, coerce_numeric=True
    )
    clusters = cluster_columns_dbscan(profiles, eps=0.5, min_samples=1)
    shared = shared_rules_by_threshold(profiles, clusters, rules, threshold=0.7)
    bindings = generate_bindings(
        profiles, clusters, shared, rules, "rayyan", param_source="cluster_sample"
    )
    eng = RuleEngine(spark)
    out: dict = {}
    for h, (dirty, clean) in halves.items():
        v = eng.detect(dirty, h, bindings, row_id_col="id")
        truth = cell_diff(dirty, clean, key="id")
        m = dict(cell_metrics(v, truth))
        m["n_truth"] = m["tp"] + m["fn"]
        out[h] = m
    return out


def dgov_fixture_dir() -> str:
    """The vendored DGov lake pairs (reference datasets/DGov — the
    Connecticut 305(b) assessed-lake tables with the author's OWN
    annotated change logs, ``clean_changes.csv``)."""
    return os.path.join(os.path.dirname(quintet_fixture_dir()), "dgov")


DGOV_DATASETS = ("lake2018", "lake2020")
_DGOV_KEY = "objectid(long)"


def dgov_truth(spark: SparkSession, dataset: str = "lake2018") -> DataFrame:
    """DGov instantiation of :func:`pair_truth` (key column carries
    the reference's type-suffixed header spelling)."""
    return pair_truth(
        spark, os.path.join(dgov_fixture_dir(), dataset), _DGOV_KEY
    )


def dgov_truth_sql(dataset: str = "lake2018") -> str:
    return pair_truth_sql(os.path.join(dgov_fixture_dir(), dataset), _DGOV_KEY)


TEMP_DATASETS = ("lake2008", "estuary2008")


def temp_fixture_dir() -> str:
    """The vendored 2008 water-assessment pairs (reference
    datasets/temp — the Connecticut 305(b) 2008 Lake + Estuary tables,
    DIFFERENT schemas, each with the author's annotated change log)."""
    return os.path.join(os.path.dirname(quintet_fixture_dir()), "temp")


def temp_truth(spark: SparkSession, dataset: str = "lake2008") -> DataFrame:
    """Fourth golden group's ground truth (r11): same keyed cell diff
    + positional-rename contract as the DGov pairs (clean headers are
    the type-suffix-stripped spellings)."""
    return pair_truth(
        spark, os.path.join(temp_fixture_dir(), dataset), _DGOV_KEY
    )


def temp_truth_sql(dataset: str = "lake2008") -> str:
    return pair_truth_sql(os.path.join(temp_fixture_dir(), dataset), _DGOV_KEY)


def run_pairs_golden(
    spark: SparkSession, pairs: dict[str, str], key_cols: dict[str, str]
) -> dict:
    """The shared reference-protocol runner over any golden pair
    group: profiles from DIRTY, DBSCAN eps=0.5/min_samples=1
    (reference main.py:230-231), sample-column sharing
    (rules/evaluation.py:266-300), detect on dirty, score against the
    positional dirty↔clean diff. ``pairs``: name → pair directory.
    Returns ``{name: {tp, fp, fn, precision, recall, f1, n_truth}}``."""
    from datalakerulegeneration_spark.pipeline import run_quality_pipeline

    dirty_tables, clean_tables = {}, {}
    for name, d in pairs.items():
        dirty_tables[name], clean_tables[name] = load_pair(spark, d)
    out = run_quality_pipeline(
        spark,
        clean_tables,
        dirty_tables,
        key_cols=key_cols,
        eps=0.5,
        min_samples=1,
        param_source="cluster_sample",
        profile_source="dirty",
    )
    metrics: dict = {}
    for name in pairs:
        m = dict(out["tables"][name]["metrics"])
        m["n_truth"] = m["tp"] + m["fn"]
        metrics[name] = m
    return metrics


def run_dgov_golden(spark: SparkSession) -> dict:
    """The DGov multi-table golden run: BOTH lake-assessment years
    profile/cluster together (genuinely related tables — the
    reference's own cross-table sharing scenario: its hardcoded
    sample_columns name the 305b tables, dictionary_rule.py:33-39),
    detection on dirty, scored against the author's annotated change
    logs (== our positional diff, proven in tests)."""
    return run_pairs_golden(
        spark,
        {ds: os.path.join(dgov_fixture_dir(), ds) for ds in DGOV_DATASETS},
        {ds: _DGOV_KEY for ds in DGOV_DATASETS},
    )


def run_quintet_golden(
    spark: SparkSession,
    fixture_dir: str | None = None,
    datasets: tuple[str, ...] = QUINTET_DATASETS,
) -> dict:
    """Full-pipeline golden run over the real Quintet pairs under the
    reference protocol: profiles from the DIRTY tables (the published
    ``column_profile.dictionary`` pickles are dirty-data profiles),
    DBSCAN eps=0.5 / min_samples=1 (reference ``main.py:230-231``),
    sample-column rule sharing (``rules/evaluation.py:266-300`` via
    ``param_source="cluster_sample"``), detection on dirty, scoring
    against the positional dirty↔clean cell diff. Returns
    ``{dataset: {tp, fp, fn, precision, recall, f1, n_truth}}``."""
    d = fixture_dir or quintet_fixture_dir()
    return run_pairs_golden(
        spark,
        {ds: os.path.join(d, ds) for ds in datasets},
        {ds: QUINTET_KEYS[ds] for ds in datasets},
    )
