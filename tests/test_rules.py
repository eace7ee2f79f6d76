"""Rule DSL, compiler, engine: the reference's minimum slice —
profile a dirty table, apply rules, emit error cells, score vs clean
(mirrors main.py --mode single)."""

import pytest
from pyspark.sql import functions as F

from datalakerulegeneration_spark.rules import (
    Rule,
    RuleEngine,
    load_all_rules,
    parse_expr,
    rules_for_profiles,
)
from datalakerulegeneration_spark.rules.engine import Binding
from datalakerulegeneration_spark.profiling import profile_table
from datalakerulegeneration_spark.evaluation import cell_diff, cell_metrics, column_metrics


@pytest.fixture(scope="module")
def beers(spark):
    """Beers-like dirty/clean pair (FIXTURES.md §1): unit suffixes,
    percent suffixes, nulls in non-nullable, out-of-range."""
    clean_rows = [
        (str(i), f"beer {i}", "12", "0.05", "CA") for i in range(20)
    ]
    dirty_rows = [list(r) for r in clean_rows]
    dirty_rows[3][2] = "12.0 oz"      # unit suffix → regex violation
    dirty_rows[7][3] = "0.05%"        # percent suffix
    dirty_rows[11][0] = ""            # null in id column
    dirty_rows[15][4] = "XX"          # invalid state
    schema = "index string, beer_name string, ounces string, abv string, state string"
    clean = spark.createDataFrame(clean_rows, schema)
    dirty = spark.createDataFrame([tuple(r) for r in dirty_rows], schema)
    return dirty, clean


def test_parse_expr():
    e = parse_expr("unique_ratio >= 1.0 and null_ratio == 0")
    assert e == {"all": [
        {"feature": "unique_ratio", "op": ">=", "value": 1.0},
        {"feature": "null_ratio", "op": "==", "value": 0.0},
    ]}


def test_parse_legacy_rules(spark):
    # R19: reference detect_error_cells.py:16-32 semantics — trimmed
    # values, empty cells violate, CATEGORICAL/LIKELY UNIQUE are inert
    from datalakerulegeneration_spark.rules.engine import Binding
    from datalakerulegeneration_spark.rules.spec import parse_legacy_rules

    pairs = parse_legacy_rules(
        {
            "a": ["MUST NOT be NULL", "FIXED LENGTH FIELD 3"],
            "b": ["NUMERIC FIELD", "CATEGORICAL FIELD"],
            "c": ["STRUCTURED FIELD (code)", "LIKELY UNIQUE FIELD"],
        }
    )
    inert = [r for _, r in pairs if r.validate is None]
    assert len(pairs) == 6 and len(inert) == 2
    df = spark.createDataFrame(
        [("abc", "12.5", "ok-1"), ("  ", "x2", "has space"), ("abcd", "", "fine_2")],
        "a string, b string, c string",
    )
    from datalakerulegeneration_spark.rules import RuleEngine

    eng = RuleEngine(spark)
    v = eng.detect(
        df, "t", [Binding(c, r) for c, r in pairs], row_id_col=None,
        suppress_full_column=False,
    )
    got = {(r.column, r.rule, r.row_id) for r in v.collect()}
    assert ("a", "MUST NOT be NULL", "1") in got          # whitespace-only
    assert ("a", "FIXED LENGTH FIELD 3", "1") in got      # trims to 0 chars
    assert ("a", "FIXED LENGTH FIELD 3", "2") in got      # 4 chars
    assert ("b", "NUMERIC FIELD", "1") in got             # 'x2'
    assert ("b", "NUMERIC FIELD", "2") in got             # empty violates
    assert ("c", "STRUCTURED FIELD (code)", "1") in got   # space
    assert not any(r == "CATEGORICAL FIELD" for _, r, _ in got)
    assert ("a", "MUST NOT be NULL", "0") not in got


def test_rules_for_profiles(spark, sf_tables):
    profiles = profile_table(spark, sf_tables["nation"], "nation")
    matched = rules_for_profiles(profiles, load_all_rules())
    byrule = {
        (r["column"], r["rule"]) for r in matched.collect()
    }
    # n_nationkey is a perfect key → uniqueness rules apply
    assert ("n_nationkey", "is_id") in byrule
    assert ("n_nationkey", "is_unique") in byrule
    # n_regionkey is numeric & repeating → range rule applies, pattern
    # and uniqueness rules must not
    assert ("n_regionkey", "value_in_range") in byrule
    assert ("n_regionkey", "matches_dominant_pattern") not in byrule
    assert ("n_regionkey", "is_unique") not in byrule


def test_row_local_rules_single_pass(spark, beers):
    dirty, _ = beers
    eng = RuleEngine(spark)
    bindings = [
        Binding("index", Rule("is_not_nullable", validate={"type": "not_null"})),
        Binding("ounces", Rule("matches_regex_ounces", validate={"type": "regex", "pattern": r"\d{1,2}"})),
        Binding("abv", Rule("decimal_precision", validate={"type": "decimal_precision", "max_decimals": 3})),
        Binding("abv", Rule("value_in_range", validate={"type": "range", "lo": 0, "hi": 1})),
    ]
    v = eng.detect(dirty, "beers", bindings, row_id_col="index")
    got = {(r["column"], r["rule"]) for r in v.collect()}
    assert ("index", "is_not_nullable") in got
    assert ("ounces", "matches_regex_ounces") in got
    assert ("abv", "decimal_precision") in got   # "0.05%" is non-numeric
    assert ("abv", "value_in_range") in got


def test_aggregate_rules(spark):
    df = spark.createDataFrame(
        [("1", "a", 10.0), ("2", "a", 11.0), ("2", "b", 9.0), ("3", "a", 10.5),
         ("4", "a", 9.5), ("5", "a", 1000.0)],
        "id string, cat string, x double",
    )
    eng = RuleEngine(spark)
    v = eng.detect(
        df,
        "t",
        [
            Binding("id", Rule("is_unique", validate={"type": "unique"})),
            Binding("x", Rule("three_sigma", validate={"type": "three_sigma", "tol": 1.5})),
        ],
        row_id_col="id",
    )
    got = {(r["column"], r["rule"], r["value"]) for r in v.collect()}
    assert ("id", "is_unique", "2") in got
    assert ("x", "three_sigma", "1000.0") in got


def test_dictionary_and_inclusion(spark):
    dim = spark.createDataFrame([("austin",), ("dallas",)], "city string")
    parent = spark.createDataFrame([(1,), (2,)], "k int")
    child = spark.createDataFrame(
        [("1", "Austin", 1), ("2", "Nowhere", 2), ("3", "dallas", 9)],
        "id string, city string, fk int",
    )
    eng = RuleEngine(spark, dimensions={"cities": dim}, parents={"p": parent})
    v = eng.detect(
        child,
        "c",
        [
            Binding("city", Rule("is_city", validate={"type": "dictionary", "dimension": "cities", "dim_column": "city"})),
            Binding("fk", Rule("fk_in_parent", validate={"type": "inclusion", "parent_table": "p", "parent_column": "k"})),
        ],
        row_id_col="id",
    )
    got = {(r["column"], r["row_id"]) for r in v.collect()}
    assert ("city", "2") in got and ("fk", "3") in got
    assert ("city", "1") not in got  # case-insensitive match


def test_fused_pass_equals_individual_detects(spark):
    """The fused broadcast-lookup pass must produce exactly the union
    of running every rule alone — including several aggregate rules on
    the same column plus dictionary/inclusion/FD lookups together."""
    dim = spark.createDataFrame([("red",), ("blue",)], "color string")
    parent = spark.createDataFrame([(1,), (2,), (3,)], "k int")
    rows = [
        ("1", "red", 1, 10.0, "x"),
        ("2", "red", 2, 10.5, "x"),
        ("3", "GREEN", 9, 11.0, "y"),
        ("4", "blue", 3, 11.5, "x"),
        ("5", "red", 1, 500.0, "x"),
        ("6", "red", 2, 10.0, "z"),
        ("7", "red", 2, 10.0, "x"),
        ("8", "red", 2, 10.0, "x"),
    ]
    df = spark.createDataFrame(rows, "id string, color string, fk int, v double, grp string")
    bindings = [
        Binding("id", Rule("id_unique", validate={"type": "unique"})),
        Binding("color", Rule("color_modal", validate={"type": "constant"})),
        Binding("color", Rule("color_rare", validate={"type": "low_frequency", "min_ratio": 0.2})),
        Binding("color", Rule("color_dict", validate={"type": "dictionary", "dimension": "colors", "dim_column": "color"})),
        Binding("v", Rule("v_sigma", validate={"type": "three_sigma", "tol": 1.5})),
        Binding("fk", Rule("fk_incl", validate={"type": "inclusion", "parent_table": "p", "parent_column": "k"})),
        Binding("grp", Rule("grp_fd", validate={"type": "fd", "determinant": "color"})),
        Binding("v", Rule("v_range", validate={"type": "range", "lo": 0.0, "hi": 100.0})),
    ]
    eng = RuleEngine(spark, dimensions={"colors": dim}, parents={"p": parent})
    fused = {
        (r["column"], r["row_id"], r["rule"])
        for r in eng.detect(df, "t", bindings, row_id_col="id", suppress_full_column=False).collect()
    }
    solo = set()
    for b in bindings:
        solo |= {
            (r["column"], r["row_id"], r["rule"])
            for r in eng.detect(df, "t", [b], row_id_col="id", suppress_full_column=False).collect()
        }
    assert fused == solo
    # sanity: the planted anomalies are present
    assert ("v", "5", "v_sigma") in fused and ("v", "5", "v_range") in fused
    assert ("color", "3", "color_dict") in fused
    assert ("fk", "3", "fk_incl") in fused


def test_spell_check_rule(spark):
    words = spark.createDataFrame(
        [("birmingham",), ("general",), ("hospital",)], "word string"
    )
    df = spark.createDataFrame(
        [("1", "Birmingham General Hospital"), ("2", "Birminghxm General Hospital")],
        "id string, name string",
    )
    eng = RuleEngine(spark, dimensions={"words": words})
    v = eng.detect(
        df,
        "h",
        [Binding("name", Rule("is_spelled_correctly", validate={"type": "spell", "dimension": "words"}))],
        row_id_col="id",
        suppress_full_column=False,
    )
    rows = v.collect()
    assert {r["row_id"] for r in rows} == {"2"}


def test_full_column_suppressor(spark):
    df = spark.createDataFrame([("1", "x"), ("2", "y")], "id string, c string")
    eng = RuleEngine(spark)
    # a regex nothing matches would flag 100% of rows → suppressed (R18)
    v = eng.detect(
        df,
        "t",
        [Binding("c", Rule("bad_pattern", validate={"type": "regex", "pattern": r"\d+"}))],
        row_id_col="id",
    )
    assert v.count() == 0


def test_end_to_end_minimum_slice(spark, beers):
    """Profile dirty → bind rules → violations → P/R/F1 vs clean."""
    dirty, clean = beers
    eng = RuleEngine(spark)
    bindings = [
        Binding("index", Rule("is_not_nullable", validate={"type": "not_null"})),
        Binding("ounces", Rule("rx", validate={"type": "regex", "pattern": r"\d{1,2}"})),
        Binding("abv", Rule("rng", validate={"type": "range", "lo": 0, "hi": 1})),
    ]
    v = eng.detect(dirty, "beers", bindings, row_id_col=None)
    truth = cell_diff(dirty, clean)  # positional ids on both sides
    m = cell_metrics(v, truth)
    # planted: ounces@3 (regex hit), abv@7 (range hit), index@11 (null
    # hit); state@15 has no bound rule → 1 FN; no false positives
    assert m["tp"] == 3 and m["fp"] == 0 and m["fn"] == 1
    assert m["precision"] == 1.0 and m["recall"] == pytest.approx(0.75)
    cm = {r["column"]: r for r in column_metrics(v, truth).collect()}
    assert cm["ounces"]["f1"] == 1.0 and cm["state"]["recall"] == 0.0


def test_suggest_rules_dispatch(spark, sf_tables):
    """Profile-driven suggestions mirror generate_rules_from_profile:
    type/name/null dispatch families."""
    from datalakerulegeneration_spark.profiling import profile_table
    from datalakerulegeneration_spark.rules.suggest import suggest_rules

    prof = profile_table(spark, sf_tables["events"], "events", with_tokens=False)
    out = suggest_rules(prof).collect()
    by_col = {}
    for r in out:
        by_col.setdefault(r.column, []).append(r)
    # id-named columns get a uniqueness suggestion
    assert any(s.rule_type == "unique" for s in by_col["event_id"])
    assert any(s.rule_type == "unique" for s in by_col["user_id"])
    # numeric columns get a type rule
    assert any(s.kind == "type" for s in by_col["value"])
    # every suggestion carries a compiler-ready rule_type and a message
    assert all(s.rule_type and s.message.startswith(s.column) for s in out)


def test_phone_override_violations_oracle_and_counts(spark, sf_tables, duck):
    """R6's override swaps in the NANP regex and catches exactly the
    planted malformations (trailing letter, missing digit group); the
    R12 boolean enum catches exactly the planted 'maybe' rows."""
    from datalakerulegeneration_spark.queries import (
        Q_VIOLATIONS_PHONE_ORACLE,
        q_violations_phone_customer,
    )

    v = q_violations_phone_customer(spark, "/root/testdata/sf0.001")
    got = sorted(tuple(r) for r in v.collect())
    exp = sorted(tuple(r) for r in duck.execute(Q_VIOLATIONS_PHONE_ORACLE).fetchall())
    assert got == exp and len(got) > 0
    n = sf_tables["customer"].count()
    keys = [r["c_custkey"] for r in sf_tables["customer"].select("c_custkey").collect()]
    planted_phone = {k for k in keys if k % 7 == 0 or k % 11 == 0}
    planted_bool = {k for k in keys if k % 13 == 0}
    by_col = {}
    for r in v.collect():
        by_col.setdefault(r["column"], set()).add(int(r["row_id"]))
    assert by_col["phone"] == planted_phone
    assert by_col["active"] == planted_bool
