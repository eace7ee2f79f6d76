"""Golden parity against the reference's OWN published Quintet
benchmark (r9 verdict #1 — the one correctness claim the DuckDB
oracle gate cannot make).

Fixtures under tests/fixtures/quintet/ are byte copies of the
reference's public artifacts:

* ``{beers,flights,hospital,rayyan}/{dirty,clean}.csv`` — the golden
  pairs (reference datasets/Quintet/);
* ``beers_error_cells_published.csv`` — the reference's shipped
  predicted-error set (results/Quintet/beers/error_cells.csv, 17,416
  cells; the hospital cell_errors.csv ships EMPTY — one newline — so
  beers is the only non-trivial published error artifact);
* ``published_profiles.json`` — the reference's shipped
  column_profile.dictionary pickles (dirty-data profiles), converted
  to JSON verbatim (NaN→null, pandas Interval→str).
"""

import csv
import json
import os

import pytest

FIX = os.path.join(os.path.dirname(__file__), "fixtures", "quintet")


def _published_cells():
    with open(os.path.join(FIX, "beers_error_cells_published.csv")) as fh:
        return sorted(
            (r["column_name"], int(r["row_index"]), r["violated_rule"])
            for r in csv.DictReader(fh)
        )


def test_golden_beers_published_artifact(spark):
    """Cell-for-cell replication of the reference's published beers
    error set: same rules in (NOT-NULL + NUMERIC-FORMAT over every
    column, reference detect_error_cells.py:16-32 under the pandas
    default-NA ingest of :func:`pandas_na_normalized`), identical
    17,416 predicted cells out — from the Spark plan AND from the
    DuckDB twin."""
    import duckdb

    from datalakerulegeneration_spark.evaluation.golden import (
        quintet_beers_error_cells,
        quintet_beers_error_cells_oracle,
    )

    pub = _published_cells()
    assert len(pub) == 17416
    got = sorted(map(tuple, quintet_beers_error_cells(spark, FIX).collect()))
    assert got == pub
    exp = sorted(
        map(tuple, duckdb.connect().execute(
            quintet_beers_error_cells_oracle(FIX)
        ).fetchall())
    )
    assert exp == pub


def test_golden_legacy_rule_kinds(spark):
    """The other legacy rule kinds (FIXED LENGTH / STRUCTURED) and the
    unenforced kinds (CATEGORICAL / LIKELY UNIQUE → never flag),
    mirroring reference rule_violations dispatch."""
    import duckdb

    from datalakerulegeneration_spark.evaluation.golden import (
        legacy_error_cells,
        legacy_error_cells_sql,
    )

    rows = [("1", "abc", "a b"), ("2", "abcd", "x_y-1"), ("3", "", "ok")]
    df = spark.createDataFrame(rows, "k string, a string, b string")
    rules = {
        "a": ["FIXED LENGTH FIELD of 3 characters"],
        "b": ["STRUCTURED FIELD (Use regex or pattern validation)",
              "CATEGORICAL FIELD (needs value set)",
              "LIKELY UNIQUE FIELD"],
    }
    got = sorted(
        map(tuple, legacy_error_cells(df, rules, "CAST(k AS BIGINT) - 1").collect())
    )
    # a: len!=3 rows 1 ('abcd') and 2 (''); b: 'a b' has a space (row 0)
    assert got == [
        ("a", 1, "FIXED LENGTH FIELD of 3 characters"),
        ("a", 2, "FIXED LENGTH FIELD of 3 characters"),
        ("b", 0, "STRUCTURED FIELD (Use regex or pattern validation)"),
    ]
    con = duckdb.connect()
    import pandas as pd

    con.register("t", pd.DataFrame(rows, columns=["k", "a", "b"]))
    exp = sorted(map(tuple, con.execute(
        legacy_error_cells_sql("SELECT * FROM t", rules, 'CAST("k" AS BIGINT) - 1')
    ).fetchall()))
    assert exp == got
    # unknown column refuses loudly
    with pytest.raises(ValueError, match="unknown column"):
        legacy_error_cells(df, {"nope": ["MUST NOT be NULL"]}, "1")


def test_golden_profile_parity(spark):
    """Field-level parity with the reference's published dirty-data
    profiles across all four datasets: 19 convention-shared stats × 49
    columns — every comparable field equal, modulo ONE adjudicated
    count cell on rayyan (article_pagination cells_punctuation: the
    reference's cell dispatch sends '-' to the alphabet class — its
    alphabet charset includes ' _-' — before punctuation is tested;
    our charset split differs by design). The r10 journal_issn
    cells_numeric adjudication DISSOLVED in r11: the unexplained
    pickle value was the reference's unsigned one-separator
    cell-numeric regex, which the engine now implements exactly
    (stats.RE_NUMERIC; the movies golden dataset profiles caught the
    divergence).

    Fields NOT compared (different convention by design, SURVEY
    §7.3.4/§7.3.6): word/token family (NLTK vs deterministic
    tokenizer), characters_punctuation/miscellaneous charset split,
    cells_alphabet (reference classifies on the raw cell, we on
    trimmed), dominant_pattern (regex-string vs symbolic alphabet),
    equi-bins (pandas Interval rendering), basic_data_type (taxonomy),
    top_keywords, first_digit (tie order), histogram (modal tie
    order), semantic_domain (model-based)."""
    from datalakerulegeneration_spark.evaluation.golden import load_quintet_pair
    from datalakerulegeneration_spark.profiling import profile_tables

    pub = json.load(open(os.path.join(FIX, "published_profiles.json")))
    MAP = {"Q1": "q1", "Q2": "q2", "Q3": "q3"}
    FIELDS = [
        "row_num", "null_ratio", "distinct_num", "unique_ratio",
        "characters_alphabet", "characters_numeric", "cells_numeric",
        "cells_punctuation", "numeric_min", "numeric_max", "max_digits",
        "max_decimals", "Q1", "Q2", "Q3", "most_freq_value_ratio",
        "max_len", "min_len", "avg_len",
    ]
    ADJUDICATED = {
        ("rayyan", "article_pagination", "cells_punctuation"),
    }
    diffs, total = [], 0
    for ds in ("beers", "flights", "hospital", "rayyan"):
        dirty, _ = load_quintet_pair(spark, ds, FIX)
        prof = profile_tables(
            spark, {ds: dirty}, with_tokens=False, coerce_numeric=True
        )
        ours = {r["column"]: r.asDict() for r in prof.collect()}
        for c in pub[ds]:
            col = c["column_name"].replace(ds + "_", "", 1)
            assert col in ours, f"profiler lost column {ds}.{col}"
            for f in FIELDS:
                total += 1
                pv, ov = c.get(f), ours[col].get(MAP.get(f, f))
                if pv is None and ov is None:
                    continue
                try:
                    ok = (
                        pv is not None
                        and ov is not None
                        and abs(float(pv) - float(ov)) < 1e-9
                    )
                except (TypeError, ValueError):
                    ok = str(pv) == str(ov)
                if not ok:
                    diffs.append((ds, col, f))
    assert total == 931
    assert set(diffs) == ADJUDICATED, diffs


def test_golden_pipeline_metrics(spark):
    """The pinned end-to-end metric vector: full multi-dataset pipeline
    (dirty profiles → DBSCAN eps=0.5/min_samples=1 → sample-column
    sharing → detect → score) over the real golden pairs. Deterministic
    — two consecutive r10 runs produced identical counts; any code
    change that moves these numbers must re-adjudicate here."""
    from datalakerulegeneration_spark.evaluation.golden import run_quintet_golden

    m = run_quintet_golden(spark, FIX)
    got = {ds: (v["tp"], v["fp"], v["fn"]) for ds, v in m.items()}
    assert got == {
        "beers": (1002, 12313, 3360),
        "flights": (4920, 5673, 0),
        "hospital": (472, 2904, 37),
        "rayyan": (828, 4195, 120),
    }
    # ground-truth sizes under the engine's all-string positional diff;
    # flights/hospital coincide exactly with the reference's
    # float-coerced str() diff (4920/509), beers/rayyan differ only by
    # the reference's dtype-coercion artifacts (3357/2873 there —
    # spurious '64.0' vs '64' diffs and NaN-vs-NaN equalities;
    # SURVEY §7.3.6: consciously fixed)
    assert {ds: v["n_truth"] for ds, v in m.items()} == {
        "beers": 4362, "flights": 4920, "hospital": 509, "rayyan": 948,
    }
    # flights recall is total under the reference protocol; beers is
    # the weakest (0.23 — range/pattern rules trained on the dirty
    # side accept its own contamination, the protocol's known
    # property; the engine's default QUALITY protocol — clean
    # profiles, member params — scores better on beers/flights/rayyan;
    # see COVERAGE.md r10 for both vectors and the adjudication).
    assert m["flights"]["recall"] == 1.0
    for ds, v in m.items():
        assert v["recall"] >= 0.2, (ds, v)


def test_golden_legacy_predicate_python_model(spark):
    """Property check: the Spark legacy predicates and the DuckDB twin
    both agree with a pure-python model of the reference generator
    (detect_error_cells.py rule_violations over fillna('')-mapped
    values, Python str.strip() semantics) across the FULL str.strip()
    whitespace domain — ASCII TAB/LF/CR/VT/FF, the \\x1c-\\x1f block,
    NEL, NBSP and the Unicode spaces (r10 ADVICE: the six-char ASCII
    set silently diverged on NBSP-padded scraped cells)."""
    import re as _re

    import duckdb
    import pandas as pd

    from datalakerulegeneration_spark.evaluation.golden import (
        LEGACY_NOT_NULL,
        LEGACY_NUMERIC,
        PANDAS_NA_TOKENS,
        PY_STRIP_WS,
        legacy_error_cells,
        legacy_error_cells_sql,
        pandas_na_normalized,
    )

    # the strip set the engines implement IS Python's
    assert set(PY_STRIP_WS) == {
        chr(c) for c in range(0x11000) if chr(c).isspace()
    }
    ws = " \t\n\r\x0b\x0c"
    vals = [
        "", " ", "\t", "\t 12.5 \n", "12,345", "1.2.3", "N/A", " N/A ",
        "nan", "x", "\x0b9\x0c", "00", ".,", "-5", "12 34", "\r\n",
        "a1", "1a", "NULL", "None", "#N/A", "\t\t", "9" + ws, ws + "9",
        # full-set probes: NBSP / NEL / file-separator / em-space /
        # ideographic-space padding, alone and around numerics
        "\xa07\xa0", "\xa0", "\x857\x85", "\x1c7\x1d", "\u20037",
        "7\u3000", "\u2028", "\x1e", "\xa0N/A\xa0", "\u1680.5\u1680",
    ]
    rows = [(str(i), v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "k string, v string")
    rules = {"v": [LEGACY_NOT_NULL, LEGACY_NUMERIC]}
    got = sorted(
        map(tuple, legacy_error_cells(
            pandas_na_normalized(df), rules, "CAST(k AS BIGINT)"
        ).collect())
    )
    # python model: NA tokens -> '' (pandas fillna of dtype=str default
    # NA parse), then rule_violations semantics with native str.strip()
    exp = []
    for i, raw in enumerate(vals):
        val = "" if raw in PANDAS_NA_TOKENS else raw
        if val.strip() == "":
            exp.append(("v", i, LEGACY_NOT_NULL))
        if not _re.match(r"^[0-9.,]+$", val.strip()):
            exp.append(("v", i, LEGACY_NUMERIC))
    assert got == sorted(exp)
    # DuckDB twin over the NA-normalized frame agrees exactly
    con = duckdb.connect()
    toks = ", ".join(f"'{t}'" for t in PANDAS_NA_TOKENS)
    con.register("raw", pd.DataFrame(rows, columns=["k", "v"]))
    norm = (
        f"SELECT k, CASE WHEN v IN ({toks}) THEN '' ELSE v END AS v FROM raw"
    )
    duck = sorted(map(tuple, con.execute(
        legacy_error_cells_sql(norm, rules, 'CAST("k" AS BIGINT)')
    ).fetchall()))
    assert duck == got


def test_golden_dgov_change_log_parity(spark):
    """The DGov lake pairs ship the reference author's OWN annotated
    change logs (clean_changes.csv: '<row>.<column>,dirty,clean',
    1-based rows, type-suffix-stripped column names). Our positional
    cell diff over the S1 ingest reproduces BOTH years' logs exactly —
    cells, dirty values, and clean values. lake2018's last row carries
    embedded carriage returns inside a quoted field, which is the case
    that forced multiLine onto the S1 reader."""
    import csv as _csv

    from datalakerulegeneration_spark.evaluation.golden import (
        dgov_fixture_dir,
        dgov_truth,
    )

    # dirty header maps to the change log's suffix-stripped spelling
    def strip_suffix(c):
        return c.split("(", 1)[0]

    for ds, n_expected in (("lake2018", 693), ("lake2020", 442)):
        truth = {
            (int(r["row_id"]), strip_suffix(r["column"])): (
                r["dirty_value"], r["clean_value"]
            )
            for r in dgov_truth(spark, ds).collect()
        }
        with open(f"{dgov_fixture_dir()}/{ds}/clean_changes.csv") as fh:
            anno = {}
            for row in _csv.reader(fh):
                key, dirty_v, clean_v = row[0], row[1], row[2]
                ri, col = key.split(".", 1)
                anno[(int(ri), col)] = (dirty_v.strip(), clean_v.strip())
        assert len(anno) == n_expected
        assert set(truth) == set(anno), (
            ds,
            list(set(anno) - set(truth))[:3],
            list(set(truth) - set(anno))[:3],
        )
        # values agree cell-for-cell modulo whitespace RENDERING: the
        # log's values round-tripped embedded CR/LF and space runs
        # through the author's CSV writer, so compare with whitespace
        # runs collapsed (the cell SET above is exact, uncollapsed)
        import re as _re

        def wsn(v):
            return _re.sub(r"\s+", " ", v).strip()

        mism = [
            (k, truth[k], anno[k])
            for k in anno
            if tuple(map(wsn, truth[k])) != tuple(map(wsn, anno[k]))
        ]
        assert not mism, mism[:3]


def test_golden_dgov_pipeline_metrics(spark):
    """Pinned end-to-end vector for the DGov multi-table run: both
    lake-assessment years profile and cluster TOGETHER (genuinely
    related schemas — the reference's own cross-table sharing
    scenario), detection on dirty, scored against the annotated change
    logs. Deterministic across runs; truth sizes equal the logs."""
    from datalakerulegeneration_spark.evaluation.golden import run_dgov_golden

    m = run_dgov_golden(spark)
    assert {ds: (v["tp"], v["fp"], v["fn"]) for ds, v in m.items()} == {
        "lake2018": (208, 359, 485),
        "lake2020": (69, 301, 373),
    }
    assert m["lake2018"]["n_truth"] == 693 and m["lake2020"]["n_truth"] == 442


def test_golden_s1_three_reader_parity(spark, tmp_path):
    """Adversarial CSV parse parity across the THREE readers the
    golden gate rests on: Spark S1 (escape='\"' + multiLine), the
    DuckDB s1_ingest_sql twin, and pandas (the reference's semantics,
    dtype=str keep_default_na=False) — every ingest bug this round
    (backslash-escape mangling, line-split multiline records) was a
    divergence between these. Covers RFC-4180 doubled quotes, embedded
    commas/newlines/CRs inside quoted fields, NA-token lookalikes,
    empty cells, unicode, and space padding (S1 trims spaces, and only
    spaces, by contract)."""
    import csv as _csv

    import duckdb
    import pandas as pd

    from datalakerulegeneration_spark.catalog import read_csv_all_string
    from datalakerulegeneration_spark.evaluation.golden import s1_ingest_sql

    nasty = [
        'plain', 'with,comma', 'with "quotes" inside', 'doubled ""x""',
        'line\nbreak', 'cr\rbreak', 'crlf\r\nboth', '', ' padded ',
        '\ttab-lead', 'N/A', 'NaN', 'null', 'café ünïcode', '12.0 oz',
        '{"a","b"}', "apostrophe's", 'trailing space ', '  ', '0', '-1.5',
    ]
    path = str(tmp_path / "nasty.csv")
    with open(path, "w", newline="") as fh:
        w = _csv.writer(fh)  # QUOTE_MINIMAL = RFC 4180
        w.writerow(["k", "v"])
        for i, v in enumerate(nasty):
            w.writerow([str(i), v])

    # pandas = the reference's semantics; model S1's space-only trim
    # and the S1 CRLF->LF contract (Spark's multiLine parser folds
    # CRLF inside quoted fields; the DuckDB twin mirrors it)
    pdf = pd.read_csv(path, dtype=str, keep_default_na=False)
    expected = {
        r["k"]: r["v"].replace("\r\n", "\n").strip(" ")
        for _, r in pdf.iterrows()
    }
    assert len(expected) == len(nasty)

    got_spark = {
        r["k"]: r["v"] for r in read_csv_all_string(spark, path).collect()
    }
    assert got_spark == expected
    got_duck = dict(
        duckdb.connect().execute(
            f'SELECT "k", "v" FROM ({s1_ingest_sql(path)})'
        ).fetchall()
    )
    assert got_duck == expected
