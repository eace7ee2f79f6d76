"""Full quality pipeline: profile → cluster → share → prepare →
detect → score (the reference's main.py --mode multi flow)."""

import os

import pytest
from pyspark.sql import functions as F

from datalakerulegeneration_spark.pipeline import run_quality_pipeline

KEYS = {
    "nation": "n_nationkey",
    "region": "r_regionkey",
    "supplier": "s_suppkey",
    "customer": "c_custkey",
}


def test_cli_monitor(spark, sf_tables, tmp_path, capsys):
    """--mode monitor: drift report between two parquet loads — schema
    changes and flagged profile shifts surface in the JSON line."""
    from pyspark.sql import functions as F

    from datalakerulegeneration_spark.__main__ import main

    base_dir = str(tmp_path / "base")
    cur_dir = str(tmp_path / "cur")
    ev = sf_tables["events"].select("event_id", "event_type", "value")
    ev.write.parquet(base_dir)
    # planted: value nulled for 20% and type of event_type changed
    (
        ev.withColumn(
            "value",
            F.when(F.col("event_id") % 5 == 0, F.lit(None)).otherwise(F.col("value")),
        )
        .withColumn("event_type", F.length("event_type"))
        .write.parquet(cur_dir)
    )
    out = main(["--mode", "monitor", "--baseline", base_dir, "--input", cur_dir])
    assert out["ok"] is False
    assert any(
        c["column"] == "event_type" and c["status"] == "type_changed"
        for c in out["schema_changes"]
    )
    assert any(
        f["column"] == "value" and abs(f["null_ratio_delta"] - 0.2) < 0.01
        for f in out["flagged_columns"]
    )
    # identical loads are clean
    out2 = main(["--mode", "monitor", "--baseline", base_dir, "--input", base_dir])
    assert out2["ok"] is True and out2["flagged_columns"] == []
    # zero-baseline-mean column: rel shift is undefined, the ABSOLUTE
    # shift must still flag (NULL metrics are drift, not health)
    zb = str(tmp_path / "zb")
    zc = str(tmp_path / "zc")
    ev.withColumn("value", F.lit(0.0)).write.parquet(zb)
    ev.withColumn("value", F.lit(5.0)).write.parquet(zc)
    out3 = main(["--mode", "monitor", "--baseline", zb, "--input", zc])
    assert any(f["column"] == "value" and f["mean_abs_shift"] == 5.0
               for f in out3["flagged_columns"])
    # an EMPTY current load must never report ok
    ze = str(tmp_path / "ze")
    ev.where(F.lit(False)).write.parquet(ze)
    out4 = main(["--mode", "monitor", "--baseline", base_dir, "--input", ze])
    assert out4["ok"] is False and len(out4["flagged_columns"]) > 0


def test_cli_main(spark, tmp_path, capsys):
    """python -m datalakerulegeneration_spark --mode multi over a
    discovered dataset-folder tree (the reference's main.py surface)."""
    import csv as _csv
    import json as _json

    from datalakerulegeneration_spark.__main__ import main

    d = tmp_path / "lake" / "Quintet" / "beers"
    os.makedirs(d)
    clean_rows = [
        {"index": str(i), "ounces": "12", "city": "portland"} for i in range(30)
    ]
    dirty_rows = [dict(r) for r in clean_rows]
    dirty_rows[4]["ounces"] = "not-a-number"
    for kind, rows in (("clean", clean_rows), ("dirty", dirty_rows)):
        with open(d / f"{kind}.csv", "w", newline="") as f:
            w = _csv.DictWriter(f, fieldnames=["index", "ounces", "city"])
            w.writeheader()
            w.writerows(rows)
    out = main(
        [
            "--mode", "multi", "--data-root", str(tmp_path / "lake"),
            "--dataset-group", "Quintet", "--key-column", "index",
            "--output", str(tmp_path / "res"),
        ]
    )
    printed = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert printed == {"mode": "multi", "tables": {"beers": out["tables"]["beers"]}}
    m = out["tables"]["beers"]
    assert m["tp"] >= 1 and m["fn"] == 0
    assert os.path.isdir(str(tmp_path / "res" / "beers_violations"))


def test_error_type_breakdown(spark):
    """Per-error-type recall: detected/missed truth cells aggregate by
    their annotated type; unannotated cells report 'unknown'."""
    from datalakerulegeneration_spark.evaluation import error_type_breakdown

    truth = spark.createDataFrame(
        [("a", "1"), ("a", "2"), ("b", "3"), ("b", "4")], "column string, row_id string"
    )
    viol = spark.createDataFrame(
        [("a", "1", "r", "v"), ("b", "3", "r", "v")],
        "column string, row_id string, rule string, value string",
    )
    et = spark.createDataFrame(
        [("a", "1", "typo"), ("a", "2", "typo"), ("b", "3", "missing")],
        "column string, row_id string, error_type string",
    )
    rows = {r["error_type"]: r for r in error_type_breakdown(viol, truth, et).collect()}
    assert rows["typo"]["n_errors"] == 2 and rows["typo"]["n_detected"] == 1
    assert rows["missing"]["recall"] == 1.0
    assert rows["unknown"]["n_errors"] == 1 and rows["unknown"]["n_detected"] == 0


def test_pipeline_perfect_detection(spark, sf_tables):
    clean = {k: sf_tables[k] for k in KEYS}
    dirty = dict(clean)
    dirty["customer"] = (
        sf_tables["customer"]
        .withColumn("c_name", F.when(F.col("c_custkey") == 7, F.lit("")).otherwise(F.col("c_name")))
        .withColumn("c_acctbal", F.when(F.col("c_custkey") == 11, F.lit(9.9e9)).otherwise(F.col("c_acctbal")))
        .withColumn(
            "c_mktsegment",
            F.when(F.col("c_custkey") == 23, F.lit("B!LDING#7")).otherwise(F.col("c_mktsegment")),
        )
    )
    res = run_quality_pipeline(spark, clean, dirty, key_cols=KEYS)
    m = res["tables"]["customer"]["metrics"]
    # null-in-non-nullable, out-of-range numeric, malformed categorical:
    # all three caught, nothing else flagged
    assert m["tp"] == 3 and m["fp"] == 0 and m["fn"] == 0
    assert m["f1"] == 1.0
    # clean tables must yield zero violations
    for name in ("nation", "region", "supplier"):
        tm = res["tables"][name]["metrics"]
        assert tm["tp"] == 0 and tm["fp"] == 0 and tm["fn"] == 0


def test_pipeline_on_all_string_csv(spark, tmp_path):
    """The reference's real modality: dirty/clean CSV pairs ingested
    all-string (dataset.py semantics) — type inference, rule gating,
    and detection must work from strings alone."""
    import csv as _csv

    from datalakerulegeneration_spark.catalog import read_csv_all_string

    clean_rows = [
        {"index": str(i), "ounces": "12", "abv": "0.05", "city": "portland"}
        for i in range(40)
    ]
    dirty_rows = [dict(r) for r in clean_rows]
    dirty_rows[3]["ounces"] = "12.0 oz"   # unit-suffix noise
    dirty_rows[7]["abv"] = "9.5"          # out of observed range
    dirty_rows[11]["index"] = ""          # null in key

    for name, rows in (("clean", clean_rows), ("dirty", dirty_rows)):
        p = tmp_path / f"{name}.csv"
        with open(p, "w", newline="") as f:
            w = _csv.DictWriter(f, fieldnames=["index", "ounces", "abv", "city"])
            w.writeheader()
            w.writerows(rows)

    clean = read_csv_all_string(spark, str(tmp_path / "clean.csv"))
    dirty = read_csv_all_string(spark, str(tmp_path / "dirty.csv"))
    res = run_quality_pipeline(
        spark, {"beers": clean}, {"beers": dirty}, key_cols={"beers": "index"}
    )
    m = res["tables"]["beers"]["metrics"]
    # all three planted errors found; note the empty-key row breaks the
    # key join for ground truth of that row — detection still flags it
    v = res["tables"]["beers"]["violations"]
    flagged = {(r["column"], r["row_id"]) for r in v.collect()}
    assert ("ounces", "3") in flagged
    assert ("abv", "7") in flagged
    assert ("index", "") in flagged
    assert m["fp"] <= 1  # at most the key-join artifact


def test_cluster_sample_param_source(spark):
    """Parity mode: params come from the cluster's sample column (min
    unique_id member satisfying the rule), not the member's own
    profile — reference rules/evaluation.py:449-655 semantics."""
    from datalakerulegeneration_spark.clustering import (
        cluster_columns_dbscan,
        shared_rules_by_threshold,
    )
    from datalakerulegeneration_spark.pipeline import generate_bindings
    from datalakerulegeneration_spark.profiling import profile_tables
    from datalakerulegeneration_spark.rules import load_all_rules

    # two numeric columns with identical shape but different ranges —
    # they cluster together; the sample column is the min unique_id
    rows_a = [(float(i % 50),) for i in range(200)]
    rows_b = [(float(i % 50) + 1000.0,) for i in range(200)]
    ta = spark.createDataFrame(rows_a, "val double")
    tb = spark.createDataFrame(rows_b, "val double")
    profiles = profile_tables(spark, {"aa": ta, "bb": tb}, with_tokens=False)
    clusters = cluster_columns_dbscan(profiles, eps=10.0, min_samples=1)
    rules = load_all_rules()
    shared = shared_rules_by_threshold(profiles, clusters, rules, threshold=0.5)

    member = generate_bindings(profiles, clusters, shared, rules, "bb")
    parity = generate_bindings(
        profiles, clusters, shared, rules, "bb", param_source="cluster_sample"
    )
    m_range = {b.rule.name: b.params for b in member if "lo" in (b.params or {})}
    p_range = {b.rule.name: b.params for b in parity if "lo" in (b.params or {})}
    assert m_range and p_range
    # member mode: bb's own range (≥1000); parity mode: aa's range
    for params in m_range.values():
        assert params["lo"] >= 1000.0
    for params in p_range.values():
        assert params["lo"] == 0.0 and params["hi"] == 49.0


def test_pipeline_artifacts(spark, sf_tables):
    clean = {k: sf_tables[k] for k in ("nation", "region")}
    res = run_quality_pipeline(spark, clean, clean, key_cols=KEYS)
    assert res["profiles"].count() == 5
    assert res["clusters"].count() == 5
    assert res["shared_rules"].count() > 0


def test_cli_curate_mode(spark, tmp_path, capsys):
    """--mode curate runs the curation pipeline on a parquet corpus and
    writes a partitioned manifest."""
    import json as _json
    import os

    from datalakerulegeneration_spark.__main__ import main

    out_dir = str(tmp_path / "manifest")
    res = main([
        "--mode", "curate",
        "--input", "/root/testdata/sf0.001/documents.parquet",
        "--output", out_dir,
        "--seq-len", "512",
    ])
    assert res["kept_docs"] > 0 and res["kept_docs"] < res["input_docs"]
    assert res["packs"] == (res["tokens"] - 1) // 512 + 1
    back = spark.read.parquet(out_dir)
    assert back.count() == res["kept_docs"]
    assert any(d.startswith("grp=") for d in os.listdir(out_dir))


def test_cli_dedup_mode(spark, sf_tables, tmp_path, capsys):
    """--mode dedup prints the dedup report card: exact-dup mass,
    near-dup pairs at the threshold, novelty distribution."""
    import json

    from datalakerulegeneration_spark.__main__ import main

    src = str(tmp_path / "docs")
    sf_tables["documents"].write.parquet(src)
    out = main(["--mode", "dedup", "--input", src, "--share-threshold", "0.2"])
    assert out["docs"] == 500
    assert out["exact_distinct"] <= out["docs"]
    assert out["exact_dup_rows"] == out["docs"] - out["exact_distinct"]
    assert out["near_dup_pairs"] > 0
    assert 0.0 <= out["novelty_min"] <= out["novelty_mean"] <= 1.0
    printed = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert printed == out


def test_cli_score_mode(spark, sf_tables, tmp_path):
    """--mode score trains the DSIR LM on --target-expr exemplars,
    scores the corpus, and (with a threshold) writes the kept subset."""
    from datalakerulegeneration_spark.__main__ import main

    src = str(tmp_path / "docs")
    sf_tables["documents"].write.parquet(src)
    outdir = str(tmp_path / "kept")
    out = main([
        "--mode", "score", "--input", src,
        "--target-expr", "source = 'src0'",
        "--min-log-importance", "-30.0",
        "--output", outdir,
    ])
    assert out["docs"] == 500
    assert 0 < out["kept_docs"] < 500
    assert spark.read.parquet(outdir).count() == out["kept_docs"]


def test_cli_curate_budget_and_sft_modes(spark, tmp_path):
    """--token-budget bounds the kept tokens; --sft-max-tokens switches
    the output convention to padded batches and writes a partitioned
    corpus; both report coherent JSON."""
    from datalakerulegeneration_spark.__main__ import main
    from datalakerulegeneration_spark.catalog import load_sf_tables

    src = str(tmp_path / "docs")
    load_sf_tables(spark, "/root/testdata/sf0.001", ("documents",))["documents"].write.parquet(src)

    base = main(["--mode", "curate", "--input", src])
    budget = main(["--mode", "curate", "--input", src, "--token-budget", "10000"])
    assert budget["tokens"] <= 10000 < base["tokens"]
    assert 0 < budget["kept_docs"] < base["kept_docs"]

    out_dir = str(tmp_path / "sft")
    sft = main(["--mode", "curate", "--input", src, "--sft-max-tokens", "2048", "--output", out_dir])
    assert sft["kept_docs"] == base["kept_docs"]  # same curation stages
    assert sft["batches"] > 0 and sft["unbatchable_docs"] == 0
    import os

    assert any(p.startswith("grp=") for p in os.listdir(out_dir))


def test_curate_corpus_ccnet_composition(spark):
    """The CCNet variant (r8): boilerplate-only docs drop at line
    dedup, non-target-language docs drop at the language stage, the
    tail perplexity bucket drops, and the standard chain then runs on
    the CLEANED text; the ccnet funnel's stage rows agree with the
    manifest and are monotone non-increasing from stage 1 on."""
    from datalakerulegeneration_spark.ops import curate

    boiler = "copyright footer nav terms"
    # 'the ' * i varies each doc's share of the corpus's most frequent
    # token, so the unigram-LM scores (and the perplexity buckets)
    # actually spread instead of landing in one tie
    rows = [
        (i, f"{'the ' * i}data value number n{i} alpha beta gamma delta\n{boiler}", "s0")
        for i in range(1, 13)
    ]
    rows.append((50, f"der die und das ist ein haus mit nicht\n{boiler}", "s0"))
    rows.append((51, boiler, "s0"))
    df = spark.createDataFrame(rows, "doc_id bigint, text string, source string")

    out = curate.curate_corpus(
        df, quality_min=0.0, cap_share=1.0, seq_len=64, eval_mod=97, ccnet_lang="en"
    )
    ids = {r["id"] for r in out.collect()}
    assert 50 not in ids and 51 not in ids
    assert 0 < len(ids) < 12  # the tail perplexity bucket really drops

    fun = {
        r["stage"]: (r["stage_idx"], r["n_docs"])
        for r in curate.curation_funnel_ccnet(
            df, quality_min=0.0, cap_share=1.0, eval_mod=97
        ).collect()
    }
    order = list(curate.CCNET_STAGES) + list(curate.FUNNEL_STAGES[1:])
    assert [s for s, _ in sorted(fun.items(), key=lambda kv: kv[1][0])] == order
    assert fun["raw"][1] == 14
    assert fun["line_dedup"][1] == 13  # boilerplate-only doc gone
    assert fun["language"][1] == 12  # the German doc gone
    assert fun["ccnet_ppl"][1] == len(ids)  # no further drops at these settings
    counts = [fun[s][1] for s in order[1:]]
    assert all(a >= b for a, b in zip(counts, counts[1:]))


def test_curate_corpus_domains_composition(spark):
    """The domain stage-0.1 variant (r8): blocklisted-domain docs never
    reach the manifest, and no registered domain contributes more than
    max_per_domain documents."""
    from datalakerulegeneration_spark.ops import curate, domains

    rows = (
        [(i, f"the data value number n{i} alpha beta", "s0", f"https://www.flood.com/{i}") for i in range(1, 13)]
        + [(20 + i, f"the quick brown fox jumps n{i}", "s0", f"https://sub{i}.evil.org/x") for i in range(3)]
        + [(30, "the plain doc with no url at all", "s0", None)]
    )
    df = spark.createDataFrame(rows, "doc_id bigint, text string, source string, url string")
    out = curate.curate_corpus(
        df, quality_min=0.0, cap_share=1.0, seq_len=64, eval_mod=97,
        url_col="url", blocked_domains=["evil.org"], max_per_domain=4,
    )
    ids = {r["id"] for r in out.collect()}
    assert not ids & {20, 21, 22}  # blocklisted domain gone
    assert 30 in ids  # NULL-url doc survives the blocklist and its own cap group
    flood = {i for i in range(1, 13)} & ids
    assert len(flood) == 4  # the per-domain cap binds
    # survivors are exactly domain_cap(blocklist_filter(df)) fed to the chain
    capped = domains.domain_cap(
        domains.blocklist_filter(df, "url", ["evil.org"]), "doc_id", "url", 4
    )
    assert ids == {r["doc_id"] for r in capped.collect()}


def test_curation_funnel_domains_rows(spark):
    """Domain funnel: stage order, monotone counts from stage 1, and
    the blocklist/cap rows agree with the ops they audit."""
    from datalakerulegeneration_spark.ops import curate, domains

    rows = (
        [(i, f"the data value number n{i} alpha beta", "s0", f"https://www.flood.com/{i}") for i in range(1, 13)]
        + [(20 + i, f"the quick brown fox jumps n{i}", "s0", f"https://sub{i}.evil.org/x") for i in range(3)]
        + [(30, "the plain doc with no url at all", "s0", None)]
    )
    df = spark.createDataFrame(rows, "doc_id bigint, text string, source string, url string")
    fun = {
        r["stage"]: (r["stage_idx"], r["n_docs"])
        for r in curate.curation_funnel_domains(
            df, url_col="url", blocked_domains=["evil.org"], max_per_domain=4,
            quality_min=0.0, cap_share=1.0, eval_mod=97,
        ).collect()
    }
    order = list(curate.DOMAIN_STAGES) + list(curate.FUNNEL_STAGES[1:])
    assert [s for s, _ in sorted(fun.items(), key=lambda kv: kv[1][0])] == order
    assert fun["raw"][1] == 16
    assert fun["blocklist"][1] == 13  # the 3 evil.org docs gone
    capped = domains.domain_cap(
        domains.blocklist_filter(df, "url", ["evil.org"]), "doc_id", "url", 4
    ).count()
    assert fun["domain_cap"][1] == capped == 5  # 4 flood.com + the NULL-url doc
    counts = [fun[s][1] for s in order[1:]]
    assert all(a >= b for a, b in zip(counts, counts[1:]))
