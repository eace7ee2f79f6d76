"""Physical-plan regression tests: the scale properties COVERAGE.md
claims (pushdown, column pruning, broadcast joins, scan/shuffle
budgets) asserted on the pre-execution plan, so a refactor that
silently de-optimizes a flagship query fails the suite, not just the
bench."""

from __future__ import annotations

import re

import pytest

from datalakerulegeneration_spark import queries as Q
from tests.conftest import SF_DIR


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _impl(name):
    return Q.REGISTRY[name][0]


def test_q6_single_scan_pushdown(spark):
    p = _plan(_impl("q6_forecast_revenue")(spark, SF_DIR))
    assert p.count("FileScan parquet") == 1
    assert "PushedFilters:" in p and "l_shipdate" in p.split("PushedFilters:", 1)[1][:300]
    # projection pruned to exactly the needed columns
    m = re.search(r"ReadSchema: struct<([^>]*)>", p)
    cols = {c.split(":")[0] for c in m.group(1).split(",") if c}
    assert cols == {"l_quantity", "l_extendedprice", "l_discount", "l_shipdate"}


def test_q3_broadcast_no_cartesian(spark):
    p = _plan(_impl("q3_top_orders")(spark, SF_DIR))
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p
    # the segment filter reaches the customer scan
    assert "c_mktsegment" in p.split("PushedFilters:", 1)[1]


def test_violations_fused_single_scan_no_shuffle(spark):
    p = _plan(_impl("violations_events")(spark, SF_DIR))
    assert p.count("FileScan parquet") == 1
    assert "Exchange" not in p


def _scans_outside_caches(p: str) -> list[str]:
    """FileScan signature lines that are NOT inside an InMemoryRelation
    build-plan subtree. Cached relations REPRINT their build plan once
    per consumer (and reprints nest when caches stack), so scan lines
    inside those subtrees are print artifacts; scans OUTSIDE them are
    real derivations. Subtree membership is tracked by tree indent
    (the node text starts after the ':'/'+-' drawing characters; a
    child prints strictly deeper than its parent)."""
    out = []
    imr_stack: list[int] = []
    for ln in p.splitlines():
        body = ln.lstrip(" :+-*")
        if not body:
            continue
        ind = len(ln) - len(body)
        imr_stack = [i for i in imr_stack if i < ind]
        if "InMemoryRelation" in ln:
            imr_stack.append(ind)
        elif "FileScan parquet" in ln and not imr_stack:
            out.append(ln.split("FileScan", 1)[1])
    return out


def test_profiler_scalar_three_pruned_scans(spark):
    p = _plan(_impl("profile_lineitem")(spark, SF_DIR))
    # three DISTINCT scans (wide agg, numeric melt, string melt). The
    # numeric melt sits inside the persisted two-level quartile grain
    # (r12), whose InMemoryRelation build plan is REPRINTED in the plan
    # text once per cached consumer — and when a previous call in the
    # same session already cached the grain, reprints NEST (cache
    # inside cache), so the duplicate count is a print artifact with no
    # fixed bound. r13 (ADVICE r12): bound duplicates PER RELATION —
    # every scan line outside an InMemoryRelation build-plan subtree is
    # a real derivation, and there must be exactly the three distinct
    # ones (a genuine FileScan re-derivation now fails even when some
    # unrelated cached relation is present).
    scans = [ln for ln in p.splitlines() if "FileScan parquet" in ln]
    distinct = {ln.split("FileScan", 1)[1] for ln in scans}
    assert len(distinct) == 3
    # scans outside cache-build subtrees must be duplicate-free (the
    # numeric-melt scan legitimately lives ONLY inside the persisted
    # grain's build plan, so "outside" is a subset of the three)
    outside = _scans_outside_caches(p)
    assert len(outside) == len(set(outside))
    assert set(outside) <= distinct
    # string-branch scan reads ONLY the two string columns (FileScan
    # output lists; ReadSchema strings get truncated in big plans)
    assert any(
        "l_returnflag" in ln and "l_orderkey" not in ln for ln in scans
    )


def test_sessionize_single_shuffle(spark):
    p = _plan(_impl("sessionize_events")(spark, SF_DIR))
    assert p.count("FileScan parquet") == 1
    assert p.count("Exchange") == 1


def test_asof_no_range_join(spark):
    p = _plan(_impl("asof_join_events_orders")(spark, SF_DIR))
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    assert p.count("Window") == 1


def test_q19_disjunctive_predicate_pushed(spark):
    p = _plan(_impl("q19_disjunctive_revenue")(spark, SF_DIR))
    pushed = p.split("PushedFilters:", 1)[1]
    assert "Or(" in pushed


def test_value_and_token_passes_single_scan(spark):
    for name in ("value_stats_customer", "token_stats_documents"):
        p = _plan(_impl(name)(spark, SF_DIR))
        assert p.count("FileScan parquet") == 1, name


def test_fuzzy_decontamination_no_cartesian(spark):
    p = _plan(_impl("decontaminate_fuzzy_documents")(spark, SF_DIR))
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p


def test_pii_scrub_map_only(spark):
    p = _plan(_impl("pii_scrub_documents")(spark, SF_DIR))
    assert p.count("FileScan parquet") == 1
    assert "Exchange" not in p


def test_repetition_single_scan_two_aggs(spark):
    p = _plan(_impl("repetition_stats_documents")(spark, SF_DIR))
    assert p.count("FileScan parquet") == 1
    assert p.count("Exchange") == 2


def test_tfidf_single_text_scan(spark):
    """The corpus text must be scanned/exploded exactly once; the N
    branch is a metadata-only count (empty ReadSchema)."""
    p = _plan(_impl("tfidf_top_terms_documents")(spark, SF_DIR))
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", p)
    assert sum("text" in s for s in schemas) == 1
    assert "CartesianProduct" not in p and "SortMergeJoin" not in p


def test_mixture_ops_scan_budget(spark):
    p = _plan(_impl("source_mix_documents")(spark, SF_DIR))
    assert p.count("FileScan parquet") == 1
    p = _plan(_impl("rebalance_sources_documents")(spark, SF_DIR))
    # full scan + a source-column-only count pass, nothing more
    assert p.count("FileScan parquet") == 2
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", p)
    assert any(s == "source:string" for s in schemas)
    assert "SortMergeJoin" not in p


def test_pack_sequences_no_global_sort(spark):
    """Two-level prefix sum: no task may sort or rank the whole table —
    the only unpartitioned window runs over the n_parts-row bucket
    frame, and the bucket offsets come back via broadcast."""
    p = _plan(_impl("pack_sequences_documents")(spark, SF_DIR))
    assert "BroadcastHashJoin" in p and "SortMergeJoin" not in p
    # exactly one single-partition exchange (the n_parts-row offsets)
    assert p.count("Exchange SinglePartition") == 1


def test_line_dedup_and_ngram_overlap_scan_budget(spark):
    """Both corpus-grain text ops stay within two text scans and never
    cartesian. Join shapes differ BY DESIGN: ngram_overlap broadcasts
    the (small-by-contract) eval gram set, so no sort-merge; line_dedup
    joins corpus × corpus on the line key, where the r4 sf10 audit
    showed the 'optimized' alternative was a static broadcast of the
    whole distinct-line table — its correct plan is a hinted SMJ and
    ZERO broadcasts."""
    for name in ("line_dedup_documents", "ngram_overlap_documents"):
        p = _plan(_impl(name)(spark, SF_DIR))
        schemas = re.findall(r"ReadSchema: struct<([^>]*)>", p)
        assert sum("text" in s for s in schemas) <= 2, name
        assert "CartesianProduct" not in p, name
    p = _plan(_impl("ngram_overlap_documents")(spark, SF_DIR))
    assert "SortMergeJoin" not in p
    p = _plan(_impl("line_dedup_documents")(spark, SF_DIR))
    assert "SortMergeJoin" in p and "BroadcastExchange" not in p


def test_curation_funnel_scan_budget(spark):
    """The funnel must count every stage from SURVIVAL FLAGS in one
    pass — two text scans total (flag chain + the eval-fingerprint
    branch), never one re-derivation per stage."""
    p = _plan(_impl("curation_funnel_documents")(spark, SF_DIR))
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", p)
    assert sum("text" in s for s in schemas) <= 2
    assert "SortMergeJoin" not in p


def test_curate_corpus_scan_budget(spark):
    """Flagship pipeline: ≤4 independent text scans pre-reuse (main
    chain, eval set, packing's bucket-totals branch), no sort-merge
    join, eval anti-join broadcast. AQE additionally dedupes the
    dedup-shuffle via ReusedExchange at runtime."""
    p = _plan(_impl("curate_corpus_documents")(spark, SF_DIR))
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", p)
    assert sum("text" in s for s in schemas) <= 4
    assert "SortMergeJoin" not in p
    assert "BroadcastHashJoin" in p


def test_vocab_coverage_no_global_vocab_window(spark):
    """The rank/cum-share window must run over the k-row top-k result,
    never the vocabulary-sized frame: the term-grain agg feeds a
    TakeOrderedAndProject(limit=k) (parallel partial top-k), and every
    Window node's child chain contains that limit — an unpartitioned
    window directly over the term aggregation would single-task-sort
    10^8+ terms at 100 TB."""
    p = _plan(_impl("vocab_coverage_documents")(spark, SF_DIR))
    assert "TakeOrderedAndProject(limit=50" in p
    lines = p.splitlines()
    win_idx = [i for i, ln in enumerate(lines) if "Window [" in ln]
    assert win_idx, "expected a window over the k-row frame"
    for i in win_idx:
        # the window's subtree must hit the limit before any HashAggregate
        below = "\n".join(lines[i:])
        assert below.index("TakeOrderedAndProject") < below.index("HashAggregate")


def test_near_dup_embeddings_no_cartesian(spark):
    """Registered near-dup plan is the LSH bucket join: no cartesian,
    pairs scored only inside shared (table, bucket)."""
    p = _plan(_impl("near_dup_embeddings")(spark, SF_DIR))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_exact_dedup_digest_keyed_exchange(spark):
    """exact_dedup's shuffle is keyed on md5(text), not the document
    body — the exchange moves 32-char digests at 100 TB."""
    p = _plan(_impl("dedup_exact_documents")(spark, SF_DIR))
    assert "md5(cast(text" in p
    for ln in p.splitlines():
        if "Exchange hashpartitioning" in ln:
            # keyed on the projected digest (_groupingexpression /
            # text_digest), never the raw text attribute
            assert "text_digest" in ln or "_groupingexpression" in ln
            assert not re.search(r"hashpartitioning\(text#", ln)


def test_corpus_joins_never_static_broadcast(spark):
    """sf10 found Catalyst statically broadcasting exploded corpus
    frames (shingles, distinct lines, doc-grain sizes) because their
    size estimate is the pre-explode compressed file size — a 3.9 GiB
    driver OOM at 100x. These ops' joins must be hinted shuffle joins;
    the ONLY broadcasts allowed are small-by-design sides (1-row
    totals, eval sets, n_parts maps), identified here by what they
    are NOT: no broadcast whose key is the shingle/line/doc-size frame.
    The dedup family must carry zero broadcast exchanges at all."""
    for name in ("dedup_minhash_documents", "dedup_ngram_documents",
                 "line_dedup_documents", "simhash_documents",
                 "dup_components_documents", "dedup_exact_documents"):
        p = _plan(_impl(name)(spark, SF_DIR))
        assert "BroadcastExchange" not in p, name
        assert "BroadcastNestedLoopJoin" not in p, name


def test_lsh_signature_single_scan(spark):
    """Multi-table LSH signatures are one projection + posexplode, not
    a union of per-table re-scans (8 tables used to cost 16 scans).
    near_dup additionally re-reads the vector source to re-attach
    vectors AFTER the narrow digest-pair dedup — the deliberate trade
    that keeps the candidate dedup exchange at 32 bytes/pair instead
    of shuffling both vector payloads per collision (a ~40 GB exchange
    at the sf10 stress point); linear columnar re-scans are the cheap
    side of that trade at every scale. The r6 digest-grain collapse
    adds the (digest → id) index and within-cluster expansion paths —
    more STATIC scan nodes, but the heavy subtrees (the distinct-vector
    groupBy feeding signatures, scoring, and self-cosine) end in one
    canonical exchange that ReusedExchange collapses at runtime, so
    payload-width parquet reads stay ~constant while the band join
    stops being quadratic in identical-vector clusters."""
    df = _impl("near_dup_embeddings")(spark, SF_DIR)
    p = _plan(df)
    assert p.count("FileScan parquet") <= 10
    assert "SortMergeJoin" in p  # the vector re-attach joins, estimate-proof
    # the collapsed-grain subtree must actually be REUSED at runtime,
    # not re-executed per consumer
    df.collect()
    executed = df._jdf.queryExecution().executedPlan().toString()
    assert executed.count("ReusedExchange") >= 3
    p = _plan(_impl("ann_topk_lsh_embeddings")(spark, SF_DIR))
    assert p.count("FileScan parquet") <= 2


def test_token_kl_windows_are_scale_safe(spark):
    """token_kl_by_source: corpus term counts must come from a
    TERM-partitioned window (≤ #groups rows per frame); the only
    unpartitioned window sits above the per-group HashAggregate, i.e.
    over a #groups-sized frame — never the vocabulary-sized one."""
    p = _plan(_impl("token_kl_by_source_documents")(spark, SF_DIR))
    lines = p.splitlines()
    win_idx = [i for i, ln in enumerate(lines) if "Window [" in ln]
    assert len(win_idx) >= 2
    part_by_term = [i for i in win_idx if re.search(r"\], \[term#\d+", lines[i])]
    assert part_by_term, "corpus-count window must be partitioned by term"
    for i in set(win_idx) - set(part_by_term):
        below = "\n".join(lines[i:])
        # the per-group agg (keys [grp#..]) runs below the global window
        assert re.search(r"HashAggregate \(.*\n.*", below) or "HashAggregate" in below
        assert below.index("HashAggregate") < below.index("FileScan")


def test_incremental_dedup_digest_keyed_joins(spark):
    """Incremental dedup: the anti join and the keeper groupBy are both
    keyed on the 32-char digest — document bodies never enter an
    exchange, and the corpus side reduces to its digest index."""
    p = _plan(_impl("incremental_dedup_documents")(spark, SF_DIR))
    assert "md5(cast(text" in p
    for ln in p.splitlines():
        if "Exchange hashpartitioning" in ln:
            assert "text_digest" in ln or "_groupingexpression" in ln
            assert not re.search(r"hashpartitioning\(text#", ln)
    assert "LeftAnti" in p


def test_source_overlap_inverted_index_join(spark):
    """Cross-source overlap pairs up only co-occurring shingles via a
    shingle-keyed join: no cartesian, per-source sizes broadcast."""
    p = _plan(_impl("source_overlap_documents")(spark, SF_DIR))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "BroadcastHashJoin" in p  # the #sources-row size frames


def test_window_detector_flags_global_and_passes_partitioned(spark):
    """Self-test for the plan-audit window gate (r4 ADVICE: the regex
    detector was dead — Spark never renders an empty partition list,
    so `], []` cannot match). The fixed detector must flag a known
    global-window plan and pass partitioned / partition-only ones."""
    import sys, os

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from audit_plans import ALLOW, _ALLOW_ITEMS, window_is_global

    from pyspark.sql import Window, functions as F

    # hermetic: an earlier test's persisted frame can CacheManager-
    # plan-dedup a matching subtree here into an InMemoryRelation,
    # erasing the "Window " plan line this test greps for (observed
    # once in a full-suite run; never in isolation)
    spark.catalog.clearCache()
    df = spark.range(100).withColumn("g", F.col("id") % 5)
    global_w = df.withColumn("rk", F.row_number().over(Window.orderBy("id")))
    part_w = df.withColumn("rk", F.row_number().over(Window.partitionBy("g").orderBy("id")))
    part_only_w = df.withColumn("s", F.sum("id").over(Window.partitionBy("g")))

    def win_lines(frame):
        plan = frame._jdf.queryExecution().executedPlan().toString()
        return [ln for ln in plan.splitlines() if "Window " in ln]

    assert any(window_is_global(ln) for ln in win_lines(global_w))
    assert not any(window_is_global(ln) for ln in win_lines(part_w))
    assert not any(window_is_global(ln) for ln in win_lines(part_only_w))

    # a partition expression whose rendering CONTAINS " ASC" must not be
    # misread as an order spec (r5 ADVICE: bare-substring misfire)
    lit_part = df.withColumn(
        "s",
        F.sum("id").over(
            Window.partitionBy(F.concat(F.col("g").cast("string"), F.lit(" ASC x")))
        ),
    )
    assert not any(window_is_global(ln) for ln in win_lines(lit_part))

    # WindowGroupLimit nodes (top-k pushdown) are not Window specs
    assert not window_is_global(
        "+- WindowGroupLimit [g#1], [id#0 ASC NULLS FIRST], row_number(), 10"
    )

    # the r4 ADVICE dup-key finding: every (query, kind) exemption must
    # survive into the built dict — no literal-dict key shadowing
    assert len(_ALLOW_ITEMS) == sum(len(v) for v in ALLOW.values())

    # every exemption must name a REGISTERED query (r5 ADVICE: a ghost
    # entry for a future query silently skips its plan review on ship)
    from datalakerulegeneration_spark import queries as Q

    assert set(ALLOW) <= set(Q.REGISTRY), sorted(set(ALLOW) - set(Q.REGISTRY))


def test_temperature_and_exact_mixture_scan_budget(spark):
    """Mixture variants: counts pass + data pass (the exact variant
    adds one more pruned pass for the (group, bucket) offsets),
    caps/offsets broadcast, corpus never sort-merge-joined."""
    for name, scans in (
        ("temperature_mixture_documents", 2),
        ("target_mixture_exact_documents", 3),
    ):
        p = _plan(_impl(name)(spark, SF_DIR))
        assert p.count("FileScan parquet") == scans, name
        assert "BroadcastHashJoin" in p, name
        assert "SortMergeJoin" not in p, name
        assert "CartesianProduct" not in p, name


def test_decontaminate_embeddings_broadcast_eval(spark):
    """Corpus scanned twice (eval subset + corpus), eval side broadcast
    (BNLJ — the documented brute-force contract), no shuffle wider than
    the per-id max combine."""
    p = _plan(_impl("decontaminate_embeddings")(spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" in p
    assert "SortMergeJoin" not in p and "CartesianProduct" not in p


def test_dsir_two_text_scans_broadcast_lm(spark):
    """DSIR: the tf lineage is replayed once for the bucket LM and once
    for the per-doc scoring (two pruned scans — the totals ride a
    window over the bounded LM frame instead of a third lineage); the
    log-ratio frame comes back as a broadcast hash join."""
    p = _plan(_impl("dsir_weights_documents")(spark, SF_DIR))
    assert p.count("FileScan parquet") == 2
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p and "BroadcastNestedLoopJoin" not in p


def test_pmi_scan_budget_no_global_window(spark):
    """Four logical text lineages (uni ×2 for the w1/w2 joins, pairs,
    size-only totals); AQE reuses the uni exchange at runtime so the
    heavy explode runs once per grain. Top-k is TakeOrderedAndProject,
    never a global sort/window."""
    df = _impl("pmi_collocations_documents")(spark, SF_DIR)
    p = _plan(df)
    assert p.count("FileScan parquet") == 4
    assert "TakeOrderedAndProject" in p
    assert "Window" not in p
    df.collect()
    final = _plan(df)
    assert "ReusedExchange" in final  # uni computed once, joined twice


def test_prefix_jaccard_spillable_verify(spark):
    """The prefix path must not hash-build pair-grain frames: every
    candidate-expansion/size join is sort-merge (the sf1 OOM fix); the
    only ShuffledHashJoins allowed are none at all."""
    p = _plan(_impl("dedup_prefix_jaccard_documents")(spark, SF_DIR))
    assert "ShuffledHashJoin" not in p
    assert "CartesianProduct" not in p
    # prefix ranking windows are (id)-partitioned, never global
    assert "Window" in p


def test_shingle_novelty_single_scan(spark):
    p = _plan(_impl("shingle_novelty_documents")(spark, SF_DIR))
    assert p.count("FileScan parquet") == 1
    assert "CartesianProduct" not in p


def test_intra_line_dedup_single_scan_single_doc_shuffle(spark):
    """Strictly per-document: one scan; exchanges only on the doc key
    (window + reassembly share the doc-id partitioning)."""
    p = _plan(_impl("intra_line_dedup_documents")(spark, SF_DIR))
    assert p.count("FileScan parquet") == 1
    assert "SortMergeJoin" not in p and "BroadcastHashJoin" not in p


def test_registry_oracle_hygiene():
    """Every registry entry either carries a DuckDB oracle SQL string or
    is explicitly exempted in ROWS_ONLY with a reason. A new query that
    silently skips oracle authorship fails here, not at judge time."""
    no_oracle = {n for n, (_, sql) in Q.REGISTRY.items() if sql is None}
    assert no_oracle == set(Q.ROWS_ONLY), (
        f"unexplained no-oracle entries: {sorted(no_oracle - set(Q.ROWS_ONLY))}; "
        f"stale ROWS_ONLY entries: {sorted(set(Q.ROWS_ONLY) - no_oracle)}"
    )
    for name, reason in Q.ROWS_ONLY.items():
        assert isinstance(reason, str) and len(reason) > 20, name
    # and every oracle is a non-trivial SQL string
    for name, (_, sql) in Q.REGISTRY.items():
        if sql is not None:
            assert isinstance(sql, str) and "SELECT" in sql.upper(), name


def test_parallel_runner_groups_cover_all_modules():
    """tools/run_tests.py's split must cover every test file — a new
    test module that isn't in a group would silently never run under
    the parallel runner. A file listed in MORE than one group (the
    test_ops.py mm split) must be partitioned by complementary -k
    expressions ("X" / "not (X)") so every test still runs exactly
    once."""
    import glob
    import os
    import runpy

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    mod = runpy.run_path(os.path.join(repo, "tools", "run_tests.py"), run_name="imported")
    files_by_group = {
        g: [f for f in fs if f.endswith(".py")] for g, fs in mod["GROUPS"].items()
    }
    listed = [os.path.basename(f) for fs in files_by_group.values() for f in fs]
    ondisk = sorted(
        os.path.basename(p) for p in glob.glob(os.path.join(repo, "tests", "test_*.py"))
    )
    assert sorted(set(listed)) == ondisk, (
        f"missing from GROUPS: {set(ondisk) - set(listed)}; "
        f"stale in GROUPS: {set(listed) - set(ondisk)}"
    )
    dupes = {f for f in listed if listed.count(f) > 1}
    if dupes:
        assert dupes == {"test_ops.py"}  # only the sanctioned mm split
        k_exprs = []
        extra_by_expr: dict[str, list[str]] = {}
        for g, fs in mod["GROUPS"].items():
            if any(f.endswith("test_ops.py") for f in fs):
                assert "-k" in fs, f"group {g} lists test_ops.py without a -k partition"
                expr = fs[fs.index("-k") + 1]
                k_exprs.append(expr)
                extra_by_expr[expr] = [
                    f for f in fs if f.endswith(".py") and not f.endswith("test_ops.py")
                ]
        mm = mod["MM_K"]
        assert f"not ({mm})" in k_exprs and len(k_exprs) == 2
        pos = next(e for e in k_exprs if e != f"not ({mm})")
        # the positive side may carry rider terms selecting whole extra
        # modules (e.g. "or golden" for test_golden_quintet.py); each
        # rider must (a) match the extra file's NAME so its tests are
        # selected via the module id, and (b) match no test_ops.py test
        # name, else that test would run in BOTH groups
        assert pos == mm or pos.startswith(f"({mm}) or ")
        riders = [] if pos == mm else pos[len(f"({mm}) or "):].split(" or ")
        import re as _re

        ops_names = _re.findall(
            r"(?m)^def (test_\w+)",
            open(os.path.join(repo, "tests", "test_ops.py")).read(),
        )
        for t in riders:
            assert not [n for n in ops_names if t in n], (t, "matches test_ops names")
        # every extra module riding the POSITIVE (mm) side must have all
        # its test names selected by a rider; the negative side's extra
        # modules are covered by "not (MM_K)" (collision check below)
        for f in extra_by_expr.get(pos, []):
            names = _re.findall(
                r"(?m)^def (test_\w+)", open(os.path.join(repo, f)).read()
            )
            missed = [n for n in names if not any(t in n for t in riders)]
            assert not missed, (
                f"{f} rides the mm group but these tests match no -k rider"
                f" and would run NOWHERE: {missed}"
            )
    # modules that ride inside a "not (MM_K)" invocation but are NOT
    # themselves split (test_dboost, test_pipeline): a test name
    # matching an MM_K term would be deselected there and run NOWHERE
    # (mm only runs test_ops.py). Enforce zero collisions.
    import re

    subs = [s.strip() for s in mod["MM_K"].split(" or ")]
    for g, fs in mod["GROUPS"].items():
        if "-k" not in fs or not fs[fs.index("-k") + 1].startswith("not ("):
            continue
        for f in fs:
            if not f.endswith(".py") or f.endswith("test_ops.py"):
                continue
            names = re.findall(
                r"(?m)^def (test_\w+)", open(os.path.join(repo, f)).read()
            )
            hits = [n for n in names if any(s in n for s in subs)]
            assert not hits, (
                f"{f} rides in group {g!r} under 'not (MM_K)' but these test"
                f" names match MM_K terms and would run nowhere: {hits}"
            )


def test_mm_group_partition_catches_multimodal_tests():
    """Every test in test_ops.py whose body touches ops.multimodal
    must be selected by the runner's MM_K expression — otherwise the
    'mm has its own JVM' split silently leaves the slow fixture
    synthesis in the ops group."""
    import os
    import re
    import runpy

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    mod = runpy.run_path(os.path.join(repo, "tools", "run_tests.py"), run_name="imported")
    subs = [s.strip() for s in mod["MM_K"].split(" or ")]
    src = open(os.path.join(repo, "tests", "test_ops.py")).read()
    chunks = re.split(r"(?m)^def (test_\w+)", src)
    # chunks: [preamble, name1, body1, name2, body2, ...]
    for name, body in zip(chunks[1::2], chunks[2::2]):
        if "multimodal." in body:
            assert any(s in name for s in subs), (
                f"{name} uses ops.multimodal but MM_K does not select it"
            )
