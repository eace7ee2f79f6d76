"""Plan audit: build (never execute) every registered query's physical
plan and flag scale anti-patterns.

This mechanizes the per-round "would this survive 100 TB" review:

* CartesianProduct / BroadcastNestedLoopJoin — unkeyed pair growth;
* unpartitioned Window — single-task sort of the frame below it
  (allowlisted when the frame is bounded by construction: #groups,
  #columns, n_parts, top-k rows — each allowlist entry names why);
* row-at-a-time PythonUDF (BatchEvalPython) — the slow path; Arrow
  (ArrowEvalPython / mapInPandas) is allowed where a codec/model is
  intrinsic;
* single-partition Exchange (`SinglePartition`) feeding more than a
  scalar aggregate.

Usage: python tools/audit_plans.py [names...]   (default: all)
Exit code 1 if any UNALLOWLISTED finding appears — suitable as a gate.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")

# (query, pattern_name, reason) documented exemptions. Every entry must
# say WHY the frame is bounded — "it passes today" is not a reason.
# Built as a tuple list (not a dict literal) so one query can carry
# several exemption kinds without silently shadowing earlier keys; the
# loader below asserts (query, kind) uniqueness.
_ALLOW_ITEMS: list[tuple[str, str, str]] = [
    # unpartitioned windows over frames bounded by construction
    ("vocab_coverage_documents", "global_window", "window runs over the k-row TakeOrderedAndProject result"),
    ("source_mix_documents", "global_window", "#groups-row mixture frame"),
    ("domain_mix_documents", "global_window", "share denominator over the #domains-row counts frame (bounded)"),
    ("token_kl_by_source_documents", "global_window", "#groups-row per-source frame above the grp agg"),
    ("rebalance_sources_documents", "global_window", "#groups-row cap computation"),
    ("target_mixture_documents", "global_window", "#groups-row water-fill frame"),
    ("temperature_mixture_documents", "global_window", "#groups-row water-fill frame (min over group counts)"),
    ("target_mixture_exact_documents", "global_window", "#groups-row water-fill frame (the selection windows are group/bucket-partitioned)"),
    ("token_budget_select_documents", "global_window", "n_bands-row band-offset frame (two-level quality-band prefix sum)"),
    ("hybrid_search_documents", "global_window", "depth-row RRF leg frames (limit before window)"),
    ("curation_funnel_documents", "global_window", "5-row funnel stage frame"),
    ("pack_sequences_documents", "global_window", "n_parts-row bucket-offset frame (two-level prefix sum)"),
    ("pack_manifest_documents", "global_window", "n_parts-row bucket-offset frame"),
    ("pack_stats_documents", "global_window", "n_parts-row bucket-offset frame"),
    ("pack_source_mix_documents", "global_window", "n_parts-row bucket-offset frame (the share window is pack-partitioned)"),
    ("shuffle_documents", "global_window", "n_parts-row bucket-offset frame (two-level rank)"),
    ("curate_corpus_documents", "global_window", "n_parts-row packing offsets inside the pipeline"),
    ("curate_corpus_trained_documents", "global_window", "n_parts-row packing offsets inside the pipeline"),
    ("curate_corpus_trained_documents", "bnlj", "1-row survivor-count/scalar stage constants broadcast"),
    ("curate_corpus_domains_documents", "global_window", "n_parts-row packing offsets inside the pipeline"),
    ("curate_corpus_domains_documents", "bnlj", "1-row survivor-count/scalar stage constants broadcast"),
    ("curate_corpus_neardup_documents", "global_window", "n_parts-row packing offsets"),
    ("curate_corpus_dsir_documents", "global_window", "n_parts-row packing offsets + n_buckets-row DSIR LM frame"),
    ("curate_corpus_budget_documents", "global_window", "n_parts-row packing offsets + n_bands-row band-offset frame (budget stage)"),
    ("curation_funnel_budget_documents", "global_window", "6-row funnel stage frame + n_bands-row band-offset frame"),
    ("weighted_sample_documents", "global_window", "k-row top-k result (limit before rank)"),
    ("drift_events_value", "global_window", "O(bins) bin-edge frame"),
    ("drift_embeddings_projected", "global_window", "O(bins) bin-edge frame (shared drift machinery)"),
    ("drift_table_events", "global_window", "O(columns x bins) stacked bin frame"),
    ("ks_events_value", "global_window", "n_parts-row two-level cumulative offsets"),
    ("wasserstein_events_value", "global_window", "n_parts-row two-level cumulative offsets"),
    ("ks_table_events", "global_window", "n_parts-row offsets per stacked column"),
    ("wasserstein_table_events", "global_window", "n_parts-row offsets per stacked column"),
    ("grouped_quantiles_events", "global_window", "(#keys x |qs|)-row rank-literal frame"),
    ("quantile_drift_events", "global_window", "|qs|-row quantile frames both sides"),
    ("mad_outliers_events", "global_window", "n_parts-row offsets inside exact quantiles"),
    ("ccnet_buckets_documents", "global_window", "n_parts-row offsets inside the exact score-quantile engine"),
    ("ccnet_buckets_documents", "bnlj", "(n_buckets-1)-row threshold frame + 1-row totals broadcast"),
    ("curate_corpus_ccnet_documents", "global_window", "n_parts-row packing offsets + the quantile engine's bounded frames"),
    ("curate_corpus_ccnet_documents", "bnlj", "1-row totals + (n_buckets-1)-row threshold frame broadcast (the ccnet_buckets shapes)"),
    ("curation_funnel_ccnet_documents", "global_window", "8-row funnel stage frame + the quantile engine's bounded frames"),
    ("curation_funnel_ccnet_documents", "bnlj", "1-row stage-count constants + (n_buckets-1)-row threshold frame broadcast"),
    ("rollup_events", "global_window", "O(#hours) grain fan-out frame"),
    ("profile_merge_documents", "global_window", "#columns-row merged-state frame"),
    ("eval_correction_orders", "global_window", "#columns-row score vector"),
    ("top_keywords_documents", "global_window", "top-10-per-column keyword frame (bounded by k x #columns)"),
    ("dboost_cords_events", "global_window", "contingency-table frame bounded by the two columns' domain sizes"),
    ("dboost_histogram_events", "global_window", "O(#bands)-row histogram-count frame ranked for the top-2 peaks"),
    # BroadcastNestedLoopJoin from broadcasting a 1-row scalar
    # aggregate (corpus stats) into a scan — THE intended pattern for
    # "every row needs the global constant"; build side is 1 row by
    # construction
    ("three_sigma_events", "bnlj", "1-row (mu, sigma) scalar agg broadcast"),
    ("dboost_histogram_events", "bnlj", "1-row (min, max, n) scalar agg broadcast"),
    ("mad_outliers_events", "bnlj", "1-row median/MAD scalar frames broadcast"),
    ("quantile_drift_events", "bnlj", "|qs|-row quantile frames broadcast both sides"),
    ("bm25_documents", "bnlj", "1-row corpus stats (N, avgdl, df_t) broadcast"),
    ("hybrid_search_documents", "bnlj", "1-row corpus stats + 1-row probe vector broadcast"),
    ("unigram_logprob_documents", "bnlj", "1-row corpus token total broadcast"),
    ("bigram_logprob_documents", "bnlj", "1-row bigram-total scalar broadcast"),
    ("pmi_collocations_documents", "bnlj", "1-row token-total and bigram-total scalar aggs broadcast"),
    ("dsir_weights_documents", "global_window", "n_buckets-row bucket-LM frame (exact BIGINT total sums)"),
    ("decontaminate_embeddings", "bnlj", "constant-size eval-vector frame broadcast (held-out eval suites are small by contract)"),
    ("vocab_coverage_documents", "bnlj", "1-row corpus total broadcast onto the k-row top-k"),
    ("tfidf_top_terms_documents", "bnlj", "1-row doc-count scalar broadcast"),
    ("curate_corpus_documents", "bnlj", "1-row survivor-count/scalar stage constants broadcast"),
    ("curate_corpus_neardup_documents", "bnlj", "1-row stage constants broadcast"),
    ("curate_corpus_dsir_documents", "bnlj", "1-row stage constants broadcast (pipeline total)"),
    ("curation_funnel_documents", "bnlj", "1-row stage-count constants broadcast"),
    ("curation_funnel_domains_documents", "bnlj", "1-row stage-count constants broadcast"),
    ("curation_funnel_domains_documents", "global_window", "7-row funnel stage frame"),
    ("curate_corpus_budget_documents", "bnlj", "1-row stage constants broadcast (pipeline total)"),
    ("curate_sft_batches_documents", "bnlj", "1-row stage constants broadcast (pipeline total)"),
    ("curation_funnel_budget_documents", "bnlj", "1-row stage-count constants broadcast"),
    ("drift_events_value", "bnlj", "1-row bin-edge scalar aggs broadcast"),
    ("drift_embeddings_projected", "bnlj", "1-row bin-edge scalar aggs broadcast (projection PSI shares the drift plan)"),
    ("drift_table_events", "bnlj", "1-row per-column edge scalars broadcast"),
    # BroadcastNestedLoopJoin from broadcasting a constant-size probe /
    # candidate frame into a corpus scan (the documented brute-force
    # retrieval shape: small probe set vs huge corpus)
    ("ann_topk_embeddings", "bnlj", "constant-size probe set broadcast (brute-force contract)"),
    ("ann_recall_embeddings", "bnlj", "constant-size probe set broadcast in both legs"),
    ("ann_topk_ivf_embeddings", "bnlj", "n_lists-row centroid table broadcast"),
    ("semdedup_frozen_embeddings", "bnlj", "k_cells-row frozen centroid table broadcast (assignment crossJoin; pairwise compare is cell-keyed)"),
    ("cluster_columns_frozen_profiles", "bnlj", "k-row frozen centroid table broadcast against the #columns-row profile frame (both bounded by construction)"),
    ("quality_psi_documents", "bnlj", "1-row current-total scalar agg broadcast into the n_bins-row PSI frame"),
    ("ann_topk_ivf_sq8_embeddings", "bnlj", "n_lists-row centroid table + 1-row codebook broadcast"),
    ("quantized_topk_embeddings", "bnlj", "probe codes + 1-row codebook broadcast"),
    ("projected_topk_embeddings", "bnlj", "constant-size projected probe set broadcast"),
    ("pca_topk_embeddings", "bnlj", "constant-size PCA-projected probe set broadcast"),
    ("pca_recall_embeddings", "bnlj", "constant-size probe set broadcast in both legs (exact + full-rank PCA)"),
    ("ann_topk_pq_embeddings", "bnlj", "constant-size reconstructed probe set broadcast"),
    ("ann_index_search_embeddings", "bnlj", "constant-size reconstructed probe set broadcast against the persisted codes scan"),
    ("ann_topk_ivf_pq_embeddings", "bnlj", "n_lists-row centroid table + m*ksub-row anchor codebook broadcast"),
    ("ann_rerank_pq_embeddings", "bnlj", "constant-size probe frames broadcast in the pre-rank and re-rank stages"),
    ("hll_overlap_events", "bnlj", "#groups-row distinct-group frame crossed into pairs (group_a < group_b)"),
    # non-equi self-joins over frames reduced to distinct values first
    ("levenshtein_conflicts_part", "bnlj", "distinct-brand values frame (|domain|^2 pairs, domain is enum-sized)"),
    # profile-grain cartesians: one row per COLUMN, not per data row
    ("column_match_customer_supplier", "cartesian", "profiles x profiles = #cols_a x #cols_b rows"),
    ("dataset_similarity_tables", "cartesian", "table-profile pairs (#tables^2 rows)"),
    ("cluster_analysis_quintet", "cartesian", "29-row member-profile frame self-joined i<j (pairwise cohesion; #columns^2 grain, the sanctioned matcher class)"),
    ("match_scores_beers_pair", "cartesian", "11x11 profile-frame crossJoin (the J5 matcher grain — one row per COLUMN pair, same class as column_match_customer_supplier)"),
    ("match_scores_beers_permuted", "cartesian", "11x11 profile-frame crossJoin (the J5 matcher grain over the renamed/permuted discrimination control)"),
    ("dataset_profile_beers_golden", "bnlj", "1-row row-count frame broadcast onto the 1-row dataset-profile aggregate (per-row normalization constant)"),
    ("dataset_profile_estuary_golden", "bnlj", "1-row row-count frame broadcast onto the 1-row dataset-profile aggregate (per-row normalization constant)"),
    ("trained_common_patterns_quintet", "global_window", "<=#members-row modal-pattern frame ranked for the published top-5 (column-profile grain)"),
    # 1-row scalar-subquery broadcasts in rule evaluation / TPC-H spec
    ("violations_stats_orders", "bnlj", "1-row column stats (mean/std/modal) broadcast by the engine"),
    ("violations_suppressor_orders", "bnlj", "1-row column stats broadcast by the engine"),
    ("eval_correction_orders", "bnlj", "1-row detection/correction scalar scores broadcast"),
    ("q11_important_parts", "bnlj", "1-row value-total scalar (the HAVING fraction) broadcast — TPC-H spec"),
    ("q22_idle_customers", "bnlj", "1-row avg(acctbal) scalar broadcast — TPC-H spec"),
    ("dedup_agreement_documents", "cartesian", "3-row method-size frames crossed (3x3 matrix grain)"),
    ("corpus_report_documents", "bnlj", "1-row digest-aggregate frame broadcast onto the 1-row wide agg"),
]


def _build_allow(items: list[tuple[str, str, str]]) -> dict[str, dict[str, str]]:
    allow: dict[str, dict[str, str]] = {}
    for query, kind, reason in items:
        entry = allow.setdefault(query, {})
        if kind in entry:
            # a real raise, not `assert` — `python -O` strips asserts,
            # which would silently restore the key-shadowing bug
            raise ValueError(f"duplicate exemption ({query}, {kind})")
        entry[kind] = reason
    return allow


ALLOW: dict[str, dict[str, str]] = _build_allow(_ALLOW_ITEMS)


def _top_level_bracket_groups(s: str) -> list[str]:
    """Extract top-level ``[...]`` group contents from a plan fragment."""
    depth = 0
    groups: list[str] = []
    start = 0
    for i, ch in enumerate(s):
        if ch == "[":
            if depth == 0:
                start = i + 1
            depth += 1
        elif ch == "]":
            depth -= 1
            if depth == 0:
                groups.append(s[start:i])
            depth = max(0, depth)
    return groups


def _top_level_elements(group: str) -> list[str]:
    """Split one bracket group's contents on commas that sit at bracket/
    paren depth 0 — the spec's element boundaries."""
    depth = 0
    out: list[str] = []
    start = 0
    for i, ch in enumerate(group):
        if ch in "([":
            depth += 1
        elif ch in ")]":
            depth = max(0, depth - 1)
        elif ch == "," and depth == 0:
            out.append(group[start:i])
            start = i + 1
    out.append(group[start:])
    return out


def window_is_global(line: str) -> bool:
    """True iff a physical-plan ``Window`` line has NO partition spec.

    Spark's WindowExec omits EMPTY spec lists entirely, so the rendered
    shapes are: ``Window [exprs], [partSpec], [ordSpec]`` (3 groups,
    partitioned+ordered), ``Window [exprs], [spec]`` (2 groups — the
    spec is the partition list when unordered, or the ORDER list when
    unpartitioned; order elements carry ``ASC``/``DESC`` markers, which
    disambiguates), and ``Window [exprs]`` (1 group, fully global).
    Naive regexes on ``], []`` can never fire — the empty list is never
    rendered (the r4 ADVICE dead-detector finding).
    """
    import re

    stripped = line.strip()
    # strip the tree-drawing prefix (+- :- etc.) up to the node name;
    # matching "Window [" (not "Window ") also excludes WindowGroupLimit
    # by construction — no separate guard needed
    idx = stripped.find("Window [")
    if idx < 0:
        return False
    groups = _top_level_bracket_groups(stripped[idx + len("Window ") :])
    if len(groups) >= 3:
        return False
    if len(groups) == 2:
        # second group is an ORDER spec (→ global) iff its top-level
        # elements END with a sort-direction rendering
        # "<expr> ASC|DESC NULLS FIRST|LAST" — anchored at element end
        # so a string literal inside a partition expression can only
        # misfire if it is the element's final token sequence, not
        # anywhere a bare " ASC" substring appears
        marker = re.compile(r"\s(ASC|DESC)\s+NULLS\s+(FIRST|LAST)\s*$")
        return any(marker.search(el) for el in _top_level_elements(groups[1]))
    return True


def audit_plan(name: str, plan: str, allow: dict[str, str]) -> list[tuple[str, str, str]]:
    """Scan one executed-plan string; return unallowlisted findings."""
    findings: list[tuple[str, str, str]] = []
    if "CartesianProduct" in plan and "cartesian" not in allow:
        findings.append((name, "cartesian", "CartesianProduct in plan"))
    if "BroadcastNestedLoopJoin" in plan and "bnlj" not in allow:
        findings.append((name, "bnlj", "BroadcastNestedLoopJoin in plan"))
    if "BatchEvalPython" in plan and "row_udf" not in allow:
        findings.append((name, "row_udf", "row-at-a-time Python UDF on the path"))
    for ln in plan.splitlines():
        if "Window " in ln and window_is_global(ln):
            if "global_window" not in allow:
                findings.append((name, "global_window", ln.strip()[:100]))
            break
    return findings


def main() -> int:
    import __spark_entry__ as entrymod
    from datalakerulegeneration_spark.session import get_spark

    spark = get_spark("plan_audit", extra_conf={"spark.ui.showConsoleProgress": "false"})
    qs = entrymod.queries()
    # an exemption for a nonexistent query is latent rot: when the name
    # later ships (or a typo hides a real one), its plan skips review
    # silently — fail the audit itself instead
    unknown = set(ALLOW) - set(qs)
    if unknown:
        raise ValueError(f"allowlist entries for unregistered queries: {sorted(unknown)}")
    names = sys.argv[1:] or list(qs)
    findings: list[tuple[str, str, str]] = []
    for name in names:
        try:
            df = qs[name](spark, SF_DIR)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001
            findings.append((name, "plan_error", str(e)[:120]))
            continue
        findings.extend(audit_plan(name, plan, ALLOW.get(name, {})))
    spark.stop()
    if findings:
        for name, kind, detail in findings:
            print(f"FLAG {name}: {kind} — {detail}")
        print(f"\n{len(findings)} finding(s)")
        return 1
    print(f"clean: {len(names)} plans, 0 unallowlisted findings")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
