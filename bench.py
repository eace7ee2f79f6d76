"""Benchmark: headline queries at $SPARK_GRAFT_SF_DIR on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is executed to completion (collect with results discarded);
the first run of the session pays JVM/codegen warmup, so a tiny warmup
query runs first and is not counted.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from datalakerulegeneration_spark import queries as Q
from datalakerulegeneration_spark.session import get_spark

# The registry's public ``queries()`` wraps each entry in a prepared-plan
# cache (legitimate engine feature: identical repeated calls reuse the
# analyzed plan). The bench deliberately BYPASSES it: re-collecting the
# same physical plan lets AQE reuse already-materialized shuffle stages,
# which would turn the timed pass into a result-cache measurement. Each
# timed run below builds a fresh plan and executes it against cold data
# — end-to-end latency as a first-time caller sees it.
_IMPLS = {name: impl for name, (impl, _) in Q.REGISTRY.items()}

BENCH_QUERIES = [
    "profile_lineitem",
    "q1_pricing_summary",
    "q6_forecast_revenue",
    "q3_top_orders",
    "q5_nation_revenue",
    "q10_returned_items",
    "q18_large_volume",
    "q19_disjunctive_revenue",
    "q9_product_profit",
    "q13_customer_distribution",
    "q21_waiting_suppliers",
    "latest_events_per_user",
    "three_sigma_events",
    "violations_events",
    "fd_conflicts_orders",
    "dedup_minhash_documents",
    "simhash_documents",
    "ann_topk_embeddings",
    "token_count_documents",
    "quality_score_documents",
    "sessionize_events",
    "asof_join_events_orders",
    "chunk_documents",
    "eval_metrics_orders",
    "repetition_stats_documents",
    "tfidf_top_terms_documents",
    "pack_sequences_documents",
    "curate_corpus_documents",
    "ngram_overlap_documents",
    "line_dedup_documents",
    "clean_text_documents",
    "multimodal_wav_decode_documents",
    "curation_funnel_documents",
    "json_props_events",
    "dedup_exact_documents",
    "near_dup_embeddings",
    "vocab_coverage_documents",
    "ks_table_events",
    "wasserstein_table_events",
    "range_join_events_orders",
    "rollup_events",
    "mad_outliers_events",
    "weighted_sample_documents",
    "bm25_documents",
    "hybrid_search_documents",
    "token_kl_by_source_documents",
    "quantized_topk_embeddings",
    "ann_topk_ivf_sq8_embeddings",
    "ann_topk_pq_embeddings",
    # the amortized production path: first (cold) call builds the
    # persisted index, warm passes measure search-only
    "ann_index_search_embeddings",
    "projected_topk_embeddings",
    "embedding_dup_components",
    "incremental_dedup_documents",
    "source_overlap_documents",
    "ngram_overlap_multi_documents",
    "keep_best_documents",
    "corpus_report_documents",
    "cm_heavy_hitters_events",
    "span_dedup_documents",
    "bloom_decontaminate_documents",
    "hll_distinct_users_events",
    "bloom_ngram_decon_documents",
    "dedup_prefix_jaccard_documents",
    "temperature_mixture_documents",
    "pmi_collocations_documents",
    "decontaminate_embeddings",
    "dsir_weights_documents",
    "shingle_novelty_documents",
    "intra_line_dedup_documents",
    "target_mixture_exact_documents",
    "image_dhash_documents",
    "audio_fingerprint_documents",
    "video_frame_dhash_documents",
    # the three multimodal *_near_dups queries are correctness-gated but
    # NOT benched: their runtime is fixture-family-density (pairs grow
    # quadratically in the planted family size — COVERAGE.md), so the
    # number would grade the fixture, not the engine
    "pca_topk_embeddings",
    "curate_corpus_dsir_documents",
    "curate_corpus_budget_documents",
    "bigram_logprob_documents",
    "centroid_outliers_embeddings",
    "hll_overlap_events",
    "ngram_diversity_documents",
    "drift_embeddings_projected",
    "group_split_documents",
    "token_budget_select_documents",
    "token_budget_by_group_documents",
    "quality_sweep_documents",
    "ccnet_buckets_documents",
    "dup_weights_documents",
    "compression_ratio_documents",
    "pack_source_mix_documents",
    "length_batches_documents",
    "padding_waste_documents",
    "curate_sft_batches_documents",
    "epoch_plan_documents",
    "epoch_expand_documents",
    "bpe_learn_documents",
    "bpe_encode_documents",
    "curate_corpus_ccnet_documents",
    "curation_funnel_ccnet_documents",
    "url_dedup_documents",
    "domain_mix_documents",
    "domain_cap_documents",
    "domain_blocklist_documents",
    "curate_corpus_domains_documents",
    "curation_funnel_domains_documents",
    "quality_classifier_score_documents",
    "semdedup_frozen_embeddings",
    "curate_corpus_trained_documents",
    "bpe_fertility_by_lang_documents",
    "dboost_mixture_frozen_lineitem",
    "cluster_columns_frozen_profiles",
    "quality_psi_documents",
    "quintet_beers_errors",
    "quintet_beers_profile",
    "quintet_beers_truth",
    "quintet_hospital_truth",
    "quintet_rayyan_truth",
    "dgov_lake2018_truth",
    # r11 golden additions: the published trained-rules/cluster-analysis
    # replication, the matcher benchmark pair, and the third/fourth
    # golden groups' truth diffs
    "trained_rules_ranges_quintet",
    "cluster_analysis_quintet",
    "trained_common_patterns_quintet",
    "match_scores_beers_pair",
    "quintet_movies1_truth",
    "temp_lake2008_truth",
    "temp_estuary2008_truth",
    "dgov_lake2020_truth",
    "profile_approx_check_lineitem",
    "compression_fixture_docs",
    # r11 tail registration that missed the r11 headline (r11 verdict
    # item 2) + the r12 additions: the dBoost fizzbuzz golden pair, the
    # matcher discrimination control, and the estuary dataset profile
    "dataset_profile_beers_golden",
    "dataset_profile_estuary_golden",
    "dboost_fizzbuzz_golden",
    "dboost_fizzbuzz_parthist_golden",
    "match_scores_beers_permuted",
]


def _env_markers(spark) -> dict:
    """Ambient-load markers recorded WITH the timings: two rounds of
    near-uniform cross-round drift on untouched queries (r4→r5 ~1.1×)
    could not be told apart from a real regression because the bench
    JSON carried no environment evidence. loadavg captures competing
    work on the box; JVM uptime distinguishes a fresh JVM (cold JIT)
    from a long-lived one."""
    try:
        l1, l5, l15 = os.getloadavg()
        load = {"load1": round(l1, 2), "load5": round(l5, 2), "load15": round(l15, 2)}
    except OSError:  # not available on some platforms
        load = {}
    try:
        mf = spark._jvm.java.lang.management.ManagementFactory
        load["jvm_uptime_s"] = round(mf.getRuntimeMXBean().getUptime() / 1000.0, 1)
    except Exception:  # noqa: BLE001 — markers are best-effort
        pass
    return load


# --all mode exclusions: correctness-gated queries whose runtime is
# fixture-family-density (pairs grow quadratically in the planted
# multimodal family size — COVERAGE.md), so a timing would grade the
# fixture, not the engine. Everything else in the registry is timed.
_ALL_EXCLUDE = frozenset(
    {
        "image_near_dups_documents",
        "audio_near_dups_documents",
        "video_near_dups_documents",
    }
)


def _calibration_probe(spark) -> float:
    """Fixed synthetic CPU+shuffle job — the bench's unit ruler.

    Constant work with NO data dependence and NO I/O: 8M generated
    rows, two xxhash64 folds per row, one 1,024-key shuffle + agg.
    Cross-round wall-clock comparisons on this box proved meaningless
    in r9 (the host slowed ~2× mid-round: 160.7 s → 303–432 s on
    untouched queries at equal idle loadavg — .bench/history_all.jsonl),
    so every artifact now carries ``calib_s``: divide any per-query
    time by it to compare rounds in normalized units."""
    t0 = time.time()
    (
        spark.range(0, 8_000_000, 1, 32)
        .selectExpr("id % 1024 AS k", "xxhash64(id, 1) AS h1")
        # pmod keeps the running sum far from LONG range (ANSI throws
        # on overflow); the hash chain is still the CPU work
        .selectExpr("k", "pmod(xxhash64(h1, 2), 1048576) AS h2")
        .groupBy("k")
        .agg({"h2": "sum", "*": "count"})
        .collect()
    )
    return round(time.time() - t0, 3)


def main() -> None:
    run_all = "--all" in sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("bench", extra_conf={"spark.ui.showConsoleProgress": "false"})
    env_start = _env_markers(spark)
    # three probes: the first pays JIT (discarded), min of the next two
    # is the session-start calibration; one more at the end catches a
    # mid-run environment shift
    _calibration_probe(spark)
    calib_start = min(_calibration_probe(spark), _calibration_probe(spark))
    # --all (r8 verdict item 3): time EVERY registered query — the 93
    # non-headline entries (tpch_ext plan-shape family, violations_*,
    # dboost_*) are correctness-gated but were never timed, so a perf
    # regression there was invisible until someone read a plan. One
    # cold + one warm pass (the headline's 2-pass min stays the
    # regression-grade number; this is the tail's smoke alarm),
    # recorded to .bench/bench_all_latest.json + history_all.jsonl.
    names = (
        sorted(set(_IMPLS) - _ALL_EXCLUDE) if run_all else list(BENCH_QUERIES)
    )

    # JIT warmup at the MEASURED sf: AQE picks different physical plans
    # per data size (broadcast vs shuffle, coalesced partitions), so
    # warming at a smaller sf leaves the measured plans cold — the
    # first sf0.1 run would pay fresh codegen. The warmup pass doubles
    # as the COLD measurement (py4j plan construction + analysis +
    # whole-stage codegen + execution — first-call latency); caches are
    # then dropped so the timed passes re-read and re-materialize
    # everything (persisted frames would otherwise be silently reused
    # via CacheManager plan-dedup): the headline measurement is
    # warm-JVM, cold-data — standard JVM bench hygiene.
    # clearCache after EVERY query, not just every pass: an operator
    # that persists internally (and any future one that forgets to
    # unpersist) must not feed the next query's byte-identical subtree
    # through CacheManager plan-dedup — r4's review caught exactly that
    # feeding wasserstein_table from ks_table's grain cache.
    cold: dict[str, float] = {}
    for name in names:
        t0 = time.time()
        _IMPLS[name](spark, sf_dir).collect()
        cold[name] = round(time.time() - t0, 3)
        spark.catalog.clearCache()

    # two timed passes, per-query min: wall-clock on a shared box
    # varies ±30% with ambient load; the min is the least-contended
    # honest measurement (caches are dropped between passes, so each
    # pass re-reads and re-materializes its data). --all runs one warm
    # pass — 194 queries × 3 executions is the wall budget's ceiling.
    # r11 (r10 verdict #3): the --all sweep runs alphabetically, so a
    # transient host spike aliases onto one contiguous family (the r10
    # artifact showed the whole "d" section 3-12× slower while the
    # same queries ran normally in the same-day headline run).
    # Interleave the calibration probe every SEG queries and record
    # per-segment calib_s: each query's normalized time divides by ITS
    # segment's ruler, so ambient load is attributed per-segment
    # instead of polluting per-query history.
    SEG = 25
    calib_segments: list[dict] = []
    timings: dict[str, float] = {}
    seg_of: dict[str, int] = {}
    for _pass in range(1 if run_all else 2):
        for i, name in enumerate(names):
            if run_all and i % SEG == 0:
                calib_segments.append(
                    {"at": i, "calib_s": _calibration_probe(spark)}
                )
            t0 = time.time()
            _IMPLS[name](spark, sf_dir).collect()
            el = round(time.time() - t0, 3)
            if name not in timings or el < timings[name]:
                timings[name] = el
            if run_all:
                seg_of[name] = len(calib_segments) - 1
            spark.catalog.clearCache()

    total = round(sum(timings.values()), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    result = {
        "metric": "all_queries_total_wall" if run_all else "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        # warm = min of two warm-JVM cold-data passes (headline:
        # grades plan EXECUTION); cold = first-ever call incl.
        # py4j build + analysis + codegen (what a one-shot
        # caller pays; dominated by plan/JIT for small queries)
        "queries": timings,
        "queries_cold": cold,
        "total_cold": round(sum(cold.values()), 3),
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        # stable per-pass execution order, so cross-round diffs can
        # tell "query removed" from "tail truncated"
        "query_order": names,
        # ambient-load evidence (see _env_markers)
        "env_start": env_start,
        "env_end": _env_markers(spark),
        # normalization ruler (see _calibration_probe): per-query times
        # divided by calib_s are comparable across rounds/hosts
        "calib_s": calib_start,
        "calib_s_end": _calibration_probe(spark),
        # the headline number in calibration units (total / calib_s)
        "value_norm": round(total / calib_start, 1),
    }
    if run_all:
        # per-segment rulers + per-query normalized times (r11 — see
        # the SEG comment above): t / its segment's calib_s is the
        # cross-round comparable number for the --all tail
        result["calib_segments"] = calib_segments
        result["queries_norm"] = {
            n: round(t / calib_segments[seg_of[n]]["calib_s"], 3)
            for n, t in timings.items()
        }
    # Persist the full object to a file BEFORE printing: the driver
    # archives stdout with a tail cap, and BENCH_r06/r07 both lost the
    # per-query dict to mid-stream truncation (parsed: null two rounds
    # running). The files are the durable artifact.
    out_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench")
    os.makedirs(out_dir, exist_ok=True)
    out_path = os.path.join(
        out_dir, "bench_all_latest.json" if run_all else "bench_latest.json"
    )
    with open(out_path, "w") as fh:
        json.dump(result, fh, indent=1)
        fh.write("\n")
    # append-only history: committed per round, so every round's full
    # per-query dict survives in git even if the stdout artifact is cut
    result["ts"] = time.strftime("%Y-%m-%dT%H:%M:%S")
    hist = "history_all.jsonl" if run_all else "history.jsonl"
    with open(os.path.join(out_dir, hist), "a") as fh:
        fh.write(json.dumps(result) + "\n")
    # Stdout is the COMPACT contract (r7 verdict item 3): one line the
    # driver's 2,000-char tail can never decapitate — totals, env, the
    # slowest-10 warm timings, and the path to the full artifact.
    slowest = dict(sorted(timings.items(), key=lambda kv: -kv[1])[:10])
    compact = {
        "metric": result["metric"],
        "value": total,
        "unit": "sec",
        "queries": slowest,
        "n_queries": len(timings),
        "total_cold": result["total_cold"],
        "sf": result["sf"],
        "env_start": env_start,
        "env_end": result["env_end"],
        "calib_s": result["calib_s"],
        "calib_s_end": result["calib_s_end"],
        "value_norm": result["value_norm"],
        "full": os.path.relpath(out_path, os.path.dirname(os.path.abspath(__file__))),
    }
    print(json.dumps(compact))


if __name__ == "__main__":
    main()
