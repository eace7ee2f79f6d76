"""CLI entry point mirroring the reference's ``main.py`` surface
(main.py:225-237):

    python -m datalakerulegeneration_spark \
        --mode multi --data-root datasets --dataset-group Quintet

Discovers ``<data-root>/<group>/<name>/{dirty,clean}.csv`` pairs,
runs the full quality pipeline (profile → cluster → share → detect →
score) and prints one JSON line of per-table metrics. ``--mode
single`` restricts to one dataset. Violations can be persisted with
``--output``.
"""

from __future__ import annotations

import argparse
import json
import os


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="datalakerulegeneration_spark",
        description="Run clustering and evaluation over dirty/clean dataset pairs.",
    )
    p.add_argument(
        "--mode",
        choices=["single", "multi", "curate", "monitor", "dedup", "score", "golden"],
        default="single",
    )
    # curate mode (beyond-reference): run the corpus curation pipeline
    # on a parquet documents table and write the training manifest
    p.add_argument("--input", default=None, help="curate/monitor: parquet path")
    p.add_argument(
        "--input-format", dest="input_format", choices=["parquet", "jsonl"],
        default="parquet",
        help="curate/monitor: storage format of --input/--baseline",
    )
    # monitor mode: drift report of --input (current load) vs --baseline
    p.add_argument("--baseline", default=None, help="monitor: baseline parquet path")
    p.add_argument(
        "--null-delta", dest="null_delta", type=float, default=0.01,
        help="monitor: flag columns whose null-ratio moved more than this",
    )
    p.add_argument(
        "--mean-shift", dest="mean_shift", type=float, default=0.05,
        help="monitor: flag columns whose mean moved more than this fraction",
    )
    p.add_argument("--id-column", dest="id_column", default="doc_id")
    p.add_argument("--text-column", dest="text_column", default="text")
    p.add_argument("--group-column", dest="group_column", default="source")
    p.add_argument("--quality-min", dest="quality_min", type=float, default=0.5)
    p.add_argument("--cap-share", dest="cap_share", type=float, default=0.03)
    p.add_argument("--seq-len", dest="seq_len", type=int, default=2048)
    p.add_argument("--token-budget", dest="token_budget", type=int, default=None,
                   help="curate: keep only the best-quality docs whose tokens fit this budget (stage 5.5)")
    p.add_argument("--sft-max-tokens", dest="sft_max_tokens", type=int, default=None,
                   help="curate: emit length-bucketed PADDED batches (SFT manifest) instead of concat packing")
    p.add_argument("--dataset-name", "--dataset_name", dest="dataset_name")
    p.add_argument("--dataset-group", "--dataset_group", dest="dataset_group")
    p.add_argument("--data-root", dest="data_root", default="datasets")
    p.add_argument("--eps", type=float, default=0.5)
    p.add_argument("--min-samples", "--min_samples", dest="min_samples", type=int, default=1)
    p.add_argument("--share-threshold", dest="share_threshold", type=float, default=0.7)
    p.add_argument("--target-expr", dest="target_expr", default=None,
                   help="score: boolean SQL expression marking target-domain exemplars")
    p.add_argument("--min-log-importance", dest="min_log_importance", type=float, default=None,
                   help="score: drop documents below this DSIR weight")
    p.add_argument(
        "--param-source", dest="param_source", choices=["member", "cluster_sample"],
        default="member",
    )
    p.add_argument("--key-column", dest="key_column", default=None,
                   help="row-id column name shared by the pair (default: positional)")
    p.add_argument("--output", default=None, help="directory for violations parquet")
    return p


def main(argv: list[str] | None = None) -> dict:
    from datalakerulegeneration_spark.catalog import (
        discover_dataset_folders,
        read_csv_all_string,
        write_table,
    )
    from datalakerulegeneration_spark.pipeline import run_quality_pipeline
    from datalakerulegeneration_spark.session import get_spark

    args = build_parser().parse_args(argv)
    spark = get_spark("datalakerulegeneration_spark-cli")
    if args.mode == "golden":
        # user-facing acceptance check (r11): run the vendored golden
        # benchmark end-to-end and compare every pinned vector — the
        # same claims the parity test suite makes, as ONE CLI gate
        from datalakerulegeneration_spark.evaluation.golden import (
            quintet_beers_error_cells,
            run_dgov_golden,
            run_quintet_golden,
        )
        from datalakerulegeneration_spark.matching.golden_match import (
            golden_assignments,
        )

        PIN_QUINTET = {
            "beers": (1002, 12313, 3360),
            "flights": (4920, 5673, 0),
            "hospital": (472, 2904, 37),
            "rayyan": (828, 4195, 120),
        }
        PIN_DGOV = {"lake2018": (208, 359, 485), "lake2020": (69, 301, 373)}
        q = {
            ds: (v["tp"], v["fp"], v["fn"])
            for ds, v in run_quintet_golden(spark).items()
        }
        g = {
            ds: (v["tp"], v["fp"], v["fn"])
            for ds, v in run_dgov_golden(spark).items()
        }
        n_err = quintet_beers_error_cells(spark).count()
        ident = all(
            s.split("::", 1)[1] == t.split("::", 1)[1]
            for pairs in golden_assignments(spark).values()
            for s, t, _ in pairs
        )
        out = {
            "mode": "golden",
            "quintet_pipeline": {k: list(v) for k, v in q.items()},
            "dgov_pipeline": {k: list(v) for k, v in g.items()},
            "beers_error_cells": n_err,
            "matcher_identity": ident,
            "ok": (
                q == PIN_QUINTET
                and g == PIN_DGOV
                and n_err == 17416
                and ident
            ),
        }
        print(json.dumps(out, sort_keys=True))
        return out
    if args.mode == "monitor":
        from datalakerulegeneration_spark.ops.drift import profile_drift, schema_drift

        if not args.input or not args.baseline:
            raise SystemExit("--mode monitor requires --input and --baseline")
        if args.input_format == "jsonl":
            from datalakerulegeneration_spark.catalog import read_jsonl

            base = read_jsonl(spark, args.baseline)
            cur = read_jsonl(spark, args.input)
        else:
            base = spark.read.parquet(args.baseline)
            cur = spark.read.parquet(args.input)
        schema_rows = schema_drift(base, cur).collect()
        schema_changes = [
            {"column": r["column"], "status": r["status"],
             "base_type": r["base_type"], "cur_type": r["cur_type"]}
            for r in schema_rows if r["status"] != "unchanged"
        ]
        flagged = []
        for r in profile_drift(base, cur).collect():
            # a metric that became INCOMPARABLE is drift, not health: a
            # null_ratio that went NULL means a side has no rows; a NULL
            # rel-shift (zero baseline mean) falls back to the absolute
            # shift
            null_moved = (
                abs(r["null_ratio_delta"]) > args.null_delta
                if r["null_ratio_delta"] is not None
                else (r["base_null_ratio"] is not None) != (r["cur_null_ratio"] is not None)
            )
            if r["mean_rel_shift"] is not None:
                mean_moved = abs(r["mean_rel_shift"]) > args.mean_shift
            elif r["mean_abs_shift"] is not None:
                mean_moved = r["mean_abs_shift"] != 0.0
            else:
                mean_moved = (r["base_numeric_mean"] is not None) != (
                    r["cur_numeric_mean"] is not None
                )
            if null_moved or mean_moved:
                flagged.append(
                    {
                        "column": r["column"],
                        "null_ratio_delta": r["null_ratio_delta"],
                        "mean_rel_shift": r["mean_rel_shift"],
                        "mean_abs_shift": r["mean_abs_shift"],
                    }
                )
        out = {
            "mode": "monitor",
            "n_columns": len(schema_rows),
            "schema_changes": schema_changes,
            "flagged_columns": flagged,
            "ok": not schema_changes and not flagged,
        }
        print(json.dumps(out, sort_keys=True))
        return out
    if args.mode == "score":
        # DSIR scoring: train the bucket LM on --target-expr exemplars,
        # score every document, optionally write the kept subset
        from pyspark.sql import functions as F

        from datalakerulegeneration_spark.ops import textqa
        from datalakerulegeneration_spark.streaming import dsir_score_stream

        if not args.input or not args.target_expr:
            raise SystemExit("--mode score requires --input and --target-expr")
        if args.input_format == "jsonl":
            from datalakerulegeneration_spark.catalog import read_jsonl

            docs = read_jsonl(spark, args.input)
        else:
            docs = spark.read.parquet(args.input)
        marked = docs.withColumn("_t", F.expr(args.target_expr))
        lm = textqa.dsir_lm(marked, args.text_column, "_t")
        scored = dsir_score_stream(docs, lm, args.id_column, args.text_column)
        stats = scored.agg(
            F.count(F.lit(1)).alias("docs"),
            F.round(F.avg("log_importance"), 6).alias("mean_log_importance"),
        ).collect()[0]
        out = {
            "mode": "score",
            "docs": stats["docs"],
            "mean_log_importance": stats["mean_log_importance"],
        }
        if args.min_log_importance is not None:
            kept = dsir_score_stream(
                docs, lm, args.id_column, args.text_column,
                min_log_importance=args.min_log_importance,
            )
            out["kept_docs"] = kept.count()
            out["min_log_importance"] = args.min_log_importance
            if args.output:
                kept.write.mode("overwrite").parquet(args.output)
        print(json.dumps(out, sort_keys=True))
        return out
    if args.mode == "dedup":
        # dedup report: the audit a pipeline runs BEFORE committing to a
        # dedup strategy — exact-dup mass, near-dup pair count at the
        # chosen threshold, and the novelty distribution, one JSON line
        from pyspark.sql import functions as F

        from datalakerulegeneration_spark.ops import dedup as dd

        if not args.input:
            raise SystemExit("--mode dedup requires --input")
        if args.input_format == "jsonl":
            from datalakerulegeneration_spark.catalog import read_jsonl

            docs = read_jsonl(spark, args.input)
        else:
            docs = spark.read.parquet(args.input)
        n_docs = docs.count()
        keepers = dd.exact_dedup(docs, args.id_column, args.text_column).count()
        pairs = dd.minhash_dedup(
            docs, args.id_column, args.text_column, threshold=args.share_threshold
        ).count()
        nov = dd.shingle_novelty(docs, args.id_column, args.text_column).agg(
            F.round(F.avg("novelty"), 6).alias("mean"),
            F.round(F.min("novelty"), 6).alias("min"),
        ).collect()[0]
        out = {
            "mode": "dedup",
            "docs": n_docs,
            "exact_distinct": keepers,
            "exact_dup_rows": n_docs - keepers,
            "near_dup_pairs": pairs,
            "near_dup_threshold": args.share_threshold,
            "novelty_mean": nov["mean"],
            "novelty_min": nov["min"],
        }
        print(json.dumps(out, sort_keys=True))
        return out
    if args.mode == "curate":
        from pyspark.sql import functions as F

        from datalakerulegeneration_spark.catalog import write_corpus
        from datalakerulegeneration_spark.ops.curate import curate_corpus

        if not args.input:
            raise SystemExit("--mode curate requires --input")
        if args.input_format == "jsonl":
            from datalakerulegeneration_spark.catalog import read_jsonl

            docs = read_jsonl(spark, args.input)
        else:
            docs = spark.read.parquet(args.input)
        manifest = curate_corpus(
            docs,
            id_col=args.id_column,
            text_col=args.text_column,
            group_col=args.group_column,
            quality_min=args.quality_min,
            cap_share=args.cap_share,
            seq_len=args.seq_len,
            materialize_manifest=args.sft_max_tokens is None,
            token_budget=args.token_budget,
            sft_max_tokens=args.sft_max_tokens,
        )
        if args.sft_max_tokens is not None:
            stats = manifest.agg(
                F.count(F.lit(1)).alias("docs"),
                F.sum("weight").alias("tokens"),
                F.count_distinct(
                    F.when(F.col("batch_idx").isNotNull(),
                           F.concat_ws(":", F.col("bucket"), F.col("batch_idx")))
                ).alias("batches"),
                F.count(F.when(F.col("batch_idx").isNull(), F.lit(1))).alias("unbatchable"),
            ).collect()[0]
            out = {
                "mode": "curate",
                "input_docs": docs.count(),
                "kept_docs": stats["docs"],
                "tokens": stats["tokens"],
                "batches": stats["batches"],
                "unbatchable_docs": stats["unbatchable"],
                "sft_max_tokens": args.sft_max_tokens,
                "token_budget": args.token_budget,
            }
            if args.output:
                write_corpus(manifest, args.output, partition_by=("grp",), sort_by=("bucket", "batch_idx"))
        else:
            stats = manifest.agg(
                F.count(F.lit(1)).alias("docs"),
                F.sum("weight").alias("tokens"),
                (F.max("pack_last") + 1).alias("packs"),
            ).collect()[0]
            out = {
                "mode": "curate",
                "input_docs": docs.count(),
                "kept_docs": stats["docs"],
                "tokens": stats["tokens"],
                "packs": stats["packs"],
                "seq_len": args.seq_len,
                "token_budget": args.token_budget,
            }
            if args.output:
                write_corpus(manifest, args.output, partition_by=("grp",), sort_by=("offset",))
        spark.catalog.clearCache()
        print(json.dumps(out, sort_keys=True))
        return out
    cat = discover_dataset_folders(spark, args.data_root)
    rows = cat.collect()
    if args.dataset_group:
        rows = [r for r in rows if r["group"] == args.dataset_group]
    if args.mode == "single":
        if not args.dataset_name:
            raise SystemExit("--mode single requires --dataset-name")
        rows = [r for r in rows if r["table"] == args.dataset_name]
    paths = {(r["table"], r["kind"]): r["path"] for r in rows}
    names = sorted({t for t, _ in paths})
    pairs = [n for n in names if (n, "dirty") in paths and (n, "clean") in paths]
    if not pairs:
        raise SystemExit(f"no dirty/clean pairs found under {args.data_root!r}")

    clean = {n: read_csv_all_string(spark, paths[(n, "clean")]) for n in pairs}
    dirty = {n: read_csv_all_string(spark, paths[(n, "dirty")]) for n in pairs}
    key_cols = {n: args.key_column for n in pairs} if args.key_column else None
    res = run_quality_pipeline(
        spark,
        clean,
        dirty,
        key_cols=key_cols,
        eps=args.eps,
        min_samples=args.min_samples,
        share_threshold=args.share_threshold,
        param_source=args.param_source,
    )
    out = {"mode": args.mode, "tables": {}}
    for name, r in res["tables"].items():
        out["tables"][name] = r["metrics"]
        if args.output:
            write_table(r["violations"], os.path.join(args.output, f"{name}_violations"))
    print(json.dumps(out, sort_keys=True))
    return out


if __name__ == "__main__":
    main()
