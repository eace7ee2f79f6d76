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
    p.add_argument("--mode", choices=["single", "multi"], default="single")
    p.add_argument("--dataset-name", "--dataset_name", dest="dataset_name")
    p.add_argument("--dataset-group", "--dataset_group", dest="dataset_group")
    p.add_argument("--data-root", dest="data_root", default="datasets")
    p.add_argument("--eps", type=float, default=0.5)
    p.add_argument("--min-samples", "--min_samples", dest="min_samples", type=int, default=1)
    p.add_argument("--share-threshold", dest="share_threshold", type=float, default=0.7)
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
