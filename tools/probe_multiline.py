"""Measure the S1 multiLine CSV ingest's file-count parallelism
(r11 — r10 verdict item 6).

``read_csv_all_string`` sets ``multiLine=true`` (quoted embedded
newlines — required for golden-pair parity), which makes each FILE one
input split: a single big CSV reads on one core regardless of cluster
size, while the same bytes across many files parallelize per file.
This probe writes the SAME synthetic quoted-multiline corpus as 1, 16
and 64 files and times a full S1 scan + per-column aggregation over
each layout (2 passes, min), recording the decade to
``.bench/multiline_probe_r11.json`` for SCALE.md's runbook.

Usage: python tools/probe_multiline.py [--rows 400000]
"""

from __future__ import annotations

import argparse
import csv
import json
import os
import shutil
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _write_corpus(root: str, rows: int, n_files: int) -> str:
    d = os.path.join(root, f"files_{n_files}")
    os.makedirs(d, exist_ok=True)
    per = rows // n_files
    r = 0
    for f in range(n_files):
        with open(os.path.join(d, f"part_{f:04d}.csv"), "w", newline="") as fh:
            w = csv.writer(fh, quoting=csv.QUOTE_MINIMAL)
            w.writerow(["id", "name", "notes", "value"])
            for _ in range(per):
                # every 7th row carries a quoted embedded newline — the
                # exact shape that forces multiLine
                notes = (
                    f"line one of {r}\nline two, with a comma"
                    if r % 7 == 0
                    else f"plain notes {r}"
                )
                w.writerow([r, f"name_{r % 997}", notes, (r * 37) % 10007])
                r += 1
    return d


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=400_000)
    args = ap.parse_args()

    import sys

    sys.path.insert(0, _REPO)
    from datalakerulegeneration_spark.catalog import read_csv_all_string
    from datalakerulegeneration_spark.session import get_spark

    spark = get_spark(
        "multiline_probe", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    root = os.path.join(_REPO, ".bench", "multiline_corpus")
    shutil.rmtree(root, ignore_errors=True)

    out = {"rows": args.rows, "layouts": {}}
    for n_files in (1, 16, 64):
        d = _write_corpus(root, args.rows, n_files)
        best = None
        for _ in range(2):
            t0 = time.time()
            df = read_csv_all_string(spark, d)
            # S1 scan + a per-column aggregation (forces full parse)
            n = df.selectExpr(
                "count(*) AS n",
                "sum(length(notes)) AS chars",
                "count(DISTINCT name) AS names",
            ).collect()[0]["n"]
            el = round(time.time() - t0, 3)
            best = el if best is None or el < best else best
        assert n == (args.rows // n_files) * n_files
        out["layouts"][str(n_files)] = best
        print(f"{n_files:3d} files: {best:7.3f} s  ({n} rows)")
    one = out["layouts"]["1"]
    out["speedup_16"] = round(one / out["layouts"]["16"], 2)
    out["speedup_64"] = round(one / out["layouts"]["64"], 2)
    path = os.path.join(_REPO, ".bench", "multiline_probe_r11.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
