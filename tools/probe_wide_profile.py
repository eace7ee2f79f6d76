"""Adversarial-width profiling probe (r9 verdict item 7).

SCALE.md claims ~0.5 s plan cost for the ~110-expression wide agg on
TPC-H-width tables; catalogs exist with 1,000+ columns, where the wide
agg becomes ~16,000 aggregate expressions. First run of this probe
found the real wall: the MONOLITHIC 1,000-column wide agg OOMs the
executor heap (per-task partial-agg buffers × 32 threads) after
minutes of codegen; the hatch — profile in ≤200-column chunks, union
the long results — is now the profiler DEFAULT
(``scalar_stats_long(max_cols_per_pass=200)``), making this probe the
regression guard for that setting.

Protocol: JIT warm-up profile first; chunked runs (the default path)
at 100/400/1,000 columns; the monolithic plan last (max_cols_per_pass
disabled) at 400 columns only — 1,000 monolithic is the known-OOM
shape and would take the whole JVM down with it.

Synthetic table: 10k rows, alternating int / short-string columns —
row count small so the measurement isolates plan/codegen/buffer cost.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datalakerulegeneration_spark.profiling.profiler import scalar_stats_long
from datalakerulegeneration_spark.session import get_spark


def make_wide(spark, n_cols: int, n_rows: int = 10_000):
    exprs = []
    for i in range(n_cols):
        if i % 2 == 0:
            exprs.append(f"CAST((id * {i + 1}) % 1000 AS INT) AS c{i}")
        else:
            exprs.append(f"concat('v', CAST(id % {50 + i} AS STRING)) AS c{i}")
    return spark.range(0, n_rows, 1, 32).selectExpr(*exprs)


def main() -> None:
    spark = get_spark(
        "wide-probe", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    # JIT warm-up on a small profile so the first measured run is not
    # a codegen-cold outlier (first probe conflated this: a 100-col
    # "chunked win" was really the one-pass run paying all the JIT)
    scalar_stats_long(make_wide(spark, 20), "warmup").collect()

    results = {}
    for n in (100, 400, 1000):
        df = make_wide(spark, n)
        t0 = time.time()
        rows = scalar_stats_long(df, f"wide{n}").collect()  # default: chunked @200
        results[n] = {"chunked_s": round(time.time() - t0, 2), "stats": len(rows)}
        print(f"{n} cols chunked: {results[n]}", flush=True)
    # monolithic comparison at 400 (1,000 monolithic OOMs the JVM)
    df = make_wide(spark, 400)
    t0 = time.time()
    rows = scalar_stats_long(df, "wide400", max_cols_per_pass=0).collect()
    results["400_monolithic"] = {"s": round(time.time() - t0, 2), "stats": len(rows)}
    print(f"400 cols monolithic: {results['400_monolithic']}", flush=True)

    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".bench",
        "wide_probe_r10.json",
    )
    with open(out, "w") as fh:
        json.dump(results, fh, indent=1)
        fh.write("\n")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
