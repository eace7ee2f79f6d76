"""Phase-split profiler for registered queries (guide §1: measure first).

For each query name, separates the wall into:
  build  — Python-side DataFrame construction (py4j plan assembly)
  plan   — analysis + optimization + physical planning
           (triggered via queryExecution().executedPlan())
  exec   — noop-sink execution (computes every column, discards rows)

Each phase is measured on a FRESH plan (a second impl call) so the
plan phase is not pre-warmed by the build measurement's lazy state.

Usage: python tools/profile_phases.py [--sf DIR] [--reps N] name [name...]
Prints one JSON line per query + a sorted summary.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datalakerulegeneration_spark import queries as Q
from datalakerulegeneration_spark.session import get_spark

_IMPLS = {name: impl for name, (impl, _) in Q.REGISTRY.items()}


def main() -> int:
    args = [a for a in sys.argv[1:]]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = 2
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        del args[i : i + 2]
    if "--reps" in args:
        i = args.index("--reps")
        reps = int(args[i + 1])
        del args[i : i + 2]
    names = args
    spark = get_spark("phase-profile", extra_conf={"spark.ui.showConsoleProgress": "false"})
    # JIT/codegen warmup identical to bench.py's convention
    spark.range(0, 1000000).selectExpr("sum(id)").collect()
    rows = []
    for name in names:
        best = None
        for _ in range(reps):
            spark.sparkContext.setJobDescription(f"phase:{name}")
            t0 = time.time()
            df = _IMPLS[name](spark, sf_dir)
            t1 = time.time()
            df._jdf.queryExecution().executedPlan()
            t2 = time.time()
            df.write.format("noop").mode("overwrite").save()
            t3 = time.time()
            spark.catalog.clearCache()
            r = {
                "name": name,
                "build": round(t1 - t0, 3),
                "plan": round(t2 - t1, 3),
                "exec": round(t3 - t2, 3),
                "total": round(t3 - t0, 3),
            }
            if best is None or r["total"] < best["total"]:
                best = r
        rows.append(best)
        print(json.dumps(best), flush=True)
    rows.sort(key=lambda r: -r["total"])
    print(f"{'query':44s} {'build':>7s} {'plan':>7s} {'exec':>7s} {'total':>7s}")
    for r in rows:
        print(f"{r['name']:44s} {r['build']:7.2f} {r['plan']:7.2f} {r['exec']:7.2f} {r['total']:7.2f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
