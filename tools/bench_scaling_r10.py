"""One-off r10 scaling measurement: the profile-driven family's
missing decade rows (r9 verdict item 3). `.bench/sf10` now carries the
scaled dimension tables (tools/make_sf1.py --replicas 100 --tables
customer_scaled,supplier_scaled,part_scaled,orders,region,nation), and
`.bench/sf1` the 10x variants, so cluster_columns_frozen_profiles /
profile_orders / profile_customer finally have sf10 rows. Warm
session, min of two runs, cache cleared between runs — bench.py's
timed-pass protocol, with the r10 calibration probe recorded first.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datalakerulegeneration_spark import queries as Q
from datalakerulegeneration_spark.session import get_spark

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SFS = {
    "sf0.1": "/root/testdata/sf0.1",
    "sf1": os.path.join(_REPO, ".bench", "sf1"),
    "sf10": os.path.join(_REPO, ".bench", "sf10"),
}

PLAN = [
    "cluster_columns_frozen_profiles",
    "profile_orders",
    "profile_customer",
]


def _timed(fn) -> float:
    best = None
    for _ in range(2):
        t0 = time.time()
        fn()
        el = time.time() - t0
        best = el if best is None or el < best else best
    return best


def main() -> None:
    spark = get_spark(
        "scaling-r10", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(_REPO, "bench.py")
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    bench._calibration_probe(spark)  # JIT
    calib = min(bench._calibration_probe(spark), bench._calibration_probe(spark))
    impls = {n: impl for n, (impl, _) in Q.REGISTRY.items()}
    out = {"calib_s": calib, "env": bench._env_markers(spark), "rows": {}}
    for name in PLAN:
        out["rows"][name] = {}
        for sf, d in SFS.items():
            impl = impls[name]
            # warmup (plans differ per sf under AQE) then timed min-of-2
            impl(spark, d).collect()
            spark.catalog.clearCache()

            def run(impl=impl, d=d):
                impl(spark, d).collect()
                spark.catalog.clearCache()

            el = round(_timed(run), 3)
            out["rows"][name][sf] = el
            print(f"{name} @ {sf}: {el}s", flush=True)
    path = os.path.join(_REPO, ".bench", "scaling_r10.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
        fh.write("\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
