"""r13 scaling evidence (VERDICT r12 item 6): re-profile the flagship
paths at sf1 (10× sf0.1; synthesized by tools/make_sf1.py) at 32 vs 8
cores, to separate fixed driver cost from data-proportional cost — the
sf0.1 scaling ratios <1 were uninformative about 100 TB.

Runs ONE core count per invocation (the session master is fixed at
creation): SPARK_GRAFT_CPUS=32 python tools/bench_scaling_r13.py
Appends to .bench/scaling_r13.jsonl; run once per core count.
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

QUERIES = [
    "keep_best_documents",
    "dedup_minhash_documents",
    "dedup_prefix_jaccard_documents",
    "profile_lineitem",
    "profile_approx_check_lineitem",
    "curate_corpus_ccnet_documents",
    "curation_funnel_ccnet_documents",
    "video_frame_dhash_documents",
]


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR") or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".bench", "sf1"
    )
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        f"scaling-r13-c{cpus}", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    spark.range(0, 1_000_000).selectExpr("sum(id)").collect()
    timings = {}
    for name in QUERIES:
        best = None
        for _ in range(2):
            t0 = time.time()
            _IMPLS[name](spark, sf_dir).collect()
            el = round(time.time() - t0, 2)
            best = el if best is None or el < best else best
            spark.catalog.clearCache()
        timings[name] = best
        print(f"c{cpus} {name}: {best}s", flush=True)
    row = {
        "cpus": int(cpus),
        "sf_dir": sf_dir,
        "queries": timings,
        "ts": time.strftime("%Y-%m-%dT%H:%M:%S"),
    }
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".bench",
        "scaling_r13.jsonl",
    )
    with open(out, "a") as fh:
        fh.write(json.dumps(row) + "\n")
    print(json.dumps(row))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
