"""One-off r7 scaling measurement: the fourth-wave families' >=10x
observations for COVERAGE.md (PQ ladder, PMI, bigram LM, DSIR-gated and
budget-gated flagships, video dedup). Warm session, min of two runs,
cache cleared between runs — same protocol as bench.py's timed passes.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datalakerulegeneration_spark import queries as Q
from datalakerulegeneration_spark.session import get_spark

SFS = {
    "sf0.1": "/root/testdata/sf0.1",
    "sf1": ".bench/sf1",
    "sf10": ".bench/sf10",
}

# query -> sf levels to measure: the PQ trio (the one r6 family with
# no scaling row yet) + this round's new queries
PLAN = {
    "ann_topk_pq_embeddings": ["sf0.1", "sf1", "sf10"],
    "ann_topk_ivf_pq_embeddings": ["sf0.1", "sf1", "sf10"],
    "ann_rerank_pq_embeddings": ["sf0.1", "sf1", "sf10"],
    "curate_corpus_budget_documents": ["sf0.1", "sf1", "sf10"],
    "curation_funnel_budget_documents": ["sf0.1", "sf1", "sf10"],
    "pca_recall_embeddings": ["sf0.1", "sf1", "sf10"],
}


def main() -> None:
    spark = get_spark("scaling-r7", extra_conf={"spark.ui.showConsoleProgress": "false"})
    impls = {name: impl for name, (impl, _) in Q.REGISTRY.items()}
    out: dict[str, dict[str, float]] = {}
    for name, levels in PLAN.items():
        out[name] = {}
        for lvl in levels:
            sf_dir = SFS[lvl]
            best = None
            for i in range(3):  # first run = warmup/cold, then min of 2
                t0 = time.time()
                impls[name](spark, sf_dir).collect()
                el = time.time() - t0
                spark.catalog.clearCache()
                if i > 0:
                    best = el if best is None else min(best, el)
            out[name][lvl] = round(best, 2)
            print(json.dumps({"query": name, "sf": lvl, "sec": out[name][lvl]}), flush=True)
    try:
        l1, _, _ = os.getloadavg()
    except OSError:
        l1 = None
    print(json.dumps({"all": out, "load1": l1}))


if __name__ == "__main__":
    main()
