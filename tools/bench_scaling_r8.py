"""One-off r8 scaling measurement: the round's new families' >=10x
observations for COVERAGE.md (domain ops, BPE, CCNet flagship+funnel,
persisted-index search) plus the re-measured dedup_agreement decade at
the new 56-bit SimHash default. Warm session, min of two runs, cache
cleared between runs — same protocol as bench.py's timed passes.
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

PLAN = [
    "dedup_agreement_documents",
    "ann_index_search_embeddings",
    "domain_mix_documents",
    "domain_cap_documents",
    "domain_blocklist_documents",
    "bpe_learn_documents",
    "bpe_encode_documents",
    "curate_corpus_ccnet_documents",
    "curation_funnel_ccnet_documents",
]


def main() -> None:
    spark = get_spark("scaling-r8", extra_conf={"spark.ui.showConsoleProgress": "false"})
    impls = {name: impl for name, (impl, _) in Q.REGISTRY.items()}
    out: dict[str, dict[str, float]] = {}
    for name in PLAN:
        out[name] = {}
        for lvl, sf_dir in SFS.items():
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
