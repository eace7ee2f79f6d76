"""One-off r9 scaling measurement: the round's new frozen-scoring
queries' >=10x observations for COVERAGE.md (quality_classifier_score,
semdedup_frozen, curate_corpus_trained), the batched-vs-strict BPE
per-merge cost at sf1, and the k-scaling probe for frozen SemDeDup
(k=16 registered shape vs k=256 — the k ∝ N production path — at
sf10). Warm session, min of two runs, cache cleared between runs —
same protocol as bench.py's timed passes.
"""

from __future__ import annotations

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
    "quality_classifier_score_documents",
    "semdedup_frozen_embeddings",
    "curate_corpus_trained_documents",
    # late-r9 serving splits (sf10 lineitem fixture:
    #   python tools/make_sf1.py --replicas 100 --dst .bench/sf10 --tables lineitem)
    "dboost_mixture_frozen_lineitem",
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
    spark = get_spark("scaling-r9", extra_conf={"spark.ui.showConsoleProgress": "false"})
    impls = {n: impl for n, (impl, _) in Q.REGISTRY.items()}
    for name in PLAN:
        row = [name]
        for label, sf in SFS.items():
            impls[name](spark, sf).collect()  # cold/JIT pass
            spark.catalog.clearCache()

            def run(n=name, s=sf):
                impls[n](spark, s).collect()
                spark.catalog.clearCache()

            row.append(f"{label}={_timed(run):.2f}s")
        print("  ".join(row))

    # batched vs strict BPE per-merge cost at sf1
    from datalakerulegeneration_spark.catalog import load_sf_tables
    from datalakerulegeneration_spark.ops import bpe

    docs = load_sf_tables(spark, ".bench/sf1", ("documents",))["documents"]
    t0 = time.time()
    n = bpe.bpe_learn(docs, "doc_id", "text", n_merges=64, merges_per_scan=1).count()
    strict = (time.time() - t0) / max(n, 1)
    t0 = time.time()
    n = bpe.bpe_learn(docs, "doc_id", "text", n_merges=1024, merges_per_scan=32).count()
    batched = (time.time() - t0) / max(n, 1)
    print(f"bpe_learn sf1: strict={strict:.3f}s/merge batched(K=32)={batched:.3f}s/merge ({n} merges)")

    # frozen SemDeDup k-scaling at sf10 (k=16 registered vs k=256)
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector
    from pyspark.sql import functions as F

    from datalakerulegeneration_spark.ops import similarity as S

    emb = load_sf_tables(spark, ".bench/sf10", ("embeddings",))["embeddings"]
    v = emb.select(array_to_vector(F.col("embedding").cast("array<double>")).alias("__mlvec"))
    cents = [
        [round(float(x), 6) for x in c]
        for c in KMeans(k=256, featuresCol="__mlvec", seed=42).fit(v).clusterCenters()
    ]
    for label, c in (("k=16", None), ("k=256", cents)):
        t0 = time.time()
        S.semdedup_frozen(emb, c, threshold=0.4).count()
        print(f"semdedup_frozen sf10 {label}: {time.time() - t0:.2f}s")
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
