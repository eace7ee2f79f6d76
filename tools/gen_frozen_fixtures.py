"""One-time generator for the frozen-model fixtures (r9).

Trains the REAL models on /root/testdata/sf0.01 and freezes the
pure-expression parameters the registered scoring queries run under:

* ``resources/fixture_quality_weights.json`` — the trained logistic
  quality classifier (ops.quality_model.train_quality_classifier,
  weak labels from the heuristic's extremes) projected onto a compact
  vocabulary: for each of the most corpus-frequent tokens, its weight
  is the fitted coefficient at its HashingTF bucket (one occurrence of
  token t moves the margin by exactly coef[hash(t)] — the fasttext
  convention of shipping a word→weight table). Top ``VOCAB_SIZE``
  tokens by |weight| are kept, plus the intercept.
* ``resources/fixture_semdedup_centroids.json`` — KMeans cell
  centroids (k=16, seed=42) fitted on the embeddings table, rounded
  to 6 decimals so the frozen assignment can run in exact scaled-
  integer arithmetic in both engines.
* ``resources/fixture_gmm_params.json`` — the seeded Spark ML
  GaussianMixture fit on (l_quantity, l_extendedprice): weights,
  means, symmetrized inverse covariances, and the precomputed
  erf-free Mahalanobis² thresholds t² = 2·erfinv(1−cutoff/w)²
  (erfinv solved here by bisection+Newton on math.erf — no scipy).
* ``resources/fixture_colcluster.json`` — the column-clustering
  KMeans fit (k=4, seed=42) over MinMax-scaled profile vectors of the
  four match tables: feature list, per-feature scaler bounds, and
  centroids, all quantized at 6 decimals for exact micro-unit
  arithmetic.
* ``resources/fixture_quality_ref_dist.json`` — the frozen quality
  scorer's freeze-time margin distribution (10 equi-width bins:
  [lo, hi] edges + per-bin integer counts) — the PSI reference for
  the serving-split refit trigger.

Mirrors the bpe_learn/bpe_encode split of r8: TRAINING stays an
iterative library path (pytest-covered); SCORING under the frozen
parameters is expression arithmetic with an exact DuckDB oracle.

Usage: python tools/gen_frozen_fixtures.py [sf_dir] [section...]
  sections: quality semdedup gmm colcluster qualref (default: all)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VOCAB_SIZE = 32
K_CELLS = 16
SEED = 42

RES = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "datalakerulegeneration_spark",
    "resources",
)


def _erfinv(y: float) -> float:
    """Inverse error function to full double precision — bisection to
    bracket, then Newton on math.erf (derivative 2/√π · exp(−x²)).
    Runs ONCE per frozen component at freeze time; no scipy in the
    container, and a handful of Newton steps is all the job needs."""
    import math

    if not (-1.0 < y < 1.0):
        raise ValueError(f"erfinv domain is (-1, 1): {y!r}")
    if y == 0.0:
        return 0.0
    lo, hi = 0.0, 1.0
    ay = abs(y)
    while math.erf(hi) < ay:
        hi *= 2.0
    for _ in range(80):
        mid = (lo + hi) / 2.0
        if math.erf(mid) < ay:
            lo = mid
        else:
            hi = mid
    x = (lo + hi) / 2.0
    c = 2.0 / math.sqrt(math.pi)
    for _ in range(8):
        x -= (math.erf(x) - ay) / (c * math.exp(-x * x))
    return x if y > 0 else -x


GMM_PAIR = ("l_quantity", "l_extendedprice")
GMM_K = 3
GMM_CUTOFF = 0.005


def main(sf_dir: str, sections: set[str] | None = None) -> None:
    from pyspark.sql import functions as F

    from datalakerulegeneration_spark import get_spark
    from datalakerulegeneration_spark.catalog import load_sf_tables
    from datalakerulegeneration_spark.ops.quality_model import (
        train_quality_classifier,
        weak_quality_labels,
    )

    sections = sections or {"quality", "semdedup", "gmm", "colcluster", "qualref"}
    spark = get_spark("gen-frozen-fixtures")
    tables = load_sf_tables(spark, sf_dir, ("documents", "embeddings"))
    docs, emb = tables["documents"], tables["embeddings"]

    # ---- frozen GMM (mixture serving split) ------------------------------
    if "gmm" in sections:
        import math

        import numpy as np

        from datalakerulegeneration_spark.dboost.models import MixtureModel

        li = load_sf_tables(spark, sf_dir, ("lineitem",))["lineitem"]
        m = MixtureModel(n_components=GMM_K, cutoff=GMM_CUTOFF).fit(li, pair=GMM_PAIR)
        gauss = m.model_.gaussiansDF.collect()
        comps = []
        for w, g in zip(m.model_.weights, gauss):
            w = float(w)
            mean = [float(x) for x in g["mean"].toArray()]
            inv = np.linalg.pinv(g["cov"].toArray()).astype(float)
            icov = [[float(inv[0, 0]), float(inv[0, 1])], [float(inv[1, 0]), float(inv[1, 1])]]
            # symmetrize exactly (pinv can be asymmetric in the last ulp)
            off = (icov[0][1] + icov[1][0]) / 2.0
            icov[0][1] = icov[1][0] = off
            # exact threshold transform: w·(1−erf(d/√2)) < cutoff
            #   ⟺ d² > 2·erfinv(1−cutoff/w)²   (binding when w >= cutoff;
            #   at w == cutoff the formula gives exactly t2 = 0 — the
            #   component's mean point scores == cutoff and is KEPT by
            #   the strict < criterion, which maha² > 0 reproduces)
            if w >= GMM_CUTOFF:
                e = _erfinv(1.0 - GMM_CUTOFF / w)
                t2 = 2.0 * e * e
            else:
                t2 = None
            comps.append({"weight": w, "mean": mean, "icov": icov, "t2": t2})
        out_g = {
            "pair": list(GMM_PAIR),
            "k": GMM_K,
            "seed": m.seed,
            "cutoff": GMM_CUTOFF,
            "components": comps,
        }
        with open(os.path.join(RES, "fixture_gmm_params.json"), "w") as fh:
            json.dump(out_g, fh, indent=1, sort_keys=True)
        print(
            f"gmm params: k={len(comps)}, weights="
            f"{[round(c['weight'], 4) for c in comps]}, "
            f"t2={[None if c['t2'] is None else round(math.sqrt(c['t2']), 3) for c in comps]} (as d)"
        )

    # ---- frozen column-cluster model (M2 serving split) ------------------
    if "colcluster" in sections:
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.feature import MinMaxScaler, VectorAssembler

        from datalakerulegeneration_spark.clustering.features import DEFAULT_FEATURES
        from datalakerulegeneration_spark.queries import _live_profiles

        profiles = _live_profiles(spark, sf_dir)
        feats = [f for f in DEFAULT_FEATURES if f in profiles.columns]
        filled = profiles.select(
            "unique_id", *[F.coalesce(F.col(f), F.lit(0.0)).alias(f) for f in feats]
        )
        va = VectorAssembler(inputCols=feats, outputCol="__raw")
        assembled = va.transform(filled)
        scaler = MinMaxScaler(inputCol="__raw", outputCol="__vec").fit(assembled)
        scaled = scaler.transform(assembled)
        km = KMeans(k=4, featuresCol="__vec", predictionCol="cluster_id", seed=42).fit(scaled)
        out_c = {
            "features": feats,
            "min": [round(float(x), 6) for x in scaler.originalMin],
            "max": [round(float(x), 6) for x in scaler.originalMax],
            "centroids": [[round(float(x), 6) for x in c] for c in km.clusterCenters()],
            "k": 4,
            "seed": 42,
        }
        with open(os.path.join(RES, "fixture_colcluster.json"), "w") as fh:
            json.dump(out_c, fh, indent=1, sort_keys=True)
        print(f"colcluster: {len(feats)} features, k={len(out_c['centroids'])}")

    # ---- frozen quality-score reference distribution (refit trigger) -----
    if "qualref" in sections:
        from datalakerulegeneration_spark.ops.quality_model import frozen_linear_score

        N_BINS = 10
        scored = frozen_linear_score(docs, "doc_id", "text").select("quality_score")
        mm = scored.agg(
            F.min("quality_score").alias("lo"), F.max("quality_score").alias("hi")
        ).collect()[0]
        lo, hi = round(float(mm["lo"]), 6), round(float(mm["hi"]), 6)
        if hi <= lo:
            hi = lo + 1.0
        width = (hi - lo) / N_BINS
        bin_sql = (
            f"least({N_BINS - 1}, greatest(0, CAST(floor((quality_score"
            f" - CAST('{lo!r}' AS DOUBLE)) / CAST('{width!r}' AS DOUBLE)) AS INT)))"
        )
        counts = {
            r["bin"]: r["n"]
            for r in scored.groupBy(F.expr(bin_sql).alias("bin"))
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        out_r = {
            "score_col": "quality_score",
            "lo": lo,
            "hi": hi,
            "ref_counts": [int(counts.get(i, 0)) for i in range(N_BINS)],
        }
        with open(os.path.join(RES, "fixture_quality_ref_dist.json"), "w") as fh:
            json.dump(out_r, fh, indent=1, sort_keys=True)
        print(f"quality ref dist: lo={lo} hi={hi} counts={out_r['ref_counts']}")

    # ---- quality weights -------------------------------------------------
    if "quality" in sections:
        labeled = weak_quality_labels(docs, "doc_id", "text")
        model = train_quality_classifier(labeled, "text")
        tok_stage, tf_stage, lr_model = model.stages
        coef = lr_model.coefficients
        intercept = float(lr_model.intercept)

        # candidate vocabulary: most frequent corpus tokens under the SAME
        # tokenization the model trained with (lower + \s+ split)
        cand = (
            docs.where(F.col("text").isNotNull())
            .select(F.explode(F.array_remove(F.split(F.lower("text"), r"\s+"), "")).alias("tok"))
            .groupBy("tok")
            .count()
            .orderBy(F.desc("count"), F.asc("tok"))
            .limit(2000)
            .collect()
        )
        toks = [
            r["tok"]
            for r in cand
            if r["tok"] and not any(c in r["tok"] for c in "'\"\\`")
        ]
        # weight of one occurrence of t = coefficient at t's hash bucket
        tok_df = spark.createDataFrame([(t, [t]) for t in toks], "tok string, __toks array<string>")
        hashed = tf_stage.transform(tok_df).collect()
        weights = {}
        for r in hashed:
            idx = r["__feats"].indices
            if len(idx) == 1:
                w = float(coef[int(idx[0])])
                if w != 0.0:
                    weights[r["tok"]] = w
        top = sorted(weights.items(), key=lambda kv: (-abs(kv[1]), kv[0]))[:VOCAB_SIZE]
        out_q = {"bias": intercept, "weights": dict(sorted(top))}
        with open(os.path.join(RES, "fixture_quality_weights.json"), "w") as fh:
            json.dump(out_q, fh, indent=1, sort_keys=True)
        print(f"quality weights: {len(out_q['weights'])} tokens, bias={intercept:.6g}")

    # ---- semdedup centroids ----------------------------------------------
    if "semdedup" in sections:
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        v = emb.select(array_to_vector(F.col("embedding").cast("array<double>")).alias("__mlvec"))
        km = KMeans(k=K_CELLS, featuresCol="__mlvec", predictionCol="cell", seed=SEED)
        centers = km.fit(v).clusterCenters()
        cents = [[round(float(x), 6) for x in c] for c in centers]
        with open(os.path.join(RES, "fixture_semdedup_centroids.json"), "w") as fh:
            json.dump(cents, fh)
        print(f"semdedup centroids: {len(cents)} x {len(cents[0])}")
    spark.stop()


if __name__ == "__main__":
    _args = sys.argv[1:]
    _sf = _args[0] if _args else "/root/testdata/sf0.01"
    _secs = set(_args[1:]) or None
    main(_sf, _secs)
