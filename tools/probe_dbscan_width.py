"""Driver-side DBSCAN boundary probe at lake-catalog width (r12 —
r11 verdict item 7).

M1 collects #columns profile rows to the driver (SURVEY-sanctioned);
COVERAGE's widest prior probe was 1,000 columns. A 100 TB lake has
~10^5 columns, so this measures the exact path (full n^2 distance
matrix + BFS) against the blocked components hatch
(clustering/dbscan.py:dbscan_components_blocked, O(n*block) memory) on
synthetic 17-feature profile matrices at n = 1k..100k, checks the two
paths agree wherever both run, and prints one JSON line per cell for
SCALE.md's runbook.

Usage: python tools/probe_dbscan_width.py
"""

from __future__ import annotations

import json
import os
import resource
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datalakerulegeneration_spark.clustering.dbscan import (  # noqa: E402
    dbscan,
    dbscan_components_blocked,
)

N_FEATURES = 17  # the profile-matrix width cluster_columns feeds M1
EPS = 0.5
# exact path's dist matrix: 8 bytes * n^2 — cap where it stays well
# inside the driver (10k -> 0.8 GB; 31.6k -> 8 GB; 100k -> 80 GB = OOM).
# Default 10k keeps a full probe run under ~5 min; the 31.6k exact cell
# was measured once for the r12 runbook (297 s wall, 15.7 GB peak RSS —
# the superlinearity evidence) and is opt-in via the env override.
EXACT_MAX_N = int(os.environ.get("SPARK_GRAFT_DBSCAN_EXACT_MAX", "10000"))


def synth_profiles(n: int, seed: int = 0) -> np.ndarray:
    """Deterministic cluster-structured profile matrix: 32 archetype
    column families (the realistic catalog shape — most columns repeat
    a few profile archetypes) + per-column jitter."""
    rng = np.random.RandomState(seed)
    centers = rng.uniform(0.0, 4.0, size=(32, N_FEATURES))
    fam = rng.randint(0, 32, size=n)
    return centers[fam] + rng.normal(0.0, 0.05, size=(n, N_FEATURES))


def peak_rss_gb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


def main() -> int:
    for n in (1_000, 3_162, 10_000, 31_623, 100_000):
        mat = synth_profiles(n)
        row: dict = {"n": n, "features": N_FEATURES, "eps": EPS}
        if n <= EXACT_MAX_N:
            t0 = time.time()
            exact = dbscan(mat, eps=EPS, min_samples=1)
            row["exact_sec"] = round(time.time() - t0, 2)
            row["exact_dist_matrix_gb"] = round(8 * n * n / 1e9, 2)
        t0 = time.time()
        blocked = dbscan_components_blocked(mat, eps=EPS)
        row["blocked_sec"] = round(time.time() - t0, 2)
        row["blocked_stripe_gb"] = round(8 * 2048 * n / 1e9, 2)
        row["n_clusters"] = int(blocked.max()) + 1
        if n <= EXACT_MAX_N:
            row["paths_agree"] = bool((exact == blocked).all())
        row["peak_rss_gb"] = round(peak_rss_gb(), 2)
        print(json.dumps(row), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
