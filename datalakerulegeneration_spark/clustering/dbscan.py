"""Driver-side DBSCAN over the (tiny) profile matrix.

Spark ML has no DBSCAN; the reference uses sklearn's
(utils/clustering.py:23-83). The matrix is #column-profiles × ~17,
small by design, so a dependency-free numpy implementation on the
driver is the honest architecture (SURVEY §7.3.5) — the heavy work
(profiling) already ran distributed.
"""

from __future__ import annotations

import numpy as np


def dbscan(
    mat: np.ndarray,
    eps: float = 0.5,
    min_samples: int = 1,
    metric: str = "euclidean",
) -> np.ndarray:
    """Classic DBSCAN; returns labels with -1 = noise.

    Defaults mirror the reference CLI (eps=0.5, min_samples=1 —
    main.py:230-231); with min_samples=1 every point is a core point
    and the result equals connected components of the eps-graph.
    """
    n = len(mat)
    if n == 0:
        return np.array([], dtype=int)
    if metric == "cosine":
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        unit = mat / norms
        dist = 1.0 - unit @ unit.T
    else:
        sq = (mat * mat).sum(axis=1)
        dist = np.sqrt(np.maximum(sq[:, None] + sq[None, :] - 2 * mat @ mat.T, 0.0))
    neighbors = [np.flatnonzero(dist[i] <= eps) for i in range(n)]
    core = np.array([len(nb) >= min_samples for nb in neighbors])

    labels = np.full(n, -1, dtype=int)
    cid = 0
    for i in range(n):
        if labels[i] != -1 or not core[i]:
            continue
        # BFS expand cluster
        labels[i] = cid
        stack = list(neighbors[i])
        while stack:
            j = stack.pop()
            if labels[j] == -1:
                labels[j] = cid
                if core[j]:
                    stack.extend(k for k in neighbors[j] if labels[k] == -1)
        cid += 1
    return labels
