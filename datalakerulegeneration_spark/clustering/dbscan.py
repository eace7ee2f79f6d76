"""Driver-side DBSCAN over the (tiny) profile matrix.

Spark ML has no DBSCAN; the reference uses sklearn's
(utils/clustering.py:23-83). The matrix is #column-profiles × ~17,
small by design, so a dependency-free numpy implementation on the
driver is the honest architecture (SURVEY §7.3.5) — the heavy work
(profiling) already ran distributed.
"""

from __future__ import annotations

import numpy as np


def k_distances(mat: np.ndarray, k: int = 4, metric: str = "euclidean") -> np.ndarray:
    """W7: sorted distance-to-k-th-nearest-neighbor curve — the DBSCAN
    eps-selection helper (reference utils/clustering.py:9-21, minus the
    matplotlib plot; the caller plots or knees the returned array).
    Same tiny-matrix scale class as :func:`dbscan`."""
    n = len(mat)
    if n == 0:
        return np.array([], dtype=float)
    k = min(k, n)
    if metric == "cosine":
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        unit = mat / norms
        dist = 1.0 - unit @ unit.T
    else:
        sq = (mat * mat).sum(axis=1)
        dist = np.sqrt(np.maximum(sq[:, None] + sq[None, :] - 2 * mat @ mat.T, 0.0))
    # k-th neighbor INCLUDING self, as sklearn NearestNeighbors does
    # when fit and queried on the same matrix (distances[:, k-1])
    kth = np.sort(dist, axis=1)[:, k - 1]
    return np.sort(kth)


def suggest_eps(mat: np.ndarray, k: int = 4, metric: str = "euclidean") -> float:
    """Knee of the k-distance curve by the max-distance-to-chord rule —
    a deterministic stand-in for eyeballing the reference's plot."""
    d = k_distances(mat, k, metric)
    if len(d) < 3:
        return float(d[-1]) if len(d) else 0.0
    x = np.arange(len(d), dtype=float)
    x0, y0, x1, y1 = x[0], d[0], x[-1], d[-1]
    denom = np.hypot(x1 - x0, y1 - y0) or 1.0
    gap = np.abs((y1 - y0) * x - (x1 - x0) * d + x1 * y0 - y1 * x0) / denom
    return float(d[int(gap.argmax())])


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


def dbscan_components_blocked(
    mat: np.ndarray,
    eps: float = 0.5,
    metric: str = "euclidean",
    block: int = 2048,
) -> np.ndarray:
    """The lake-catalog-width hatch for :func:`dbscan` (r12 probe —
    SCALE.md runbook): with min_samples=1 (the reference protocol,
    main.py:230-231) DBSCAN equals connected components of the
    eps-graph, so the full n×n distance matrix never needs to exist —
    distances are computed one ``block×n`` stripe at a time (BLAS
    matmul) and folded straight into union-find. Memory O(n·block)
    instead of O(n²): a 100k-column catalog needs ~1.6 GB of stripes
    against the exact path's 80 GB matrix. Labels are renumbered by
    first-occurrence order, which is exactly the BFS numbering of
    :func:`dbscan` at min_samples=1 (each component's label id is set
    by its lowest-index member), so the two paths are interchangeable.
    """
    n = len(mat)
    if n == 0:
        return np.array([], dtype=int)
    if metric == "cosine":
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        x = mat / norms
    else:
        x = mat
    sq = (x * x).sum(axis=1)

    parent = np.arange(n)

    def find(i: int) -> int:
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    # fully-resolved labels refreshed between stripes: an edge whose two
    # endpoints already share a (possibly stale) label can be skipped —
    # components only merge, so label-equality never goes stale the
    # unsafe way. This keeps the Python union loop on CROSS-component
    # edges only (first stripe pays it; later stripes are mostly
    # within-component no-ops filtered vectorized).
    resolved = np.arange(n)
    for lo in range(0, n, block):
        hi = min(lo + block, n)
        if metric == "cosine":
            d = x[lo:hi] @ x.T
            d *= -1.0
            d += 1.0
            adj = d <= eps
        else:
            # squared-distance comparison, in place: d2 <= eps^2 is the
            # mathematically exact form of dist <= eps (no sqrt pass,
            # no clamp, no broadcast temporaries) — the probe showed
            # the sqrt'd stripe costing ~4.5 s per 2048x50k block
            d = x[lo:hi] @ x.T
            d *= -2.0
            d += sq[lo:hi, None]
            d += sq[None, :]
            adj = d <= eps * eps
        rows, cols = np.nonzero(adj)
        rows = rows + lo
        keep = (cols > rows) & (resolved[rows] != resolved[cols])
        for r, c in zip(rows[keep], cols[keep]):
            ra, rb = find(int(r)), find(int(c))
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        resolved = np.array([find(i) for i in range(n)])

    roots = resolved
    # renumber components in first-occurrence order (= BFS numbering)
    order: dict[int, int] = {}
    labels = np.empty(n, dtype=int)
    for i, r in enumerate(roots):
        if r not in order:
            order[r] = len(order)
        labels[i] = order[r]
    return labels
