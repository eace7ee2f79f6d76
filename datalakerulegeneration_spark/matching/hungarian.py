"""Hungarian algorithm (J6) — dependency-free numpy implementation.

The reference calls scipy.optimize.linear_sum_assignment on the
(#source-cols × #target-cols) score matrix (method_2/pipleline_2.py:
428-477). The matrix is tiny (columns, not rows), so an O(n³)
driver-side solve is the right boundary; this is the classic
shortest-augmenting-path formulation.
"""

from __future__ import annotations

import numpy as np


def hungarian(cost: np.ndarray) -> tuple[list[int], list[int]]:
    """Minimize total cost; returns (row_indices, col_indices) like
    scipy's linear_sum_assignment. Rectangular matrices are padded."""
    cost = np.asarray(cost, dtype=float)
    n_rows, n_cols = cost.shape
    n = max(n_rows, n_cols)
    pad = np.full((n, n), cost.max() + 1.0 if cost.size else 1.0)
    pad[:n_rows, :n_cols] = cost

    INF = float("inf")
    u = np.zeros(n + 1)
    v = np.zeros(n + 1)
    p = np.zeros(n + 1, dtype=int)  # p[j] = row matched to column j (1-based)
    way = np.zeros(n + 1, dtype=int)
    for i in range(1, n + 1):
        p[0] = i
        j0 = 0
        minv = np.full(n + 1, INF)
        used = np.zeros(n + 1, dtype=bool)
        while True:
            used[j0] = True
            i0 = p[j0]
            delta = INF
            j1 = 0
            for j in range(1, n + 1):
                if used[j]:
                    continue
                cur = pad[i0 - 1, j - 1] - u[i0] - v[j]
                if cur < minv[j]:
                    minv[j] = cur
                    way[j] = j0
                if minv[j] < delta:
                    delta = minv[j]
                    j1 = j
            for j in range(n + 1):
                if used[j]:
                    u[p[j]] += delta
                    v[j] -= delta
                else:
                    minv[j] -= delta
            j0 = j1
            if p[j0] == 0:
                break
        while j0:
            j1 = way[j0]
            p[j0] = p[j1]
            j0 = j1
    rows, cols = [], []
    for j in range(1, n + 1):
        if p[j] <= n_rows and j <= n_cols:
            rows.append(p[j] - 1)
            cols.append(j - 1)
    order = np.argsort(rows)
    return [rows[i] for i in order], [cols[i] for i in order]
