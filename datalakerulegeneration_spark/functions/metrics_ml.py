"""Clustering-quality metrics (M7): PairAcc / ARI / NMI.

The reference's ablation harness uses sklearn's implementations
(cluster_experiment.py:1095-1200). Dependency-free numpy versions —
these score CLUSTERINGS (label vectors, driver-sized), not data.
"""

from __future__ import annotations

import math

import numpy as np


def _contingency(a, b):
    a = np.asarray(a)
    b = np.asarray(b)
    ua, ia = np.unique(a, return_inverse=True)
    ub, ib = np.unique(b, return_inverse=True)
    m = np.zeros((len(ua), len(ub)), dtype=np.int64)
    for x, y in zip(ia, ib):
        m[x, y] += 1
    return m


def pair_accuracy(pred, truth) -> float:
    """Share of point pairs on which the two clusterings agree
    (same-cluster vs different-cluster)."""
    pred = np.asarray(pred)
    truth = np.asarray(truth)
    n = len(pred)
    if n < 2:
        return 1.0
    agree = total = 0
    for i in range(n):
        same_p = pred[i + 1 :] == pred[i]
        same_t = truth[i + 1 :] == truth[i]
        agree += int((same_p == same_t).sum())
        total += n - i - 1
    return agree / total


def adjusted_rand_index(pred, truth) -> float:
    m = _contingency(pred, truth)
    n = m.sum()
    if n < 2:
        return 1.0
    comb = lambda x: x * (x - 1) / 2.0  # noqa: E731
    sum_ij = comb(m).sum()
    sum_a = comb(m.sum(axis=1)).sum()
    sum_b = comb(m.sum(axis=0)).sum()
    expected = sum_a * sum_b / comb(n)
    max_index = (sum_a + sum_b) / 2.0
    if max_index == expected:
        return 1.0
    return float((sum_ij - expected) / (max_index - expected))


def normalized_mutual_info(pred, truth) -> float:
    m = _contingency(pred, truth).astype(float)
    n = m.sum()
    if n == 0:
        return 1.0
    pi = m.sum(axis=1) / n
    pj = m.sum(axis=0) / n
    mi = 0.0
    for i in range(m.shape[0]):
        for j in range(m.shape[1]):
            if m[i, j] > 0:
                mi += (m[i, j] / n) * math.log((m[i, j] / n) / (pi[i] * pj[j]))
    hi = -sum(p * math.log(p) for p in pi if p > 0)
    hj = -sum(p * math.log(p) for p in pj if p > 0)
    denom = math.sqrt(hi * hj)
    return float(mi / denom) if denom > 0 else 1.0
