"""Rectangular linear-sum assignment (Hungarian / Jonker-Volgenant style),
pure NumPy — replaces scipy.optimize.linear_sum_assignment for the SCOT
optimal matching join (solaris/eval/scot.py:50).

Standard shortest-augmenting-path implementation (O(n²m)); maximization is
handled by cost negation.  Optimal VALUE matches scipy exactly; when multiple
optima exist any one may be returned (SCOT's TP/FP/FN counts are invariant
across optima because reward = (iou>t)·(base+iou) makes the matched-pair
count the dominant term).
"""

from __future__ import annotations

import numpy as np


def linear_sum_assignment(cost: np.ndarray, maximize: bool = False):
    """Return (row_ind, col_ind) minimizing (or maximizing) total cost.
    Handles rectangular matrices like scipy (assigns min(n_rows, n_cols))."""
    cost = np.asarray(cost, dtype=np.float64)
    if maximize:
        cost = -cost
    transposed = cost.shape[0] > cost.shape[1]
    if transposed:
        cost = cost.T
    n, m = cost.shape  # n <= m
    # JV shortest augmenting path with potentials (1-indexed internals)
    INF = np.inf
    u = np.zeros(n + 1)
    v = np.zeros(m + 1)
    p = np.zeros(m + 1, dtype=np.int64)  # p[j] = row assigned to col j
    way = np.zeros(m + 1, dtype=np.int64)
    for i in range(1, n + 1):
        p[0] = i
        j0 = 0
        minv = np.full(m + 1, INF)
        used = np.zeros(m + 1, dtype=bool)
        while True:
            used[j0] = True
            i0 = p[j0]
            delta = INF
            j1 = 0
            cur = cost[i0 - 1, :] - u[i0] - v[1:]
            notused = ~used[1:]
            upd = notused & (cur < minv[1:])
            minv[1:][upd] = cur[upd]
            way[1:][upd] = j0
            if notused.any():
                cand = np.where(notused)[0]
                k = cand[np.argmin(minv[1:][cand])]
                delta = minv[k + 1]
                j1 = k + 1
            u[p[used]] += delta
            v[used] -= delta
            minv[1:][notused] -= delta
            j0 = j1
            if p[j0] == 0:
                break
        while j0:
            j1 = way[j0]
            p[j0] = p[j1]
            j0 = j1
    rows = np.empty(n, dtype=np.int64)
    for j in range(1, m + 1):
        if p[j] > 0:
            rows[p[j] - 1] = j - 1
    row_ind = np.arange(n)
    col_ind = rows
    if transposed:
        row_ind, col_ind = col_ind, row_ind
        order = np.argsort(row_ind)
        return row_ind[order], col_ind[order]
    return row_ind, col_ind
