"""Linear sum assignment (Hungarian / Jonker-Volgenant) in pure NumPy.

Drop-in replacement for scipy.optimize.linear_sum_assignment for the small
cost matrices EFPI needs (≤ 11×11; the reference imports scipy at
unravel/soccer/models/formations/efpi.py:134-143, unavailable here).
Classic O(n³) shortest-augmenting-path with row/column potentials; verified
against a brute-force oracle in tests.
"""

from __future__ import annotations

import numpy as np


def linear_sum_assignment(cost: np.ndarray):
    """Return (row_ind, col_ind) minimizing cost[row_ind, col_ind].sum().
    Rows must be <= cols; larger side is transposed transparently.

    The augmenting-path state lives in plain Python lists: for the ≤11×11
    matrices this solver exists for, per-element numpy scalar indexing
    dominated the runtime (~313 µs/solve profiled inside the EFPI kernel,
    727k ``np.full`` calls per 66k solves). Python-float arithmetic is the
    same IEEE double arithmetic in the same comparison order, so the chosen
    assignment — ties included — is bit-identical to the array version;
    measured ~6× faster per solve."""
    cost = np.asarray(cost, dtype=float)
    if cost.ndim != 2:
        raise ValueError("cost must be 2-D")
    transposed = cost.shape[0] > cost.shape[1]
    if transposed:
        cost = cost.T
    n, m = cost.shape
    rows = cost.tolist()

    INF = float("inf")
    # 1-indexed over columns; column 0 is the virtual start
    u = [0.0] * (n + 1)
    v = [0.0] * (m + 1)
    p = [0] * (m + 1)  # p[j] = row (1-indexed) matched to col j
    way = [0] * (m + 1)

    for i in range(1, n + 1):
        p[0] = i
        j0 = 0
        minv = [INF] * (m + 1)
        used = [False] * (m + 1)
        while True:
            used[j0] = True
            i0 = p[j0]
            delta = INF
            j1 = 0
            row = rows[i0 - 1]
            ui0 = u[i0]
            for j in range(1, m + 1):
                if used[j]:
                    continue
                c = row[j - 1] - ui0 - v[j]
                if c < minv[j]:
                    minv[j] = c
                    way[j] = j0
                if minv[j] < delta:
                    delta = minv[j]
                    j1 = j
            for j in range(m + 1):
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

    col_ind = np.full(n, -1, dtype=int)
    for j in range(1, m + 1):
        if p[j] != 0:
            col_ind[p[j] - 1] = j - 1
    row_ind = np.arange(n)
    if transposed:
        order = np.argsort(col_ind)
        return col_ind[order], row_ind[order]
    return row_ind, col_ind
