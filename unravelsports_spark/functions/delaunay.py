"""Pure-NumPy 2-D Delaunay triangulation (Bowyer–Watson).

Replaces scipy.spatial.Delaunay for the K3 delaunay adjacency kernel
(/root/reference/unravel/soccer/graphs/features/adjacency_matrix.py:60-125)
— scipy is not available in this environment. For points in general position
(no four cocircular) the Delaunay triangulation is unique, so the edge set
matches scipy's. Degenerate inputs (all collinear) yield an empty edge set
instead of scipy's QhullError.

n is small (≤ 22 players per frame), so the O(n²) incremental insertion with
plain-float circumcircle predicates is faster than any vectorized variant.
"""

from __future__ import annotations

import numpy as np


def _in_circumcircle(ax, ay, bx, by, cx, cy, px, py) -> bool:
    """p strictly inside the circumcircle of (a, b, c), any orientation."""
    adx, ady = ax - px, ay - py
    bdx, bdy = bx - px, by - py
    cdx, cdy = cx - px, cy - py
    det = (
        (adx * adx + ady * ady) * (bdx * cdy - cdx * bdy)
        - (bdx * bdx + bdy * bdy) * (adx * cdy - cdx * ady)
        + (cdx * cdx + cdy * cdy) * (adx * bdy - bdx * ady)
    )
    orient = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
    return det * orient > 0.0


def delaunay_triangles(points: np.ndarray) -> list[tuple[int, int, int]]:
    """(n, 2) float points → list of triangulation faces (vertex index
    triples). Empty for n < 3 or fully degenerate (collinear) input."""
    pts = np.asarray(points, dtype=float)
    n = len(pts)
    if n < 3:
        return []

    center = pts.mean(axis=0)
    span = float(np.ptp(pts, axis=0).max())
    m = max(span, 1.0) * 64.0
    xs = list(pts[:, 0]) + [center[0] - m, center[0] + m, center[0]]
    ys = list(pts[:, 1]) + [center[1] - m, center[1] - m, center[1] + m]

    tris = [(n, n + 1, n + 2)]
    for i in range(n):
        px, py = xs[i], ys[i]
        bad = [
            t
            for t in tris
            if _in_circumcircle(xs[t[0]], ys[t[0]], xs[t[1]], ys[t[1]], xs[t[2]], ys[t[2]], px, py)
        ]
        if not bad:
            # numerically degenerate (e.g. duplicate point): skip insertion
            continue
        boundary: dict[tuple[int, int], int] = {}
        for t in bad:
            for a, b in ((t[0], t[1]), (t[1], t[2]), (t[2], t[0])):
                key = (a, b) if a < b else (b, a)
                boundary[key] = boundary.get(key, 0) + 1
        bad_set = set(bad)
        tris = [t for t in tris if t not in bad_set]
        for (a, b), cnt in boundary.items():
            if cnt == 1:
                tris.append((a, b, i))

    return sorted(
        tuple(sorted(t)) for t in tris if t[0] < n and t[1] < n and t[2] < n
    )


def delaunay_edges(points: np.ndarray) -> np.ndarray:
    """(n, 2) float points → (m, 2) int array of undirected edges (i < j)."""
    pts = np.asarray(points, dtype=float)
    n = len(pts)
    if n == 2:
        return np.array([[0, 1]], dtype=int)
    edges = set()
    for t in delaunay_triangles(pts):
        for a, b in ((t[0], t[1]), (t[1], t[2]), (t[2], t[0])):
            edges.add((a, b) if a < b else (b, a))
    if not edges:
        return np.zeros((0, 2), dtype=int)
    return np.array(sorted(edges), dtype=int)
