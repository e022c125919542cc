"""Pure-NumPy/stdlib 2-D Delaunay triangulation (Bowyer–Watson).

Replaces scipy.spatial.Delaunay for the K3 delaunay adjacency kernel
(/root/reference/unravel/soccer/graphs/features/adjacency_matrix.py:60-125)
— scipy is not available in this environment. For points in general position
(no four cocircular) the Delaunay triangulation is unique, so the edge set
matches scipy's. Degenerate inputs (all collinear) yield an empty edge set
instead of scipy's QhullError.

Uses the ghost-vertex ("point at infinity") formulation instead of a finite
super-triangle: a finite super-triangle fails on near-degenerate real
triangles whose circumradius exceeds the super-triangle extent (the super
vertices then sit inside the circumcircle and the face is never created).
A ghost triangle's "circumdisk" is the open half-plane beyond its hull edge
plus the open edge segment itself, so no placement heuristic exists to get
wrong. Predicates are evaluated in float with an exact Fraction fallback
when the result is within rounding error of zero.

n is small (≤ 22 players per frame), so the O(n²) incremental insertion with
scalar predicates is faster than any vectorized variant.
"""

from __future__ import annotations

from fractions import Fraction

import numpy as np

_GHOST = -1


def _orient(ax, ay, bx, by, cx, cy) -> float:
    """Sign of the cross product (b-a) × (c-a); exact for ties."""
    t1 = (bx - ax) * (cy - ay)
    t2 = (by - ay) * (cx - ax)
    d = t1 - t2
    m = abs(t1) + abs(t2)
    if abs(d) > 1e-13 * m:
        return d
    ax, ay, bx, by, cx, cy = map(Fraction, (ax, ay, bx, by, cx, cy))
    e = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
    return 0.0 if e == 0 else (1.0 if e > 0 else -1.0)


def _incircle(ax, ay, bx, by, cx, cy, px, py) -> float:
    """Signed in-circumcircle determinant (positive = inside, for a CCW
    triangle); exact for ties."""
    adx, ady = ax - px, ay - py
    bdx, bdy = bx - px, by - py
    cdx, cdy = cx - px, cy - py
    t1 = (adx * adx + ady * ady) * (bdx * cdy - cdx * bdy)
    t2 = (bdx * bdx + bdy * bdy) * (adx * cdy - cdx * ady)
    t3 = (cdx * cdx + cdy * cdy) * (adx * bdy - bdx * ady)
    det = t1 - t2 + t3
    m = abs(t1) + abs(t2) + abs(t3)
    if abs(det) > 1e-13 * m:
        return det
    ax, ay, bx, by, cx, cy, px, py = map(Fraction, (ax, ay, bx, by, cx, cy, px, py))
    adx, ady = ax - px, ay - py
    bdx, bdy = bx - px, by - py
    cdx, cdy = cx - px, cy - py
    e = (
        (adx * adx + ady * ady) * (bdx * cdy - cdx * bdy)
        - (bdx * bdx + bdy * bdy) * (adx * cdy - cdx * ady)
        + (cdx * cdx + cdy * cdy) * (adx * bdy - bdx * ady)
    )
    return 0.0 if e == 0 else (1.0 if e > 0 else -1.0)


def _in_circumcircle(ax, ay, bx, by, cx, cy, px, py) -> bool:
    """p strictly inside the circumcircle of (a, b, c), any orientation."""
    det = _incircle(ax, ay, bx, by, cx, cy, px, py)
    if det == 0.0:
        return False
    orient = _orient(ax, ay, bx, by, cx, cy)
    return (det > 0.0) == (orient > 0.0) and orient != 0.0


def _in_disk(t, px, py, xs, ys) -> bool:
    """p strictly inside triangle t's (possibly ghost) open circumdisk."""
    a, b, g = t
    if g != _GHOST:
        return _in_circumcircle(xs[a], ys[a], xs[b], ys[b], xs[g], ys[g], px, py)
    # ghost (a, b, G): real directed hull edge a→b with the exterior on its
    # left; disk = open left half-plane ∪ open segment (a, b)
    o = _orient(xs[a], ys[a], xs[b], ys[b], px, py)
    if o != 0.0:
        return o > 0.0
    dx, dy = xs[b] - xs[a], ys[b] - ys[a]
    dot = (px - xs[a]) * dx + (py - ys[a]) * dy
    return 0.0 < dot < dx * dx + dy * dy


def _canon(t):
    if t[0] == _GHOST:
        return (t[1], t[2], _GHOST)
    if t[1] == _GHOST:
        return (t[2], t[0], _GHOST)
    return t


def delaunay_triangles(points: np.ndarray) -> list[tuple[int, int, int]]:
    """(n, 2) float points → list of triangulation faces (vertex index
    triples). Empty for n < 3 or fully degenerate (collinear) input."""
    pts = np.asarray(points, dtype=float)
    n = len(pts)
    if n < 3:
        return []
    xs, ys = pts[:, 0].tolist(), pts[:, 1].tolist()

    i0 = 0
    i1 = next((j for j in range(1, n) if xs[j] != xs[i0] or ys[j] != ys[i0]), None)
    if i1 is None:
        return []
    i2 = next(
        (
            j
            for j in range(1, n)
            if j != i1 and _orient(xs[i0], ys[i0], xs[i1], ys[i1], xs[j], ys[j]) != 0.0
        ),
        None,
    )
    if i2 is None:
        return []
    a, b, c = i0, i1, i2
    if _orient(xs[a], ys[a], xs[b], ys[b], xs[c], ys[c]) < 0:
        b, c = c, b
    # one CCW real triangle + a ghost per hull edge (reversed orientation so
    # every undirected edge appears once per direction across its two faces)
    tris = {(a, b, c), (b, a, _GHOST), (c, b, _GHOST), (a, c, _GHOST)}
    seeded = {i0, i1, i2}

    for i in range(n):
        if i in seeded:
            continue
        px, py = xs[i], ys[i]
        bad = [t for t in tris if _in_disk(t, px, py, xs, ys)]
        if not bad:
            # exact duplicate of an existing vertex: skip insertion
            continue
        edges = set()
        for t in bad:
            edges.add((t[0], t[1]))
            edges.add((t[1], t[2]))
            edges.add((t[2], t[0]))
        boundary = [e for e in edges if (e[1], e[0]) not in edges]
        tris.difference_update(bad)
        for u, v in boundary:
            tris.add(_canon((u, v, i)))

    return sorted(tuple(sorted(t)) for t in tris if t[2] != _GHOST)


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
