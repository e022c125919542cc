"""Ray/boundary geometry utilities (K15).

Math parity with /root/reference/unravel/soccer/models/utils.py:102-269
(ray_line_intersections, rotate_vectors, rotate_around_line) — reserved for
the pressing-intensity `line_method` boundary reflections (dormant in the
reference too, pressing_intensity.py:258-264). Pure NumPy, usable inside any
kernel."""

from __future__ import annotations

import numpy as np


def ray_line_intersections(
    positions: np.ndarray, velocities: np.ndarray, line_start: np.ndarray, line_end: np.ndarray
) -> np.ndarray:
    """Intersection points of n rays (position + t·velocity, t ≥ 0) with one
    segment; rows of NaN where there is no forward intersection."""
    positions = np.asarray(positions, dtype=float)
    velocities = np.asarray(velocities, dtype=float)
    p = np.asarray(line_start, dtype=float)
    r = np.asarray(line_end, dtype=float) - p

    out = np.full_like(positions, np.nan)
    # solve positions + t*v = p + u*r for each ray
    cross = velocities[:, 0] * r[1] - velocities[:, 1] * r[0]
    nonparallel = cross != 0
    diff = p[None, :] - positions
    t = (diff[:, 0] * r[1] - diff[:, 1] * r[0]) / np.where(nonparallel, cross, 1.0)
    u = (diff[:, 0] * velocities[:, 1] - diff[:, 1] * velocities[:, 0]) / np.where(
        nonparallel, cross, 1.0
    )
    hit = nonparallel & (t >= 0) & (u >= 0) & (u <= 1)
    out[hit] = positions[hit] + t[hit, None] * velocities[hit]
    return out


def rotate_vectors(vectors: np.ndarray, angle: float, origin=(0.0, 0.0)) -> np.ndarray:
    """Rotate 2-d vectors by `angle` radians around `origin`."""
    vectors = np.asarray(vectors, dtype=float)
    origin = np.asarray(origin, dtype=float)
    c, s = np.cos(angle), np.sin(angle)
    rot = np.array([[c, -s], [s, c]])
    return (vectors - origin) @ rot.T + origin


def rotate_around_line(
    points: np.ndarray, line_start: np.ndarray, line_end: np.ndarray
) -> np.ndarray:
    """180° reflection of points across the (infinite) line through the two
    endpoints — the pitch-boundary mirror the reference reserves for
    line_method."""
    points = np.asarray(points, dtype=float)
    p = np.asarray(line_start, dtype=float)
    d = np.asarray(line_end, dtype=float) - p
    d = d / np.linalg.norm(d)
    rel = points - p
    proj = (rel @ d)[:, None] * d[None, :]
    return p + 2 * proj - rel
