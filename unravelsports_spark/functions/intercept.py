"""Time-to-intercept / probability-to-intercept kernels (K9, K10).

Math parity with /root/reference/unravel/soccer/models/utils.py:4-99 (the
pressing-intensity model of Bekkers, arXiv:2501.04712); independent
implementation, verified against the reference's published golden scalar
TTI[0][0] = 2.6428493704618106 (tests/test_soccer.py:563-566).
"""

from __future__ import annotations

import numpy as np

_EPS = 1e-10


def time_to_intercept(
    p1: np.ndarray,
    p2: np.ndarray,
    v1: np.ndarray,
    v2: np.ndarray,
    reaction_time: float,
    max_object_speed: float,
) -> np.ndarray:
    """t[i, j]: time for presser j (p1 rows) to reach target i (p2 rows).

    t = |u|·angle(u, d2−p1)/π + reaction_time + |d2 − (p1 + v1·rt)| / vmax
    where u is the presser's velocity and d2 the target's projected position.
    """
    u = v1  # presser velocity ((p1+v1)−p1 in the model formulation)
    d2 = p2 + v2  # target destination after one second

    rel = d2[:, None, :] - p1[None, :, :]  # (m, n, dim)
    u_mag = np.linalg.norm(u, axis=-1)  # (n,)
    rel_mag = np.linalg.norm(rel, axis=-1)  # (m, n)
    cos_num = np.sum(u[None, :, :] * rel, axis=-1)
    angle = np.arccos(cos_num / (u_mag[None, :] * rel_mag + _EPS))

    reach = p1 + v1 * reaction_time  # presser position after reacting
    dist_after_reaction = np.linalg.norm(d2[:, None, :] - reach[None, :, :], axis=-1)

    return u_mag[None, :] * angle / np.pi + reaction_time + dist_after_reaction / max_object_speed


def probability_to_intercept(
    time_to_intercept: np.ndarray, tti_sigma: float, tti_time_threshold: float
) -> np.ndarray:
    """Logistic 1/(1+exp(−π/√3/σ·(thr−tti))), exponent clipped to ±700 to
    avoid overflow (reference models/utils.py:7-13)."""
    exponent = -np.pi / np.sqrt(3.0) / tti_sigma * (tti_time_threshold - time_to_intercept)
    return 1.0 / (1.0 + np.exp(np.clip(exponent, -700, 700)))
