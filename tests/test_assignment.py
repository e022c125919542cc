"""Property tests for the pure-NumPy scipy replacements.

linear_sum_assignment (functions/assignment.py) is checked against an
exhaustive permutation search: for every matrix the returned assignment must
be valid (unique rows/cols, size min(n, m)) and its cost must equal the true
optimum. savgol_filter (functions/savgol.py) is checked against a naive
per-point least-squares polynomial fit, the defining computation it is a
closed form of.
"""

import itertools

import numpy as np
from hypothesis import given, settings as hyp_settings
from hypothesis import strategies as st

from unravelsports_spark.functions.assignment import linear_sum_assignment
from unravelsports_spark.functions.savgol import savgol_filter


def _brute_optimum(cost: np.ndarray) -> float:
    r, c = cost.shape
    if r <= c:
        return min(
            sum(cost[i, j] for i, j in enumerate(perm))
            for perm in itertools.permutations(range(c), r)
        )
    return min(
        sum(cost[i, j] for j, i in enumerate(perm))
        for perm in itertools.permutations(range(r), c)
    )


@given(
    rows=st.integers(1, 6),
    cols=st.integers(1, 6),
    seed=st.integers(0, 10_000),
    scale=st.sampled_from([1.0, 1e-3, 1e4]),
    integral=st.booleans(),
)
@hyp_settings(max_examples=150, deadline=None)
def test_assignment_matches_brute_force(rows, cols, seed, scale, integral):
    rng = np.random.default_rng(seed)
    cost = rng.uniform(-10, 10, (rows, cols)) * scale
    if integral:
        # integral costs create ties — the optimum is still unique in value
        cost = np.round(cost / scale) * scale
    ri, ci = linear_sum_assignment(cost)
    k = min(rows, cols)
    assert len(ri) == len(ci) == k
    assert len(set(ri.tolist())) == k and len(set(ci.tolist())) == k
    assert ((0 <= ri) & (ri < rows)).all() and ((0 <= ci) & (ci < cols)).all()
    got = float(cost[ri, ci].sum())
    best = _brute_optimum(cost)
    assert abs(got - best) <= 1e-9 * max(1.0, abs(best)), (cost, ri, ci, got, best)


def test_assignment_known_case():
    # classic example: optimum is the anti-diagonal
    cost = np.array([[4.0, 1.0, 3.0], [2.0, 0.0, 5.0], [3.0, 2.0, 2.0]])
    ri, ci = linear_sum_assignment(cost)
    assert float(cost[ri, ci].sum()) == 5.0


def _savgol_naive(x: np.ndarray, window: int, poly: int) -> np.ndarray:
    """Per-point least-squares fit, straight from the definition
    (scipy mode='interp' edge semantics)."""
    n, half = len(x), window // 2
    out = np.empty(n)
    for i in range(half, n - half):
        pos = np.arange(-half, half + 1)
        out[i] = np.polynomial.polynomial.polyfit(pos, x[i - half : i + half + 1], poly)[0]
    pos = np.arange(window)
    head = np.polynomial.polynomial.polyfit(pos, x[:window], poly)
    for i in range(half):
        out[i] = np.polynomial.polynomial.polyval(pos[i], head)
    tail = np.polynomial.polynomial.polyfit(pos, x[n - window :], poly)
    for i in range(half + 1, window):
        out[n - window + i] = np.polynomial.polynomial.polyval(pos[i], tail)
    return out


@given(
    n=st.integers(7, 40),
    window=st.sampled_from([3, 5, 7]),
    poly=st.integers(1, 2),
    seed=st.integers(0, 10_000),
)
@hyp_settings(max_examples=60, deadline=None)
def test_savgol_matches_naive_least_squares(n, window, poly, seed):
    if poly >= window:
        poly = window - 1
    rng = np.random.default_rng(seed)
    x = rng.normal(0, 5, n).cumsum()  # smooth-ish trajectory like a coordinate
    if n < window:
        return
    got = savgol_filter(x, window, poly)
    want = _savgol_naive(x, window, poly)
    np.testing.assert_allclose(got, want, rtol=1e-8, atol=1e-8)


# ---------------------------------------------------------------------------
# TTI/PTI kernel properties (beyond the single golden scalar)
# ---------------------------------------------------------------------------

from unravelsports_spark.functions.intercept import (  # noqa: E402
    probability_to_intercept,
    time_to_intercept,
)


@given(seed=st.integers(0, 10_000), m=st.integers(1, 8), n=st.integers(1, 8))
@hyp_settings(max_examples=40, deadline=None)
def test_tti_stationary_reduces_to_distance(seed, m, n):
    """With zero velocities and no reaction time, TTI is pure travel time:
    distance / vmax (the angle term vanishes with |u| = 0)."""
    rng = np.random.default_rng(seed)
    p1 = rng.uniform(-50, 50, (n, 3))
    p2 = rng.uniform(-50, 50, (m, 3))
    t = time_to_intercept(p1, p2, np.zeros((n, 3)), np.zeros((m, 3)), 0.0, 13.0)
    want = np.linalg.norm(p2[:, None, :] - p1[None, :, :], axis=-1) / 13.0
    np.testing.assert_allclose(t, want, rtol=1e-9)


@given(seed=st.integers(0, 10_000))
@hyp_settings(max_examples=40, deadline=None)
def test_tti_monotone_in_reaction_time_and_pti_monotone(seed):
    rng = np.random.default_rng(seed)
    n, m = 5, 4
    p1, p2 = rng.uniform(-50, 50, (n, 3)), rng.uniform(-50, 50, (m, 3))
    v1, v2 = rng.uniform(-5, 5, (n, 3)), rng.uniform(-5, 5, (m, 3))
    t0 = time_to_intercept(p1, p2, v1, v2, 0.0, 13.0)
    # longer reaction delays interception whenever the presser's drift during
    # the reaction doesn't shorten the remaining distance by more than rt*vmax;
    # the additive rt term guarantees t(rt) >= t(0) + rt - drift/vmax >= t(0)
    # when v1 = 0
    t1 = time_to_intercept(p1, p2, np.zeros((n, 3)), v2, 0.7, 13.0)
    t1b = time_to_intercept(p1, p2, np.zeros((n, 3)), v2, 0.0, 13.0)
    assert np.all(t1 >= t1b + 0.7 - 1e-12)
    # PTI is a decreasing function of TTI, bounded in [0, 1]
    p = probability_to_intercept(t0, 0.45, 1.5)
    assert np.all((p >= 0) & (p <= 1))
    flat = probability_to_intercept(np.sort(t0, axis=None), 0.45, 1.5)
    assert np.all(np.diff(flat) <= 1e-12)


def test_pti_threshold_midpoint():
    # tti exactly at the threshold -> probability exactly 0.5
    assert probability_to_intercept(np.array([[1.5]]), 0.45, 1.5)[0, 0] == 0.5
