"""Delaunay triangulation (K3) correctness.

No scipy in this environment, so correctness is established structurally:
a triangulation of a planar point set is THE Delaunay triangulation iff every
triangle's circumcircle is empty of other points (for points in general
position it is unique). We verify the empty-circumcircle property plus the
Euler edge-count identity E = 3n - 3 - h (h = hull size) on random point
sets, and the adjacency wiring on top.
"""

import numpy as np
import pytest
from hypothesis import given, settings as hyp_settings
from hypothesis import strategies as st

from unravelsports_spark.functions.delaunay import (
    _in_circumcircle,
    delaunay_edges,
    delaunay_triangles,
)


def _hull_size(pts: np.ndarray) -> int:
    """Convex hull vertex count via monotone chain."""
    P = sorted(map(tuple, pts))
    if len(P) <= 2:
        return len(P)

    def cross(o, a, b):
        return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])

    def half(pp):
        # strict turn test: collinear boundary points stay on the hull (they
        # are triangulation vertices, so Euler's E = 3n - 3 - h counts them)
        out = []
        for p in pp:
            while len(out) >= 2 and cross(out[-2], out[-1], p) < 0:
                out.pop()
            out.append(p)
        return out

    return len(half(P)) + len(half(P[::-1])) - 2


def _collinear(pts: np.ndarray) -> bool:
    a = pts[0]
    for b in pts[1:]:
        if not np.allclose(b, a):
            d = b - a
            cross = d[0] * (pts[:, 1] - a[1]) - d[1] * (pts[:, 0] - a[0])
            return bool(np.all(np.abs(cross) < 1e-12))
    return True


@given(
    st.lists(
        st.tuples(
            st.floats(-50, 50, allow_nan=False).map(lambda v: round(v, 3)),
            st.floats(-30, 30, allow_nan=False).map(lambda v: round(v, 3)),
        ),
        min_size=3,
        max_size=24,
        unique=True,
    )
)
@hyp_settings(max_examples=60, deadline=None)
def test_delaunay_properties(coords):
    pts = np.asarray(coords, dtype=float)
    if _collinear(pts):
        assert len(delaunay_edges(pts)) == 0
        return
    edges = delaunay_edges(pts)
    n, h = len(pts), _hull_size(pts)
    # Euler: any triangulation of the set has exactly 3n - 3 - h edges
    assert len(edges) == 3 * n - 3 - h, (pts, edges)
    # empty-circumcircle on the actual faces: Delaunay-ness
    for a, b, c in delaunay_triangles(pts):
        for p in range(n):
            if p in (a, b, c):
                continue
            assert not _in_circumcircle(
                pts[a, 0], pts[a, 1], pts[b, 0], pts[b, 1], pts[c, 0], pts[c, 1],
                pts[p, 0], pts[p, 1],
            ), f"point {p} inside circumcircle of {(a, b, c)}"


def test_delaunay_small_cases():
    assert delaunay_edges(np.zeros((0, 2))).shape == (0, 2)
    assert delaunay_edges(np.array([[1.0, 2.0]])).shape == (0, 2)
    np.testing.assert_array_equal(delaunay_edges(np.array([[0.0, 0.0], [1.0, 0.0]])), [[0, 1]])
    # unit square: 4 hull edges + 1 diagonal
    sq = np.array([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0], [1.0, 1.0]])
    assert len(delaunay_edges(sq)) == 5


def test_delaunay_collinear_returns_empty():
    pts = np.array([[float(i), 2.0 * i] for i in range(6)])
    assert len(delaunay_edges(pts)) == 0


def test_delaunay_adjacency_kernel():
    from unravelsports_spark.functions.graph_features import compute_adjacency_matrix
    from unravelsports_spark.settings import GraphSettings

    rng = np.random.default_rng(7)
    n_players = 10
    team = np.array(["home"] * 5 + ["away"] * 5 + ["ball"])
    x = np.r_[rng.uniform(-40, 40, n_players), 0.1]
    y = np.r_[rng.uniform(-25, 25, n_players), 0.2]
    gs = GraphSettings(
        home_team_id="home", away_team_id="away",
        adjacency_matrix_type="delaunay", adjacency_matrix_connect_type="ball",
    )
    kw = dict(team_id=team, ball_owning_team_id=np.array(["home"] * 11), x=x, y=y)
    adj = compute_adjacency_matrix(gs, **kw)
    assert adj.shape == (11, 11)
    assert np.array_equal(adj, adj.T)
    # ball row/col fully connected (connect_type='ball'), no ball self-loop
    assert adj[10, :10].all() and adj[:10, 10].all()
    assert adj[10, 10] == 0
    # players have no self-loops under delaunay
    assert np.trace(adj[:10, :10]) == 0
    # player block matches the raw triangulation
    from unravelsports_spark.functions.delaunay import delaunay_edges as de

    edges = de(np.stack([x[:10], y[:10]], axis=-1))
    expect = np.zeros((10, 10), dtype=int)
    expect[edges[:, 0], edges[:, 1]] = 1
    assert np.array_equal(adj[:10, :10], expect | expect.T)


def test_delaunay_adjacency_nan_positions_isolated():
    from unravelsports_spark.functions.graph_features import compute_adjacency_matrix
    from unravelsports_spark.settings import GraphSettings

    team = np.array(["home", "home", "away", "away", "ball"])
    x = np.array([0.0, 10.0, np.nan, 5.0, 1.0])
    y = np.array([0.0, 0.0, 5.0, 5.0, 1.0])
    gs = GraphSettings(
        home_team_id="home", away_team_id="away",
        adjacency_matrix_type="delaunay", adjacency_matrix_connect_type="no_connection",
    )
    kw = dict(team_id=team, ball_owning_team_id=np.array(["home"] * 5), x=x, y=y)
    adj = compute_adjacency_matrix(gs, **kw)
    # the NaN player (idx 2) has no triangulation edges
    assert adj[2].sum() == 0 and adj[:, 2].sum() == 0
    # remaining 3 valid players form a triangle
    assert adj[np.ix_([0, 1, 3], [0, 1, 3])].sum() == 6
