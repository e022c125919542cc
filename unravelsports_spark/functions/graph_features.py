"""Per-frame graph kernels: adjacency (K1), node features (K4), edge features
(K5), global-feature attach (K8), plus the plugin registry (§2.10).

These run inside Arrow grouped-map pandas UDFs (`applyInPandas`), one call per
*batch of frames*, looping frames with pure-NumPy bodies. Behavior parity with
the reference kernels (/root/reference/unravel/soccer/graphs/features/
adjacency_matrix_pl.py:9-48, node_features_pl.py:19-93, edge_features_pl.py:
18-81, unravel/utils/features/builtin.py) is locked by golden-fixture tests at
rtol 1e-3; the code is an independent Spark-first implementation.

User plugin contract (kept from the reference, features/utils.py:46-72): a
feature function takes **kwargs of per-frame numpy arrays plus `settings`, is
tagged via @graph_feature(feature_type=..., is_custom=...), and returns shape
(N,) or (N,k) for nodes, (N,N) or a tuple of (N,N) for edges.
"""

from __future__ import annotations

import numpy as np

from .normalize import (
    angle_between_rows,
    normalize_angles,
    normalize_between,
    normalize_distance,
    normalize_sincos,
    per_class_normalized,
    signed_speed_difference_normed,
    unit_vectors,
)


def graph_feature(feature_type: str, is_custom: bool = False):
    """Decorator marking a node/edge feature plugin (same public contract as
    the reference's @graph_feature)."""

    def deco(func):
        func.feature_type = feature_type
        func.is_custom = is_custom
        return func

    return deco


def verify_feature_funcs(funcs, feature_type: str):
    for f in funcs:
        if not callable(f) or not hasattr(f, "feature_type"):
            raise ValueError(
                f"feature function {getattr(f, '__name__', f)!r} must be decorated "
                f"with @graph_feature(feature_type={feature_type!r})"
            )
        if f.feature_type != feature_type:
            raise ValueError(
                f"{f.__name__} is a {f.feature_type!r} feature, expected {feature_type!r}"
            )


# ---------------------------------------------------------------------------
# Adjacency (K1) — adjacency_matrix_pl.py:9-48
# ---------------------------------------------------------------------------


def compute_adjacency_matrix(settings, **kw) -> np.ndarray:
    team = kw["team_id"]
    bot = kw["ball_owning_team_id"]
    n = team.shape[0]
    atype = settings.adjacency_matrix_type
    ball_id = settings.ball_id

    if atype == "dense":
        adj = np.ones((n, n), dtype=np.int32)
    elif atype == "dense_ap":
        is_att = team == np.unique(bot)[0]
        adj = np.outer(is_att, is_att).astype(np.int32)
    elif atype == "dense_dp":
        exclusion = np.asarray([ball_id, *np.unique(bot)])
        defensive_team = np.setdiff1d(team, exclusion)[0]
        is_def = team == defensive_team
        adj = np.outer(is_def, is_def).astype(np.int32)
    elif atype == "split_by_team":
        adj = (team[:, None] == team[None, :]).astype(np.int32)
    elif atype == "delaunay":
        # K3 (reference legacy API adjacency_matrix.py:60-125; the Polars
        # path raises NotImplementedError). Triangulate valid player
        # positions; ball connectivity is applied by the shared ctype block
        # below; no player self-loops, ball self-loop per settings.
        from .delaunay import delaunay_edges

        pts = np.stack((kw["x"], kw["y"]), axis=-1)
        player = team != ball_id
        valid = player & ~np.isnan(pts).any(axis=1)
        idx = np.where(valid)[0]
        adj = np.zeros((n, n), dtype=np.int32)
        if len(idx) >= 2:
            edges = delaunay_edges(pts[idx])
            if len(edges):
                src, dst = idx[edges[:, 0]], idx[edges[:, 1]]
                adj[src, dst] = 1
                adj[dst, src] = 1
    else:
        raise NotImplementedError(f"unknown adjacency_matrix_type {atype!r}")

    ctype = settings.adjacency_matrix_connect_type
    if ctype and ctype != "no_connection":
        ball_mask = (team[:, None] == ball_id) | (team[None, :] == ball_id)
        if ctype == "ball":
            adj = np.where(ball_mask, 1, adj)
        elif ctype == "ball_carrier":
            bc = kw.get("ball_carrier_idx")
            if bc is not None:
                adj[bc, ball_mask[bc, :]] = 1
                adj[ball_mask[:, bc], bc] = 1
    if atype == "delaunay":
        # reference delaunay path: ball self-loop is opt-in (b =
        # self_loop_ball, adjacency_matrix.py:122-124), overriding whatever
        # the connect block wrote on the diagonal
        ball_rows = np.where(team == ball_id)[0]
        adj[ball_rows, ball_rows] = 1 if getattr(settings, "self_loop_ball", False) else 0
    return adj


# ---------------------------------------------------------------------------
# Default node features (K4) — builtin.py:16-126
# ---------------------------------------------------------------------------


@graph_feature(feature_type="node")
def x_normed(**kw):
    dims = kw["settings"].pitch_dimensions
    return normalize_between(dims.x_dim.min, dims.x_dim.max, kw["x"])


@graph_feature(feature_type="node")
def y_normed(**kw):
    dims = kw["settings"].pitch_dimensions
    return normalize_between(dims.y_dim.min, dims.y_dim.max, kw["y"])


@graph_feature(feature_type="node")
def speeds_normed(**kw):
    s = kw["settings"]
    return per_class_normalized(
        kw["v"], kw["team_id"] == kw["ball_id"], s.max_ball_speed, s.max_player_speed
    )


@graph_feature(feature_type="node")
def velocity_components_2d_normed(**kw):
    uv = unit_vectors(kw["velocity"])
    ang = normalize_angles(np.arctan2(uv[:, 1], uv[:, 0]))
    return np.column_stack((normalize_sincos(np.sin(ang)), normalize_sincos(np.cos(ang))))


@graph_feature(feature_type="node")
def distance_to_goal_normed(**kw):
    s = kw["settings"]
    d = np.linalg.norm(kw["position"] - np.asarray(s.goal_mouth_position), axis=1)
    return normalize_distance(d, s.max_goal_distance)


@graph_feature(feature_type="node")
def distance_to_ball_normed(**kw):
    s = kw["settings"]
    d = np.linalg.norm(kw["position"] - kw["ball_position"], axis=1)
    return normalize_distance(d, s.max_distance)


@graph_feature(feature_type="node")
def is_possession_team(**kw):
    return np.where(
        kw["team_id"] == kw["possession_team_id"],
        1,
        kw["settings"].defending_team_node_value,
    )


@graph_feature(feature_type="node")
def is_gk(**kw):
    return np.where(kw["is_gk"], 1, 0.1)


@graph_feature(feature_type="node")
def is_ball(**kw):
    return np.where(kw["team_id"] == kw["ball_id"], 1, 0.1)


def _angle_components_to(target, position):
    vec = target - position
    ang = np.arctan2(vec[:, 1], vec[:, 0])
    return np.column_stack((normalize_sincos(np.sin(ang)), normalize_sincos(np.cos(ang))))


@graph_feature(feature_type="node")
def angle_to_goal_components_2d_normed(**kw):
    return _angle_components_to(np.asarray(kw["settings"].goal_mouth_position), kw["position"])


@graph_feature(feature_type="node")
def angle_to_ball_components_2d_normed(**kw):
    return _angle_components_to(kw["ball_position"], kw["position"])


@graph_feature(feature_type="node")
def is_ball_carrier(**kw):
    return np.where(kw["is_ball_carrier"], 1, 0.1)


DEFAULT_NODE_FEATURES = [
    x_normed,
    y_normed,
    speeds_normed,
    velocity_components_2d_normed,
    distance_to_goal_normed,
    distance_to_ball_normed,
    is_possession_team,
    is_gk,
    is_ball,
    angle_to_goal_components_2d_normed,
    angle_to_ball_components_2d_normed,
    is_ball_carrier,
]


# ---------------------------------------------------------------------------
# Default edge features (K5) — builtin.py:129-173
# ---------------------------------------------------------------------------


@graph_feature(feature_type="edge")
def distances_between_players_normed(**kw):
    pos = kw["position"]
    d = np.linalg.norm(pos[:, None, :] - pos[None, :, :], axis=-1)
    return normalize_distance(d, kw["settings"].max_distance)


@graph_feature(feature_type="edge")
def speed_difference_normed(**kw):
    s = kw["settings"]
    v = kw["v"]
    diff = np.nan_to_num(v[None, :] - v[:, None])
    return signed_speed_difference_normed(
        diff, kw["team_id"] == kw["ball_id"], s.max_ball_speed, s.max_player_speed
    )


@graph_feature(feature_type="edge")
def angle_between_players_normed(**kw):
    pos2 = kw["position"][:, :2]
    vec = pos2[:, None, :] - pos2[None, :, :]
    ang = np.nan_to_num(np.arctan2(vec[:, :, 1], vec[:, :, 0]))
    return (
        normalize_sincos(np.nan_to_num(np.cos(ang))),
        normalize_sincos(np.nan_to_num(np.sin(ang))),
    )


@graph_feature(feature_type="edge")
def velocity_difference_normed(**kw):
    pos2 = kw["position"][:, :2]
    vel = kw["velocity"]
    pos_vec = pos2[:, None, :] - pos2[None, :, :]  # (N, N, 2)
    vel_vec = vel[None, :, :] - vel[:, None, :]  # (N, N, 3)
    # reference compares the 2-d position delta with the first two velocity
    # components (builtin.py:166-173: angle_between slices [0:2] and [2:4])
    ang = angle_between_rows(pos_vec, vel_vec[:, :, :2])
    return (
        normalize_sincos(np.nan_to_num(np.cos(ang))),
        normalize_sincos(np.nan_to_num(np.sin(ang))),
    )


DEFAULT_EDGE_FEATURES = [
    distances_between_players_normed,
    speed_difference_normed,
    angle_between_players_normed,
    velocity_difference_normed,
]


# ---------------------------------------------------------------------------
# Drivers — node_features_pl.py:19-93, edge_features_pl.py:18-81
# ---------------------------------------------------------------------------


def compute_node_features(funcs, opts, settings, **kw):
    n = kw["team_id"].shape[0]
    call_kw = dict(kw)
    if opts:
        if "settings" in opts:
            raise ValueError("'settings' is a reserved feature-option key")
        call_kw.update(opts)
    call_kw["settings"] = settings

    cols = []
    dims = {}
    for func in funcs:
        value = func(**call_kw)
        if not isinstance(value, np.ndarray):
            raise ValueError(f"{func.__name__} must return a numpy array")
        if value.shape == (n,):
            cols.append(value)
            dims[func.__name__] = 1
        elif value.ndim > 1 and value.shape[0] == n:
            cols.extend(value[:, i] for i in range(value.shape[1]))
            dims[func.__name__] = value.shape[1]
        else:
            raise ValueError(
                f"{func.__name__}: expected shape ({n},) or ({n}, k), got {value.shape}"
            )
    return np.nan_to_num(np.stack(cols, axis=-1)), dims


def compute_edge_features(adjacency_matrix, funcs, opts, settings, **kw):
    n = kw["team_id"].shape[0]
    call_kw = dict(kw)
    if opts:
        if "settings" in opts:
            raise ValueError("'settings' is a reserved feature-option key")
        call_kw.update(opts)
    call_kw["settings"] = settings

    mats = []
    dims = {}
    for func in funcs:
        value = func(**call_kw)
        parts = value if isinstance(value, tuple) else (value,)
        for m in parts:
            if not isinstance(m, np.ndarray) or m.shape != (n, n):
                raise ValueError(f"{func.__name__}: expected shape ({n}, {n}), got {getattr(m, 'shape', None)}")
        mats.extend(parts)
        dims[func.__name__] = len(parts)

    nz = np.where(adjacency_matrix == 1)
    e = np.stack([m[nz] for m in mats], axis=1)
    return np.nan_to_num(e), dims


def add_global_features(node_features, global_features, global_feature_type, ball_idx):
    """K8 (node_features_pl.py:6-16): attach graph-level values to the ball
    row only, or tile onto all rows."""
    if global_feature_type == "ball":
        eg = np.zeros((node_features.shape[0], global_features.shape[0]))
        eg[ball_idx] = global_features
        return np.hstack((node_features, eg))
    if global_feature_type == "all":
        return np.hstack((node_features, np.tile(global_features, (node_features.shape[0], 1))))
    raise ValueError("global_feature_type must be 'ball' or 'all'")


def frame_kwargs(d: dict, settings) -> dict:
    """Derived per-frame kwargs (graph_converter.py:564-600): nan-guarded
    position/velocity stacks, ball index/position, carrier index."""
    d = dict(d)
    d["ball_id"] = settings.ball_id
    d["possession_team_id"] = d["ball_owning_team_id"][0]
    d["is_gk"] = d["position_name"] == settings.goalkeeper_id
    d["position"] = np.nan_to_num(
        np.stack((d["x"], d["y"], d["z"]), axis=-1), nan=1e-10, posinf=1e3, neginf=-1e3
    )
    d["velocity"] = np.nan_to_num(
        np.stack((d["vx"], d["vy"], d["vz"]), axis=-1), nan=1e-10, posinf=1e3, neginf=-1e3
    )
    ball_rows = np.where(d["team_id"] == d["ball_id"])[0]
    if len(ball_rows) >= 1:
        d["ball_idx"] = ball_rows
        d["ball_position"] = d["position"][ball_rows][0]
    else:
        d["ball_idx"] = 0
        d["ball_position"] = np.asarray([0.0, 0.0, 0.0])
    carriers = np.where(d["is_ball_carrier"])[0]
    d["ball_carrier_idx"] = carriers[0] if len(carriers) else None
    return d
