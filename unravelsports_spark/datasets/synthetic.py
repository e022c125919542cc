"""Deterministic synthetic canonical tracking table (FIXTURES.md §1).

22 players + ball per frame, pitch-centered meters, ~25 fps, possession runs,
one ball carrier per frame on the owning team. Used by tests and bench for
the model kernels — no provider parsing needed (the reference exercises the
same surface through kloppy samples, tests/test_soccer.py:124-144).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..schema import BALL, Column, TRACKING_SCHEMA

HOME = "home_team"
AWAY = "away_team"


def synthetic_tracking_pandas(
    n_frames: int = 200,
    n_games: int = 1,
    seed: int = 7,
    frame_rate: int = 25,
    missing_player_frames: tuple[int, ...] = (),
    missing_ball_frames: tuple[int, ...] = (),
) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    dt_ms = int(1000 / frame_rate)
    rows = []
    for g in range(n_games):
        game_id = f"game_{g}"
        player_ids = [f"{t}_p{i:02d}" for t in ("h", "a") for i in range(11)]
        team_ids = [HOME] * 11 + [AWAY] * 11
        positions = (["GK"] + ["CB", "LB", "RB", "CM", "CM", "LM", "RM", "ST", "ST", "CAM"]) * 2
        # smooth random walks per object
        x = rng.uniform(-45, 45, size=22)
        y = rng.uniform(-30, 30, size=22)
        vx = rng.normal(0, 2, size=22)
        vy = rng.normal(0, 2, size=22)
        bx, by, bz = 0.0, 0.0, 0.1
        bvx, bvy, bvz = rng.normal(0, 4), rng.normal(0, 4), 0.0
        owning = HOME
        for f in range(n_frames):
            period = 1 if f < n_frames // 2 else 2
            frame_id = f
            ts = (f - (0 if period == 1 else n_frames // 2)) * dt_ms
            if f % 97 == 0 and f > 0:
                owning = AWAY if owning == HOME else HOME
            # kinematics step
            vx = np.clip(vx + rng.normal(0, 0.5, 22), -8, 8)
            vy = np.clip(vy + rng.normal(0, 0.5, 22), -8, 8)
            x = np.clip(x + vx / frame_rate, -52.5, 52.5)
            y = np.clip(y + vy / frame_rate, -34, 34)
            bvx = float(np.clip(bvx + rng.normal(0, 1.0), -20, 20))
            bvy = float(np.clip(bvy + rng.normal(0, 1.0), -20, 20))
            bx = float(np.clip(bx + bvx / frame_rate, -52.5, 52.5))
            by = float(np.clip(by + bvy / frame_rate, -34, 34))

            own_idx = [i for i in range(22) if team_ids[i] == owning]
            dists = [(x[i] - bx) ** 2 + (y[i] - by) ** 2 for i in own_idx]
            carrier = own_idx[int(np.argmin(dists))]
            label = int(rng.integers(0, 2))

            skip_players = set()
            if f in missing_player_frames:
                skip_players = {3, 7, 15}
            for i in range(22):
                if i in skip_players:
                    continue
                v = float(np.hypot(vx[i], vy[i]))
                rows.append(
                    (game_id, period, frame_id, ts, player_ids[i], team_ids[i],
                     positions[i], float(x[i]), float(y[i]), 0.0,
                     float(vx[i]), float(vy[i]), 0.0, v,
                     0.0, 0.0, 0.0, 0.0, "alive", owning, i == carrier,
                     label, f"{game_id}-{frame_id}")
                )
            if f not in missing_ball_frames:
                bv = float(np.hypot(bvx, bvy))
                rows.append(
                    (game_id, period, frame_id, ts, BALL, BALL, None,
                     bx, by, bz, bvx, bvy, bvz, bv,
                     0.0, 0.0, 0.0, 0.0, "alive", owning, False,
                     label, f"{game_id}-{frame_id}")
                )
    cols = [f.name for f in TRACKING_SCHEMA.fields]
    return pd.DataFrame(rows, columns=cols)


def synthetic_tracking_df(spark, **kwargs):
    pdf = synthetic_tracking_pandas(**kwargs)
    return spark.createDataFrame(pdf, schema=TRACKING_SCHEMA)
