"""Bridge from a loaded kloppy ``TrackingDataset`` object to the canonical
Spark pipeline — the reference's front door
(`/root/reference/unravel/soccer/dataset/kloppy_polars.py:813-921` accepts
any kloppy provider and calls ``to_df`` on it).

The bridge is duck-typed against kloppy's *public* metadata surface
(``dataset.metadata.teams`` → ``team.players`` → ``player.player_id`` /
``player.starting_position``; ``metadata.game_id`` / ``frame_rate`` /
``pitch_dimensions``; ``dataset.to_df(engine="pandas")``), so it needs no
kloppy import of its own: any object exposing that surface works, and every
kloppy provider (Sportec, SkillCorner, SecondSpectrum, StatsPerform, TRACAB,
PFF, …) does. The wide frame then rides the existing one-projection melt +
kinematics pipeline (``TrackingDataset.load_wide``).

Scale note: kloppy datasets are single-match, in-memory objects — the
driver-side ``to_df`` hand-off is inherently bounded (one match ≈ 10⁵ rows).
Fleet-scale ingest of many matches runs this per match and unions the
canonical tables, or uses the native file readers (datasets/sportec.py,
datasets/skillcorner.py) that never materialize on the driver.
"""

from __future__ import annotations

from typing import Optional
from uuid import uuid4

import pandas as pd
from pyspark.sql import SparkSession

from ..operators.melt import TrackedObject
from ..schema import BALL, Column
from ..settings import DefaultSettings, Dimension, PitchDimensions
from .tracking import TrackingDataset


def _position_code(pos) -> Optional[str]:
    """kloppy Position → short code ('GK', 'RCB', …); tolerate plain strings."""
    if pos is None:
        return None
    code = getattr(pos, "code", None)
    return str(code) if code is not None else str(pos)


def objects_from_metadata(metadata) -> tuple[list[TrackedObject], bool]:
    """(tracked objects incl. ball, all_positions_missing) from kloppy
    metadata. Mirrors the reference's __get_objects
    (kloppy_polars.py:220-291): when no player has a starting position the
    caller should enable goalkeeper inference."""
    home_team, away_team = metadata.teams
    objects: list[TrackedObject] = []
    any_position = False
    for team in (home_team, away_team):
        for p in team.players:
            code = _position_code(getattr(p, "starting_position", None))
            any_position = any_position or code is not None
            objects.append(TrackedObject(str(p.player_id), str(team.team_id), code))
    objects.append(TrackedObject(BALL, BALL, None))
    return objects, not any_position


def settings_from_metadata(metadata) -> DefaultSettings:
    """DefaultSettings seeded from kloppy metadata (team ids, frame rate,
    pitch dimensions, provider, orientation)."""
    home_team, away_team = metadata.teams
    settings = DefaultSettings(
        home_team_id=str(home_team.team_id),
        away_team_id=str(away_team.team_id),
        provider=str(getattr(metadata, "provider", None) or "kloppy"),
        orientation=str(getattr(metadata, "orientation", None) or "STATIC_HOME_AWAY"),
    )
    frame_rate = getattr(metadata, "frame_rate", None)
    if frame_rate:
        settings.frame_rate = int(round(float(frame_rate)))
    dims = getattr(metadata, "pitch_dimensions", None)
    if dims is not None and getattr(dims, "x_dim", None) is not None:
        x, y = dims.x_dim, dims.y_dim
        if x.min is not None and x.max is not None and y.min is not None and y.max is not None:
            settings.pitch_dimensions = PitchDimensions(
                x_dim=Dimension(float(x.min), float(x.max)),
                y_dim=Dimension(float(y.min), float(y.max)),
                standardized=bool(getattr(dims, "standardized", False)),
            )
    return settings


def _normalize_timestamp(pdf: pd.DataFrame) -> pd.DataFrame:
    """Canonical timestamp = integer millis from period start. kloppy's
    ``to_df`` has shipped it as timedelta64 and as float seconds across
    versions (the reference normalizes to Duration-ms at
    kloppy_polars.py:399)."""
    ts = pdf[Column.TIMESTAMP]
    if pd.api.types.is_timedelta64_dtype(ts):
        pdf[Column.TIMESTAMP] = (ts / pd.Timedelta(milliseconds=1)).round().astype("int64")
    elif pd.api.types.is_float_dtype(ts):
        pdf[Column.TIMESTAMP] = (ts * 1000.0).round().astype("int64")
    else:
        pdf[Column.TIMESTAMP] = ts.astype("int64")
    return pdf


def load_kloppy(
    kloppy_dataset,
    spark: SparkSession,
    settings: Optional[DefaultSettings] = None,
    game_id: Optional[str] = None,
    **load_kw,
) -> TrackingDataset:
    """Load a kloppy ``TrackingDataset`` object into the canonical pipeline.

    ``load_kw`` forwards to :meth:`TrackingDataset.load_wide`
    (smoothing params, ``orient_ball_owning``, ``infer_goalkeepers_flag``).
    When no player carries a starting position, goalkeeper inference is
    enabled automatically, matching the reference."""
    metadata = kloppy_dataset.metadata
    objects, positions_missing = objects_from_metadata(metadata)
    if settings is None:
        settings = settings_from_metadata(metadata)
    if game_id is None:
        game_id = str(getattr(metadata, "game_id", None) or uuid4())
    if positions_missing:
        load_kw.setdefault("infer_goalkeepers_flag", True)

    pdf = kloppy_dataset.to_df(engine="pandas")
    pdf = _normalize_timestamp(pdf.copy())
    for col in (Column.BALL_STATE, Column.BALL_OWNING_TEAM_ID):
        if col in pdf.columns:
            pdf[col] = pdf[col].map(lambda v: None if v is None or pd.isna(v) else str(v))
        else:
            pdf[col] = None
    wide = spark.createDataFrame(pdf)
    return TrackingDataset.load_wide(wide, objects, settings, game_id=game_id, **load_kw)
