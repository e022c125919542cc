"""Generic wide-frame ingest: any kloppy-`to_df`-shaped table (one row per
frame, `<object_id>_x` / `<object_id>_y` [/ `_z`] coordinate columns) →
canonical long tracking table with the full kinematics pipeline.

This is the provider-agnostic ingest path mirroring the reference's
`KloppyPolarsDataset` accepting any kloppy `TrackingDataset`
(`/root/reference/unravel/soccer/dataset/kloppy_polars.py:813-921`): kloppy
providers (SkillCorner, Sportec, SecondSpectrum, StatsPerform, TRACAB, …)
all normalize to that wide frame, so consuming the wide frame directly
covers every provider without per-provider parsers. Team membership isn't
in the wide frame (kloppy keeps it in metadata), so it's supplied as an
explicit mapping or a prefix convention.

Scale: object discovery reads only the schema (no data pass); the
wide→long melt is the existing one-projection unpivot, and everything
after is the shared kinematics pipeline.
"""

from __future__ import annotations

import re
from typing import Callable, Iterable, Optional

from pyspark.sql import DataFrame

from ..operators.melt import TrackedObject
from ..schema import BALL, Column
from ..settings import DefaultSettings
from .tracking import TrackingDataset

#: frame-level (index) columns that are not object coordinates
_INDEX_COLS = {
    Column.PERIOD_ID, Column.TIMESTAMP, Column.FRAME_ID,
    Column.BALL_STATE, Column.BALL_OWNING_TEAM_ID,
}

_COORD_RE = re.compile(r"^(?P<oid>.+)_(?P<axis>[xyz])$")


def discover_objects(
    df: DataFrame,
    team_of: Optional[Callable[[str], Optional[str]]] = None,
    home_team_id: str = "home",
    away_team_id: str = "away",
    position_of: Optional[Callable[[str], Optional[str]]] = None,
) -> list[TrackedObject]:
    """Infer the tracked-object list from `<object_id>_x` column names.

    ``team_of`` maps an object id to its team id (return None to drop the
    object); when omitted, ids are assigned by prefix convention
    (``home_*`` / ``away_*``) and ``ball`` is always the ball. Schema-only —
    no data is read."""
    ids = []
    seen = set()
    for col in df.columns:
        m = _COORD_RE.match(col)
        if not m or m.group("axis") != "x":
            continue
        oid = m.group("oid")
        if oid in seen or oid in _INDEX_COLS:
            continue
        if f"{oid}_y" not in df.columns:
            continue
        seen.add(oid)
        ids.append(oid)

    objects = []
    for oid in ids:
        if oid == BALL:
            objects.append(TrackedObject(oid, BALL, None))
            continue
        if team_of is not None:
            team = team_of(oid)
        elif oid.startswith(f"{home_team_id}_"):
            team = home_team_id
        elif oid.startswith(f"{away_team_id}_"):
            team = away_team_id
        else:
            team = None
        if team is None:
            continue
        pos = position_of(oid) if position_of else None
        objects.append(TrackedObject(oid, team, pos))
    if not objects:
        raise ValueError(
            "no trackable objects discovered (expected <object_id>_x/_y columns)"
        )
    return objects


def load_kloppy_wide(
    wide_df: DataFrame,
    settings: DefaultSettings,
    game_id: str = "game",
    team_of: Optional[Callable[[str], Optional[str]]] = None,
    position_of: Optional[Callable[[str], Optional[str]]] = None,
    objects: Optional[Iterable[TrackedObject]] = None,
    **load_kw,
) -> TrackingDataset:
    """Provider-agnostic ingest: discover objects from the schema (unless
    given), then run the standard wide→long melt + kinematics pipeline."""
    if objects is None:
        objects = discover_objects(
            wide_df,
            team_of=team_of,
            home_team_id=settings.home_team_id,
            away_team_id=settings.away_team_id,
            position_of=position_of,
        )
    return TrackingDataset.load_wide(
        wide_df, objects, settings, game_id=game_id, **load_kw
    )
