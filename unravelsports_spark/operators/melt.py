"""Wide→long unpivot of provider-style tracking frames (O8).

Re-expresses /root/reference/unravel/soccer/dataset/kloppy_polars.py:293-311,
493-544: a kloppy wide frame has one column per object per coordinate
(`<object_id>_x`, `<object_id>_y`, ball also `ball_z`). Spark's `stack`
emits every (object, x, y, z) triple in one generator pass — no per-object
loop, no horizontal concat, one projection. Object→(team, position) metadata
arrives via a broadcast join against the roster."""

from __future__ import annotations

from typing import Iterable, NamedTuple, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schema import BALL, Column


class TrackedObject(NamedTuple):
    object_id: str
    team_id: str
    position_name: Optional[str] = None


def melt_wide_tracking(
    df: DataFrame,
    objects: Iterable[TrackedObject],
    game_id: str,
    index_columns: Iterable[str] = (
        Column.PERIOD_ID,
        Column.TIMESTAMP,
        Column.FRAME_ID,
        Column.BALL_STATE,
        Column.BALL_OWNING_TEAM_ID,
    ),
) -> DataFrame:
    objects = list(objects)
    columns = set(df.columns)
    triples = []
    for obj in objects:
        xc, yc, zc = (f"{obj.object_id}_{c}" for c in ("x", "y", "z"))
        if xc not in columns:
            continue
        z_expr = f"cast(`{zc}` as double)" if zc in columns else "cast(0.0 as double)"
        triples.append(
            f"'{obj.object_id}', cast(`{xc}` as double), cast(`{yc}` as double), {z_expr}"
        )
    if not triples:
        raise ValueError("no <object_id>_x columns found to unpivot")

    stack_expr = f"stack({len(triples)}, {', '.join(triples)}) as (`{Column.OBJECT_ID}`, x, y, z)"
    idx = [c for c in index_columns if c in columns]
    long = df.selectExpr(*[f"`{c}`" for c in idx], stack_expr)

    roster = long.sparkSession.createDataFrame(
        [(o.object_id, o.team_id, o.position_name) for o in objects],
        schema=f"{Column.OBJECT_ID} string, {Column.TEAM_ID} string, {Column.POSITION_NAME} string",
    )
    long = (
        long.join(F.broadcast(roster), on=Column.OBJECT_ID, how="left")
        .withColumn(Column.GAME_ID, F.lit(game_id))
        # ball z defaults to 0.0 when entirely absent (reference :516-521)
        .withColumn(Column.Z, F.when(F.col(Column.Z).isNull() & (F.col(Column.TEAM_ID) == BALL), 0.0).otherwise(F.col(Column.Z)))
    )
    return long
