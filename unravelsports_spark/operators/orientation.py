"""Orientation normalization (P7 conditional sign flip).

Re-expresses /root/reference/unravel/soccer/dataset/kloppy_polars.py:725-782:
convert STATIC_HOME_AWAY coordinates to BALL_OWNING orientation by negating
x/y and their derivatives whenever the away team owns the ball, so the
attacking team always plays left-to-right. Pure Catalyst expression work.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schema import Column

FLIP_COLUMNS = [Column.X, Column.Y, Column.VX, Column.VY, Column.AX, Column.AY]


def convert_orientation_to_ball_owning(df: DataFrame, home_team_id: str) -> DataFrame:
    flip = F.col(Column.BALL_OWNING_TEAM_ID).cast("string") != str(home_team_id)
    for c in FLIP_COLUMNS:
        df = df.withColumn(c, F.when(flip, F.col(c) * -1).otherwise(F.col(c)))
    return df
