"""Possession / ball-carrier / goalkeeper inference.

Re-expresses /root/reference/unravel/soccer/dataset/kloppy_polars.py:546-723
Spark-first:

- J1: players ⟕ per-frame ball position (both sides co-partition on the frame
  key — a single shuffle, no broadcast needed since both scale with frames);
- A4: conditional argmin-within-group via `min_by` over a (dist, id) struct —
  deterministic tie-break, no second shuffle beyond the frame aggregation;
- W2: goalkeeper inference via partitioned min over (frame, team).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..schema import BALL, Column, Group


def infer_ball_ownership(df: DataFrame, ball_carrier_threshold: float = 25.0) -> DataFrame:
    """Fill null ball_owning_team_id / derive is_ball_carrier from the closest
    player to the ball within the threshold; frames still lacking an owner are
    dropped (reference :546-667)."""
    ball = df.filter(F.col(Column.TEAM_ID) == BALL).select(
        *Group.BY_FRAME,
        F.col(Column.X).alias("ball_x"),
        F.col(Column.Y).alias("ball_y"),
        F.col(Column.Z).alias("ball_z"),
    )
    players = df.filter(F.col(Column.TEAM_ID) != BALL)
    dist = F.sqrt(
        (F.col(Column.X) - F.col("ball_x")) ** 2
        + (F.col(Column.Y) - F.col("ball_y")) ** 2
        + (F.col(Column.Z) - F.col("ball_z")) ** 2
    )
    players_ball = players.join(ball, on=Group.BY_FRAME, how="left").withColumn(
        "ball_dist", dist
    )

    bop_col = (
        F.col(Column.BALL_OWNING_PLAYER_ID)
        if Column.BALL_OWNING_PLAYER_ID in df.columns
        else F.lit(None).cast("string")
    )
    per_frame = players_ball.withColumn("_bop", bop_col).groupBy(*Group.BY_FRAME).agg(
        F.first(Column.BALL_OWNING_TEAM_ID, ignorenulls=True).alias("_bot0"),
        F.first("_bop", ignorenulls=True).alias("_bop0"),
        F.min("ball_dist").alias("_min_dist"),
        F.min_by(Column.TEAM_ID, F.struct("ball_dist", Column.OBJECT_ID)).alias("_closest_team"),
        F.min_by(Column.OBJECT_ID, F.struct("ball_dist", Column.OBJECT_ID)).alias("_closest_player"),
    )
    within = F.col("_min_dist") < ball_carrier_threshold
    inferred = per_frame.select(
        *Group.BY_FRAME,
        F.coalesce(F.col("_bot0"), F.when(within, F.col("_closest_team"))).alias(
            Column.BALL_OWNING_TEAM_ID
        ),
        F.coalesce(F.col("_bop0"), F.when(within, F.col("_closest_player"))).alias(
            Column.BALL_OWNING_PLAYER_ID
        ),
    )
    # the inferred owner must be on the owning team: carrier flag only set for
    # the owning player's row (reference :613-667)
    drop = [Column.BALL_OWNING_TEAM_ID]
    if Column.BALL_OWNING_PLAYER_ID in df.columns:
        drop.append(Column.BALL_OWNING_PLAYER_ID)
    return (
        df.drop(*drop)
        .join(inferred, on=Group.BY_FRAME, how="left")
        .withColumn(
            Column.IS_BALL_CARRIER,
            F.col(Column.OBJECT_ID) == F.col(Column.BALL_OWNING_PLAYER_ID),
        )
        .fillna({Column.IS_BALL_CARRIER: False})
        .drop(Column.BALL_OWNING_PLAYER_ID)
        .na.drop(subset=[Column.BALL_OWNING_TEAM_ID])
    )


def infer_goalkeepers(df: DataFrame, pitch_length: float = 105.0) -> DataFrame:
    """W2: per (frame, team), the player closest to their own goal becomes GK;
    all other position_name values are cleared (reference :669-723). Assumes
    BALL_OWNING orientation (owning team attacks left-to-right)."""
    goal_x = pitch_length / 2.0
    players = df.filter(F.col(Column.TEAM_ID) != BALL)
    dist_left = F.sqrt((F.col(Column.X) + goal_x) ** 2 + F.col(Column.Y) ** 2)
    dist_right = F.sqrt((F.col(Column.X) - goal_x) ** 2 + F.col(Column.Y) ** 2)
    w = Window.partitionBy(*Group.BY_FRAME_TEAM)
    players = (
        players.withColumn("_dl", dist_left)
        .withColumn("_dr", dist_right)
        .withColumn("_mdl", F.min("_dl").over(w))
        .withColumn("_mdr", F.min("_dr").over(w))
        .withColumn(
            Column.POSITION_NAME,
            F.when(
                F.col(Column.TEAM_ID) == F.col(Column.BALL_OWNING_TEAM_ID),
                F.when(F.col("_dl") == F.col("_mdl"), "GK"),
            ).otherwise(F.when(F.col("_dr") == F.col("_mdr"), "GK")),
        )
        .drop("_dl", "_dr", "_mdl", "_mdr")
    )
    return df.filter(F.col(Column.TEAM_ID) == BALL).unionByName(players)
