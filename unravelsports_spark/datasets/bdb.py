"""BigDataBowl (American-football) CSV loader.

Re-expresses /root/reference/unravel/american_football/dataset/dataset.py:
181-392 Spark-first: the kloppy-free CSV ingest (S2/S3) with lazy scans,
coordinate centering + 180° rotation for left-direction plays, degree→radian
wrap to (-π, π], ball id −9999.9, height/weight parsing to metric rounded to
the nearest 10 (privacy), plays/players enrichment joins (broadcast dims,
J5), and play-unique frame ids play_id·100000 + frameId.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..settings import AmericanFootballGraphSettings, AmericanFootballPitchDimensions, Dimension

FOOTBALL = "football"


@dataclass
class BigDataBowlDataset:
    tracking_file_path: str
    players_file_path: str
    plays_file_path: str
    sample_rate: Optional[float] = None
    max_player_speed: float = 12.0
    max_ball_speed: float = 28.0
    max_player_acceleration: float = 6.0
    max_ball_acceleration: float = 13.5

    data: Optional[DataFrame] = field(init=False, default=None)
    settings: Optional[AmericanFootballGraphSettings] = field(init=False, default=None)

    def load(self, spark: SparkSession):
        pitch = AmericanFootballPitchDimensions()
        length, width = pitch.pitch_length, pitch.pitch_width

        read = lambda p: (  # noqa: E731
            spark.read.option("header", "true")
            .option("inferSchema", "true")
            .option("nullValue", "NA")
            .option("mode", "PERMISSIVE")
            .csv(p)
        )
        df = read(self.tracking_file_path)
        for cand in ("club", "team"):
            if cand in df.columns:
                df = df.withColumnRenamed(cand, "team_id")

        left = F.col("playDirection") == "left"
        wrap = lambda deg: F.pmod(deg * math.pi / 180 + math.pi, 2 * math.pi) - math.pi  # noqa: E731
        df = (
            df.withColumn("o", F.when(left, F.col("o") + 180).otherwise(F.col("o")))
            .withColumn("dir", F.when(left, F.col("dir") + 180).otherwise(F.col("dir")))
            .withColumn("o", wrap(F.col("o")))
            .withColumn("dir", wrap(F.col("dir")))
            .withColumn("x", F.col("x") - length / 2)
            .withColumn("y", F.col("y") - width / 2)
            .withColumn("x", F.when(left, -F.col("x")).otherwise(F.col("x")))
            .withColumn("y", F.when(left, -F.col("y")).otherwise(F.col("y")))
            .withColumn(
                "nflId",
                F.when(F.col("team_id") == FOOTBALL, -9999.9).otherwise(F.col("nflId").cast("double")),
            )
            .withColumn("playDirection", F.lit("left"))
        )
        if self.sample_rate is not None:
            df = df.filter(F.col("frameId") % int(round(1.0 / self.sample_rate)) == 0)

        players = read(self.players_file_path)
        for cand in ("position", "officialPosition"):
            if cand in players.columns:
                players = players.withColumnRenamed(cand, "position_name")
        players = players.withColumn("nflId", F.col("nflId").cast("double"))
        players = self._convert_weight_height_to_metric(players)

        plays = (
            read(self.plays_file_path)
            .withColumnRenamed("gameId", "game_id")
            .withColumnRenamed("playId", "play_id")
            .withColumnRenamed("possessionTeam", "ball_owning_team_id")
            .select("game_id", "play_id", "ball_owning_team_id")
        )

        df = (
            df.join(
                F.broadcast(players.select("nflId", "position_name", "height_cm", "weight_kg")),
                on="nflId",
                how="left",
            )
            .withColumnRenamed("nflId", "id")
            .withColumnRenamed("gameId", "game_id")
            .withColumnRenamed("playId", "play_id")
            .withColumnRenamed("s", "v")
            .join(F.broadcast(plays), on=["game_id", "play_id"], how="left")
            .withColumn("frame_id", F.col("play_id") * 100_000 + F.col("frameId"))
            .drop("frameId")
        )
        self.data = df.orderBy("game_id", "play_id", "frame_id", "id")
        self.settings = AmericanFootballGraphSettings(
            pitch_dimensions=AmericanFootballPitchDimensions(
                pitch_length=length,
                pitch_width=width,
                x_dim=Dimension(-length / 2, length / 2),
                y_dim=Dimension(-width / 2, width / 2),
            ),
            max_player_speed=self.max_player_speed,
            max_ball_speed=self.max_ball_speed,
            max_player_acceleration=self.max_player_acceleration,
            max_ball_acceleration=self.max_ball_acceleration,
        )
        return self.data, self.settings

    @staticmethod
    def _convert_weight_height_to_metric(players: DataFrame) -> DataFrame:
        """'6-2' feet-inches → cm, lbs → kg, rounded to the nearest 10
        (reference dataset.py:358-392)."""
        feet = F.regexp_extract("height", r"(\d+)", 1).cast("double")
        inches = F.regexp_extract("height", r"\d+-(\d+)", 1).cast("double")
        return (
            players.withColumn("height_cm", F.round((feet * 30.48 + inches * 2.54) / 10, 0) * 10)
            .withColumn("weight_kg", F.round(F.col("weight") * 0.453592 / 10, 0) * 10)
            .drop("height", "weight")
        )

    def add_dummy_labels(self, by=None, random_seed: int = 42):
        by = by or ["game_id", "frame_id"]
        self.data = self.data.withColumn(
            "label", (F.abs(F.xxhash64(*by, F.lit(random_seed))) % 2).cast("long")
        )
        return self.data

    def add_graph_ids(self, by=None):
        by = by or ["game_id", "play_id"]
        self.data = self.data.withColumn("graph_id", F.concat_ws("-", *by))
        return self.data
