"""End-to-end tracking-analytics pipeline on the seeded synthetic match:
ingest → kinematics → Pressing Intensity → GNN graphs → EFPI formations —
the reference library's three model families driven through this engine's
public API.

Run: python examples/tracking_pipeline.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(spark) -> dict:
    import pyspark.sql.functions as F

    from unravelsports_spark.datasets.synthetic import AWAY, HOME, synthetic_tracking_df
    from unravelsports_spark.models.efpi import EFPI
    from unravelsports_spark.models.graph_converter import SoccerGraphConverter
    from unravelsports_spark.models.pressing_intensity import PressingIntensity
    from unravelsports_spark.settings import DefaultSettings, GraphSettings

    tracking = synthetic_tracking_df(spark, n_frames=120, n_games=2, seed=7).cache()
    settings = DefaultSettings(home_team_id=HOME, away_team_id=AWAY)

    pi = (
        PressingIntensity(tracking, settings)
        .fit(method="teams", ball_method="max", orient="home_away", speed_threshold=2)
        .output
    )
    n_pi_frames = pi.count()

    graphs = SoccerGraphConverter(
        tracking, GraphSettings(home_team_id=HOME, away_team_id=AWAY)
    ).to_graph_frames()
    n_graphs = graphs.count()

    formations = EFPI(tracking, settings).fit(every="frame").output
    top_formation = (
        formations.groupBy("formation")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "formation")
        .first()
    )

    # media export: the same 3 frames to a standard MP4 (no ffmpeg —
    # sources/mp4.py muxes the numpy renderer's JPEG frames)
    import os
    import shutil
    import tempfile

    from unravelsports_spark.sources.media import to_mp4
    from unravelsports_spark.sources.mp4 import read_mjpeg_mp4

    out_dir = tempfile.mkdtemp(prefix="tracking_clip_")
    try:
        clip = to_mp4(
            tracking, "game_0", [0, 1, 2],
            os.path.join(out_dir, "clip.mp4"), home_team_id=HOME, fps=5,
        )
        n_video_frames = len(read_mjpeg_mp4(clip))
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)

    tracking.unpersist()
    return {
        "pi_frames": n_pi_frames,
        "graphs": n_graphs,
        "top_formation": (top_formation["formation"], top_formation["n"]),
        "video_frames": n_video_frames,
    }


if __name__ == "__main__":
    from unravelsports_spark.session import get_spark

    spark = get_spark("example-tracking-pipeline")
    spark.sparkContext.setLogLevel("ERROR")
    for k, v in main(spark).items():
        print(f"{k}: {v}")
    spark.stop()
