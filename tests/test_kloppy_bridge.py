"""Kloppy-object ingest bridge: duck-typed against kloppy's public metadata
surface, so a lightweight fake proves the full path without kloppy
installed; the real-kloppy parity test runs when kloppy is available."""

from dataclasses import dataclass, field
from typing import Optional

import pandas as pd
import pytest

from unravelsports_spark.datasets.kloppy_bridge import (
    load_kloppy,
    objects_from_metadata,
    settings_from_metadata,
)
from unravelsports_spark.datasets.tracking import TrackingDataset
from unravelsports_spark.operators.melt import TrackedObject
from unravelsports_spark.settings import DefaultSettings


@dataclass
class FakePosition:
    code: str


@dataclass
class FakePlayer:
    player_id: str
    starting_position: Optional[FakePosition] = None


@dataclass
class FakeTeam:
    team_id: str
    players: list = field(default_factory=list)


@dataclass
class FakeDim:
    min: float
    max: float


@dataclass
class FakePitch:
    x_dim: FakeDim
    y_dim: FakeDim
    standardized: bool = False


@dataclass
class FakeMetadata:
    teams: tuple
    game_id: Optional[str] = "match-7"
    frame_rate: float = 25.0
    provider: str = "fakeprovider"
    orientation: str = "STATIC_HOME_AWAY"
    pitch_dimensions: Optional[FakePitch] = None


class FakeKloppyDataset:
    def __init__(self, metadata, pdf):
        self.metadata = metadata
        self._pdf = pdf

    def to_df(self, engine="pandas"):
        assert engine == "pandas"
        return self._pdf.copy()


def _wide_pdf(n=20, dt_ms=40, ts_kind="timedelta"):
    rows = []
    for f in range(n):
        t = f * dt_ms
        rows.append(
            {
                "period_id": 1, "timestamp": t, "frame_id": f,
                "ball_state": "alive", "ball_owning_team_id": None,
                "p1_x": 1.0 + 2.0 * t / 1000, "p1_y": -3.0 + 1.0 * t / 1000,
                "p2_x": 10.0 - 1.0 * t / 1000, "p2_y": 5.0,
                "ball_x": 0.5 * t / 1000, "ball_y": 0.0, "ball_z": 1.0,
            }
        )
    pdf = pd.DataFrame(rows)
    if ts_kind == "timedelta":
        pdf["timestamp"] = pd.to_timedelta(pdf["timestamp"], unit="ms")
    elif ts_kind == "float_seconds":
        pdf["timestamp"] = pdf["timestamp"] / 1000.0
    return pdf


def _fake_dataset(ts_kind="timedelta", with_positions=True):
    home = FakeTeam(
        "home", [FakePlayer("p1", FakePosition("GK") if with_positions else None)]
    )
    away = FakeTeam("away", [FakePlayer("p2")])
    meta = FakeMetadata(
        teams=(home, away),
        pitch_dimensions=FakePitch(FakeDim(-52.5, 52.5), FakeDim(-34.0, 34.0)),
    )
    return FakeKloppyDataset(meta, _wide_pdf(ts_kind=ts_kind))


def test_metadata_extraction():
    ds = _fake_dataset()
    objects, positions_missing = objects_from_metadata(ds.metadata)
    assert not positions_missing
    assert TrackedObject("p1", "home", "GK") in objects
    assert TrackedObject("p2", "away", None) in objects
    assert any(o.object_id == "ball" for o in objects)
    settings = settings_from_metadata(ds.metadata)
    assert (settings.home_team_id, settings.away_team_id) == ("home", "away")
    assert settings.frame_rate == 25
    assert settings.pitch_dimensions.pitch_length == 105.0
    assert settings.provider == "fakeprovider"


def test_positions_missing_enables_gk_inference():
    ds = _fake_dataset(with_positions=False)
    _, positions_missing = objects_from_metadata(ds.metadata)
    assert positions_missing


@pytest.mark.parametrize("ts_kind", ["timedelta", "float_seconds"])
def test_bridge_matches_direct_wide_load(spark, ts_kind):
    """The kloppy path must produce the identical canonical table as loading
    the same wide frame directly (same melt + kinematics pipeline)."""
    ds = _fake_dataset(ts_kind=ts_kind)
    via_bridge = load_kloppy(ds, spark)
    assert via_bridge.settings.home_team_id == "home"

    objects = [
        TrackedObject("p1", "home", "GK"),
        TrackedObject("p2", "away", None),
        TrackedObject("ball", "ball", None),
    ]
    wide = spark.createDataFrame(_wide_pdf(ts_kind="int_ms"))
    direct = TrackingDataset.load_wide(
        wide, objects,
        DefaultSettings(home_team_id="home", away_team_id="away"),
        game_id="match-7",
    )
    cols = sorted(via_bridge.data.columns)
    assert cols == sorted(direct.data.columns)
    order = ["period_id", "frame_id", "id"]
    a = via_bridge.data.select(*cols).orderBy(*order).collect()
    b = direct.data.select(*cols).orderBy(*order).collect()
    assert a == b
    assert len(a) == 60  # 20 frames × 3 objects


def _canonical_fingerprint(df):
    """Order-insensitive fingerprint of the canonical tracking table:
    (rows, frames, sum of md5-derived row hashes over rounded coordinates).
    The native-parser values on the local Sportec sample are cached in
    FIXTURES.md §6 so a real-kloppy run elsewhere can compare against this
    exact artifact."""
    from pyspark.sql import functions as F

    n = df.count()
    frames = df.select("frame_id").distinct().count()
    s = (
        df.select(
            F.md5(
                F.concat_ws(
                    "|",
                    F.col("game_id"), F.col("period_id"), F.col("frame_id"),
                    F.col("id"), F.col("team_id"),
                    F.round("x", 4).cast("string"),
                    F.round("y", 4).cast("string"),
                    F.round("v", 4).cast("string"),
                )
            ).alias("h")
        )
        .agg(
            F.sum(
                F.conv(F.substring("h", 1, 15), 16, 10).cast("decimal(38,0)")
            ).alias("s")
        )
        .first()[0]
    )
    return n, frames, int(s)


def test_native_sportec_fingerprint_artifact(spark):
    """Pins the FIXTURES.md §6 parity artifact: the native parser's
    canonical table on the local Sportec sample. The real-kloppy test below
    compares the kloppy-bridged table against the SAME fingerprint, so this
    test is the always-on half of the parity pair (the kloppy half runs
    where kloppy is installable)."""
    import os

    from unravelsports_spark.datasets.sportec import load_sportec

    files = os.environ.get("SPARK_GRAFT_SPORTEC_DIR", "/root/reference/tests/files")
    if not os.path.exists(f"{files}/sportec_tracking.xml"):
        pytest.skip("sportec sample files not present")
    df, _ = load_sportec(
        spark,
        meta_path=f"{files}/sportec_meta.xml",
        tracking_path=f"{files}/sportec_tracking.xml",
    )
    assert _canonical_fingerprint(df) == (483, 21, 283453893883981673572)


def test_real_kloppy_sportec_parity(spark):
    """With kloppy installed (one command where network permits:
    ``pip install kloppy && python -m pytest tests/test_kloppy_bridge.py -k
    real_kloppy``), load the LOCAL Sportec sample through kloppy's parser,
    bridge it via load_kloppy, and require exact canonical-table parity
    with the native parser — same rows, and the same cached fingerprint the
    native test above pins, so the two ingest paths cannot drift apart."""
    kloppy = pytest.importorskip("kloppy")
    import os

    from unravelsports_spark.datasets.sportec import load_sportec

    files = os.environ.get("SPARK_GRAFT_SPORTEC_DIR", "/root/reference/tests/files")
    ds = kloppy.sportec.load_tracking(
        meta_data=f"{files}/sportec_meta.xml",
        raw_data=f"{files}/sportec_tracking.xml",
        only_alive=False,
        coordinates="secondspectrum",
    )
    bridged = load_kloppy(ds, spark)
    native, _ = load_sportec(
        spark,
        meta_path=f"{files}/sportec_meta.xml",
        tracking_path=f"{files}/sportec_tracking.xml",
    )
    assert _canonical_fingerprint(bridged.data) == _canonical_fingerprint(native)
