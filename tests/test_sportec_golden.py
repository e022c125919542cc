"""End-to-end golden parity on the reference's own sportec sample: XML ingest
→ kinematics → Pressing Intensity must reproduce the reference's published
TTI scalar (tests/test_soccer.py:514-566, BASELINE.md known-good kernel
scalar) — the strongest cross-implementation check available without kloppy."""

import numpy as np
import pytest

from unravelsports_spark.datasets.sportec import load_sportec, parse_meta
from unravelsports_spark.models.pressing_intensity import PressingIntensity

FILES = "/root/reference/tests/files"
GOLDEN_TTI_00 = 2.6428493704618106


@pytest.fixture(scope="module")
def sportec(spark):
    df, settings = load_sportec(
        spark,
        meta_path=f"{FILES}/sportec_meta.xml",
        tracking_path=f"{FILES}/sportec_tracking.xml",
    )
    return df.cache(), settings


def test_meta(sportec):
    _, settings = sportec
    assert settings.home_team_id == "DFL-CLU-00000P"
    assert settings.away_team_id == "DFL-CLU-000005"


def test_canonical_table_shape(sportec):
    df, _ = sportec
    # 21 frames × 23 objects (reference tests/test_soccer.py:514-515)
    assert df.count() == 21 * 23
    first = df.orderBy("frame_id").head()
    assert first.ball_owning_team_id == "DFL-CLU-00000P"  # home owns at start


def test_pi_golden_scalar(sportec, spark):
    df, settings = sportec
    model = PressingIntensity(df, settings).fit(
        method="teams", ball_method="max", orient="home_away", speed_threshold=2
    )
    rows = model.output.orderBy("frame_id").collect()
    assert len(rows) == 21
    r = rows[0]
    tti = np.array(r.time_to_intercept)
    pti = np.array(r.probability_to_intercept)
    assert tti.shape == pti.shape == (11, 11)
    # home_away + home owns → rows are home players, columns away players
    assert all(s in ("DFL-CLU-00000P",) or s.startswith("DFL-OBJ") for s in r.rows)
    assert tti[0][0] == pytest.approx(GOLDEN_TTI_00, abs=1e-5)
