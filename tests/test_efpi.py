"""EFPI on Spark: template matching correctness (planted formations), frame /
possession / period / duration segmentation, substitution drop, hysteresis.
Mirrors the reference's behavioral assertions (tests/test_soccer.py:1336-1604)
on synthetic data."""

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from unravelsports_spark.datasets.synthetic import AWAY, HOME, synthetic_tracking_df
from unravelsports_spark.models.efpi import EFPI, _assign_formation
from unravelsports_spark.models.formations import Formations, formation_template
from unravelsports_spark.schema import TRACKING_SCHEMA
from unravelsports_spark.settings import DefaultSettings


@pytest.fixture(scope="module")
def settings():
    return DefaultSettings(home_team_id=HOME, away_team_id=AWAY)


def planted_tracking(spark, formation_home="442", formation_away="433", n_frames=6):
    """Players standing exactly on formation template coordinates."""
    home_xy, _ = formation_template(formation_home, 105.0, 68.0)
    away_xy, _ = formation_template(formation_away, 105.0, 68.0)
    rows = []
    for f in range(n_frames):
        owning = HOME if f < n_frames // 2 else AWAY
        for t, (team, xy) in enumerate(((HOME, home_xy), (AWAY, away_xy))):
            sign = 1.0 if team == HOME else -1.0  # home attacks LTR
            for i, (x, y) in enumerate(xy):
                rows.append(
                    (
                        "g1", 1, f, f * 40, f"{team}_p{i:02d}", team, "CB",
                        sign * x, sign * y, 0.0, 0.0, 0.0, 0.0, 0.0,
                        0.0, 0.0, 0.0, 0.0, "alive", owning, False, 0, f"g1-{f}",
                    )
                )
            rows.append(
                ("g1", 1, f, f * 40, f"{team}_gk", team, "GK",
                 sign * -50.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0,
                 0.0, 0.0, 0.0, 0.0, "alive", owning, False, 0, f"g1-{f}")
            )
        rows.append(
            ("g1", 1, f, f * 40, "ball", "ball", None, 0.0, 0.0, 0.1,
             0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, "alive", owning, False, 0, f"g1-{f}")
        )
    pdf = pd.DataFrame(rows, columns=[fld.name for fld in TRACKING_SCHEMA.fields])
    return spark.createDataFrame(pdf, schema=TRACKING_SCHEMA)


def test_assign_formation_recovers_planted():
    forms = Formations(105.0, 68.0, None)
    for name in ("442", "433", "3232", "4141"):
        coords, labels = formation_template(name, 105.0, 68.0)
        res = _assign_formation(coords, forms, "ltr")
        got_labels, got_name, cost = res
        assert got_name == name
        assert cost < 1e-9
        assert list(got_labels) == list(labels)


def test_frame_mode_detects_planted(spark, settings):
    df = planted_tracking(spark)
    model = EFPI(df, settings).fit(every="frame")
    out = model.output.toPandas()
    assert set(out.columns) >= {
        "game_id", "period_id", "frame_id", "id", "team_id",
        "position", "formation", "is_attacking",
    }
    f0 = out[out.frame_id == 0]
    assert len(f0) == 23
    home_rows = f0[f0.team_id == HOME]
    away_rows = f0[f0.team_id == AWAY]
    assert set(home_rows.formation) == {"442"}
    assert set(away_rows.formation) == {"433"}
    # GKs always labeled GK (reference tests/test_soccer.py:1336-1414)
    assert set(f0[f0.id.str.endswith("_gk")].position) == {"GK"}
    ball = f0[f0.team_id == "ball"]
    assert ball.position.iloc[0] == "ball" and pd.isna(ball.is_attacking.iloc[0])
    # attacking flags
    assert home_rows.is_attacking.all()
    assert (~away_rows.is_attacking).all()


def test_possession_mode_segments(spark, settings):
    df = planted_tracking(spark, n_frames=8)
    model = EFPI(df, settings).fit(every="possession")
    segs = model.segments.toPandas()
    assert len(segs) == 2  # one possession flip at frame 4
    assert segs.n_frames.sum() > 0
    out = model.output.toPandas()
    assert "possession_id" in out.columns
    assert set(out[out.team_id == HOME].formation) == {"442"}


def test_period_and_duration_modes(spark, settings):
    df = planted_tracking(spark, n_frames=8)
    per = EFPI(df, settings).fit(every="period")
    assert per.output.count() > 0
    dur = EFPI(df, settings).fit(every="1s")
    out = dur.output.toPandas()
    assert "1s_id" in out.columns
    # 8 frames at 40ms → single 1s bucket per possession side
    assert set(out["1s_id"]) == {0}


def test_substitution_drop(spark, settings):
    base = synthetic_tracking_df(spark, n_frames=20, seed=5)
    # fake a 12th home outfielder appearing mid-window → must be dropped
    sub = base.filter("id = 'h_p05' and frame_id >= 18").withColumn(
        "id", F.lit("h_p99")
    )
    df = base.unionByName(sub)
    model = EFPI(df, DefaultSettings(home_team_id=HOME, away_team_id=AWAY)).fit(every="period")
    out = model.output.toPandas()
    assert "h_p99" not in set(out.id)


def test_hysteresis_threshold(spark, settings):
    df = planted_tracking(spark, n_frames=6)
    model = EFPI(df, settings).fit(
        every="frame", change_threshold=1e9, change_after_possession=False
    )
    out = model.output.toPandas()
    # impossible threshold → formation never updates after first detection
    assert set(out[out.team_id == HOME].formation) == {"442"}


def test_stateless_frame_mode_shards_within_game(spark, settings):
    """With hysteresis off (change_threshold=None) the frame kernel is
    stateless, so each game shards into frame-range chunks: >1 kernel group
    per game, byte-identical output to the unsharded run."""
    df = planted_tracking(spark, n_frames=12)

    sharded = EFPI(df, settings, stateless_chunk_frames=4)
    unsharded = EFPI(df, settings, stateless_chunk_frames=10**9)
    out_sharded = sharded.fit(every="frame").output
    out_unsharded = unsharded.fit(every="frame").output

    cols = sorted(out_sharded.columns)
    order = ["frame_id", "id"]
    assert (
        out_sharded.select(*cols).orderBy(*order).collect()
        == out_unsharded.select(*cols).orderBy(*order).collect()
    )

    # the pre-kernel exchange partitions on (game_id, _chunk), not game alone
    plan = out_sharded._jdf.queryExecution().executedPlan().toString()
    assert "_chunk" in plan
    # 12 frames / chunk 4 → 3 kernel groups for the single game
    chunked = df.withColumn("_chunk", F.floor(F.col("frame_id") / F.lit(4)))
    assert chunked.select("game_id", "_chunk").distinct().count() == 3

    # hysteresis ON must keep the serial per-game grouping (state carries)
    stateful = EFPI(df, settings).fit(every="frame", change_threshold=0.05).output
    assert "_chunk" not in stateful._jdf.queryExecution().executedPlan().toString()

    # stateless_chunk_frames=None disables sharding entirely (the public
    # opt-out for exact unsharded borrow-window semantics, ADVICE r3)
    disabled = EFPI(df, settings, stateless_chunk_frames=None)
    out_disabled = disabled.fit(every="frame").output
    assert "_chunk" not in out_disabled._jdf.queryExecution().executedPlan().toString()
    assert (
        out_disabled.select(*cols).orderBy(*order).collect()
        == out_unsharded.select(*cols).orderBy(*order).collect()
    )


def test_stateless_segment_mode_shards_within_game(spark, settings):
    """Possession/period/duration modes with hysteresis off hash-bucket the
    segments within each game; output identical to the single-bucket run."""
    df = planted_tracking(spark, n_frames=12)

    sharded = EFPI(df, settings, stateless_segment_buckets=4)
    single = EFPI(df, settings, stateless_segment_buckets=1)
    out_sharded = sharded.fit(every="possession").output
    out_single = single.fit(every="possession").output

    cols = sorted(out_sharded.columns)
    order = ["period_id", "possession_id", "id"]
    assert (
        out_sharded.select(*cols).orderBy(*order).collect()
        == out_single.select(*cols).orderBy(*order).collect()
    )
    plan = out_sharded._jdf.queryExecution().executedPlan().toString()
    assert "_segchunk" in plan


def test_validation_errors(spark, settings):
    df = planted_tracking(spark)
    with pytest.raises(ValueError):
        EFPI(df, settings).fit(every="5x")
    with pytest.raises(ValueError):
        EFPI(df, settings).fit(substitutions="bogus")
    with pytest.raises(NotImplementedError):
        EFPI(df, settings).fit(substitutions="merge")
    with pytest.raises(ValueError):
        EFPI(df, settings).fit(start_time=1, end_time=None, period_id=None)


def test_chunk_boundary_detection_failure_carries(spark, settings):
    """A detection-failure run spanning chunk boundaries (away team down to
    5 outfielders for frames 4-9, chunk size 4 → chunks 1 and 2 start
    failed) must borrow the last successful detection across the boundary —
    byte-identical to the truly unsharded run (VERDICT r4 item 6)."""
    df = planted_tracking(spark, n_frames=12)
    failing = [f"{AWAY}_p{i:02d}" for i in range(5, 10)]
    df = df.filter(
        ~(
            F.col("id").isin(failing)
            & F.col("frame_id").between(4, 9)
        )
    )

    sharded = EFPI(df, settings, stateless_chunk_frames=4).fit(every="frame").output
    unsharded = (
        EFPI(df, settings, stateless_chunk_frames=None).fit(every="frame").output
    )

    cols = sorted(sharded.columns)
    order = ["frame_id", "id"]
    s_rows = sharded.select(*cols).orderBy(*order).collect()
    u_rows = unsharded.select(*cols).orderBy(*order).collect()
    assert s_rows == u_rows
    # sanity: the failure window really did borrow (away formation present
    # and equal to the pre-failure detection on every failing frame)
    import pandas as pd  # noqa: F401

    out = sharded.toPandas()
    away = out[(out.team_id == AWAY) & out.frame_id.between(4, 9)]
    assert set(away.formation) == {"433"}
    assert away.position.notna().all()


def test_assign_formation_matches_bruteforce():
    """r14 pruning-bound guard: the bound-pruned solve selects the same
    (labels, formation, cost) as exhaustively solving every template, on
    random player sets of 8/9/10 outfielders — zero winner changes under
    the upgraded Hungarian-reduction bounds."""
    import numpy as np

    from unravelsports_spark.functions.assignment import linear_sum_assignment

    forms = Formations(105.0, 68.0, None)
    rng = np.random.default_rng(42)
    for trial in range(30):
        n = (8, 9, 10)[trial % 3]
        direction = ("ltr", "rtl")[trial % 2]
        coords = np.stack(
            (rng.uniform(-50, 50, n), rng.uniform(-33, 33, n)), axis=-1
        )
        got = _assign_formation(coords, forms, direction)
        # exhaustive reference: identical scaling/cost math, no pruning
        names, tmpl0, gmin, gmax = forms.stacked(direction, n)
        lo, hi = coords.min(axis=0), coords.max(axis=0)
        scale = np.where(gmax - gmin != 0, (hi - lo) / (gmax - gmin), 1.0)
        tmpl = (tmpl0 - gmin) * scale + lo
        cost = np.linalg.norm(coords[:, None, None, :] - tmpl[None, :, :, :], axis=-1)
        best_total, best, best_assign = np.inf, None, None
        for i in range(len(names)):
            r, c = linear_sum_assignment(cost[:, i, :])
            tot = cost[:, i, :][r, c].sum()
            if tot < best_total:
                best_total, best, best_assign = tot, i, c
        want_labels = forms.labels()[n][names[best]][best_assign]
        assert got[1] == names[best]
        assert got[2] == float(best_total)
        assert list(got[0]) == list(want_labels)
