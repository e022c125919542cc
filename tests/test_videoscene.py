"""Scene-cut detection (operators/videoscene.py) — built round 10, driver
registration round 11. The analytic expectation verified here (cut count
and positions derivable from the synthesis arithmetic) is the r11 oracle's
formula: n_cuts = (n_frames - 1) // scene_len for alternating solid
scenes."""

import numpy as np
import pytest
from pyspark.sql import types as T


def _clip(n: int, s: int, w: int = 16, h: int = 12) -> bytes:
    """MJPEG-AVI with n solid frames; scene changes every s frames,
    alternating luma 40 / 200 (a hard cut a 0.2 threshold cannot miss,
    and JPEG DC quantization cannot blur)."""
    import os
    import tempfile

    from unravelsports_spark.functions.jpegcodec import encode_jpeg
    from unravelsports_spark.sources.avi import write_mjpeg_avi

    frames = [
        encode_jpeg(
            np.full((h, w, 3), 40 if (i // s) % 2 == 0 else 200, np.uint8), 95
        )
        for i in range(n)
    ]
    fd, path = tempfile.mkstemp(suffix=".avi")
    os.close(fd)
    write_mjpeg_avi(path, frames, w, h, fps=10)
    with open(path, "rb") as fh:
        data = fh.read()
    os.unlink(path)
    return data


def test_scene_cuts_match_analytic_formula(spark):
    """Cut count and positions recover the synthesis arithmetic exactly:
    cuts at every multiple of the scene length → n_cuts = (n-1)//s."""
    from unravelsports_spark.operators.videoscene import scene_cuts

    rows = []
    for g in range(12):
        n, s = 4 + g % 5, 1 + g % 3
        rows.append((g, n, s, bytearray(_clip(n, s))))
    df = spark.createDataFrame(
        rows, "grp long, n long, s long, payload binary"
    )
    got = {r["grp"]: r for r in scene_cuts(df.select("grp", "payload")).collect()}
    for g in range(12):
        n, s = 4 + g % 5, 1 + g % 3
        r = got[g]
        assert r["n_frames"] == n
        assert r["n_cuts"] == (n - 1) // s, (g, n, s, r["n_cuts"])
        assert r["cut_indices"] == [i for i in range(1, n) if i % s == 0]


def test_scene_cuts_static_and_tiny_clips(spark):
    """A static clip (one scene) has zero cuts; a 1-frame clip has zero
    cuts by definition; a geometry change counts as a cut."""
    import os
    import tempfile

    from unravelsports_spark.functions.jpegcodec import encode_jpeg
    from unravelsports_spark.operators.videoscene import scene_cuts
    from unravelsports_spark.sources.avi import write_mjpeg_avi

    def mux(frames, w, h):
        fd, path = tempfile.mkstemp(suffix=".avi")
        os.close(fd)
        write_mjpeg_avi(path, frames, w, h, fps=10)
        with open(path, "rb") as fh:
            data = fh.read()
        os.unlink(path)
        return data

    static = mux([encode_jpeg(np.full((12, 16, 3), 90, np.uint8), 95)] * 5, 16, 12)
    single = mux([encode_jpeg(np.full((12, 16, 3), 90, np.uint8), 95)], 16, 12)
    resized = mux(
        [
            encode_jpeg(np.full((12, 16, 3), 90, np.uint8), 95),
            encode_jpeg(np.full((24, 32, 3), 90, np.uint8), 95),
        ],
        32, 24,
    )
    df = spark.createDataFrame(
        [(0, bytearray(static)), (1, bytearray(single)), (2, bytearray(resized))],
        "grp long, payload binary",
    )
    got = {r["grp"]: r for r in scene_cuts(df).collect()}
    assert got[0]["n_cuts"] == 0 and got[0]["n_frames"] == 5
    assert got[1]["n_cuts"] == 0 and got[1]["n_frames"] == 1
    assert got[2]["n_cuts"] == 1 and got[2]["cut_indices"] == [1]


def test_scene_cuts_rejects_non_avi(spark):
    from unravelsports_spark.operators.videoscene import scene_cuts

    df = spark.createDataFrame([(0, bytearray(b"\x89PNG not an avi"))],
                               "grp long, payload binary")
    with pytest.raises(Exception) as ei:
        scene_cuts(df).collect()
    assert "NotImplementedError" in str(ei.value) or "unsupported" in str(ei.value)
