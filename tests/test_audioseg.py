"""Energy-based audio segmentation (operators/audioseg.py) — built round
10, driver registration round 11. The analytic expectation verified here
(segment count/positions from frame-aligned burst arithmetic) is the r11
oracle's formula."""

import numpy as np


def _burst_clip(k: int, burst_frames: int, gap_frames: int,
                frame_len: int = 400, rate: int = 4000) -> bytes:
    """k tone bursts of burst_frames frames separated (and led) by
    gap_frames of digital silence — every boundary frame-aligned, so the
    detector must recover exactly k segments at the analytic positions."""
    from unravelsports_spark.functions.audiocodec import encode_wav

    sig = []
    t0 = 0
    for _ in range(k):
        sig.append(np.zeros(gap_frames * frame_len))
        n = burst_frames * frame_len
        t = np.arange(t0, t0 + n)
        sig.append(10_000 * np.sin(2 * np.pi * 440 * t / rate))
        t0 += n
    sig.append(np.zeros(gap_frames * frame_len))
    return encode_wav(np.round(np.concatenate(sig)).astype(np.int16), rate)


def test_audio_segments_match_burst_arithmetic(spark):
    from unravelsports_spark.operators.audioseg import audio_segments

    rows = []
    for g in range(10):
        k, b, gap = 1 + g % 4, 1 + g % 3, 1 + g % 2
        rows.append((g, k, b, gap, bytearray(_burst_clip(k, b, gap))))
    df = spark.createDataFrame(
        rows, "grp long, k long, b long, gap long, payload binary"
    )
    got = {r["grp"]: r for r in audio_segments(df.select("grp", "payload")).collect()}
    for g in range(10):
        k, b, gap = 1 + g % 4, 1 + g % 3, 1 + g % 2
        r = got[g]
        assert r["n_frames"] == k * (b + gap) + gap
        assert r["n_active_frames"] == k * b
        assert r["n_segments"] == k, (g, k, b, gap, r)
        assert r["segment_starts"] == [gap + i * (b + gap) for i in range(k)]


def test_audio_segments_silence_and_short_clips(spark):
    """All-silence → zero segments; a clip shorter than one frame → zero
    frames; an unbroken tone → one segment starting at frame 0."""
    from unravelsports_spark.functions.audiocodec import encode_wav
    from unravelsports_spark.operators.audioseg import audio_segments

    rate = 4000
    t = np.arange(1200)
    rows = [
        (0, bytearray(encode_wav(np.zeros(1200, np.int16), rate))),
        (1, bytearray(encode_wav(np.zeros(100, np.int16), rate))),
        (2, bytearray(encode_wav(
            np.round(10_000 * np.sin(2 * np.pi * 440 * t / rate)).astype(np.int16),
            rate,
        ))),
    ]
    df = spark.createDataFrame(rows, "grp long, payload binary")
    got = {r["grp"]: r for r in audio_segments(df).collect()}
    assert got[0]["n_segments"] == 0 and got[0]["n_frames"] == 3
    assert got[1]["n_frames"] == 0 and got[1]["segment_starts"] == []
    assert got[2]["n_segments"] == 1 and got[2]["segment_starts"] == [0]
