"""Energy-based audio segmentation over WAV payload columns (engine
addition §2.12; built round 10, driver registration round 11) — the audio
counterpart of the video scene-cut detector: a cheap per-clip temporal-
structure descriptor (voice-activity-style active/silent segmentation)
that audio pipelines key on for silence trimming, burst counting, and
segment-aligned sampling before any expensive model runs.

Detector: non-overlapping frames of ``frame_len`` samples; a frame is
ACTIVE when its normalized RMS (sqrt(mean(s²))/32768 over channel 0)
exceeds ``threshold``; a segment is a maximal run of active frames. Real
pipeline end-to-end: the WAV parse is this repo's own codec
(functions/audiocodec.decode_wav), no external DSP.

Certifiability (the scene-cut/tone discipline): digital silence has RMS
exactly 0 and a full-scale tone frame sits orders of magnitude above any
sane threshold, so segment COUNTS and frame POSITIONS are bin-exact for
frame-aligned synthesis — the r11 registration's analytic oracle derives
them from the burst arithmetic. Raw RMS magnitudes are test-only.

Scale shape: ONE Arrow mapInPandas pass, O(samples) per clip; output is
clip-sized (counts + a bounded segment-start list)."""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T


def audio_segments(
    df: DataFrame,
    threshold: float = 0.01,
    frame_len: int = 400,
    payload_col: str = "payload",
) -> DataFrame:
    """Per clip: ``n_frames`` (full frames only — a trailing partial frame
    is ignored, so synthesis arithmetic stays exact), ``n_active_frames``,
    ``n_segments`` (maximal active runs) and ``segment_starts``
    (array<int>, the first frame index of each segment)."""
    from ..functions.audiocodec import decode_wav

    keep = [f for f in df.schema.fields if f.name != payload_col]
    schema = T.StructType(
        keep
        + [
            T.StructField("n_frames", T.IntegerType()),
            T.StructField("n_active_frames", T.IntegerType()),
            T.StructField("n_segments", T.IntegerType()),
            T.StructField("segment_starts", T.ArrayType(T.IntegerType())),
        ]
    )
    keep_names = [f.name for f in keep]
    thr = float(threshold)
    fl = int(frame_len)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                s, _rate = decode_wav(bytes(row[payload_col]))
                ch0 = s[:, 0].astype(np.float64)
                nf = len(ch0) // fl
                # vectorized frame RMS: one reshape + one mean per CLIP,
                # not one numpy call per 400-sample frame (r10 review
                # pass 2 finding #6 — the per-frame loop was the hot cost
                # of the whole pass on hour-long clips)
                if nf > 0:
                    fr = ch0[: nf * fl].reshape(nf, fl)
                    rms = np.sqrt((fr * fr).mean(axis=1)) / 32768.0
                    active = rms > thr
                    # segment starts = active frames whose predecessor is
                    # inactive (frame 0 counts when active)
                    rises = active & ~np.concatenate(([False], active[:-1]))
                    starts = [int(i) for i in np.flatnonzero(rises)]
                    active_n = int(active.sum())
                else:
                    starts, active_n = [], 0
                rec = {k: row[k] for k in keep_names}
                rec["n_frames"] = nf
                rec["n_active_frames"] = active_n
                rec["n_segments"] = len(starts)
                rec["segment_starts"] = starts
                out.append(rec)
            yield pd.DataFrame(out, columns=[f.name for f in schema.fields])

    return df.mapInPandas(run, schema)
