"""Scene-cut detection over MJPEG-AVI payload columns (engine addition
§2.12; built round 10, driver registration round 11) — the video
counterpart of the audio spectral/MFCC front ends: a cheap per-clip
temporal-structure descriptor that video dedup / sampling pipelines key on
(cut density separates static slates from montages; cut positions drive
scene-aligned frame sampling that a fixed every-k stride misses).

Detector: consecutive-frame mean absolute luminance difference (the
classic hard-cut detector) — decode frame i and i-1, score
``mean(|f_i - f_{i-1}|) / 255``, declare a cut when the score exceeds
``threshold``. Real pipeline end-to-end: the AVI container parse and the
baseline-JPEG decode are this repo's own codecs
(operators/multimodal._parse_avi_frames, functions/jpegcodec.decode_jpeg),
no external decoder.

Certifiability: JPEG DC quantization shifts a solid frame's decoded value
slightly but DETERMINISTICALLY, and identical payloads decode identically
— so within-scene diffs are exactly 0.0 and cross-scene diffs sit far
above any sane threshold. Cut COUNTS and POSITIONS are therefore
bin-exact (the mm_audio_spectral argmax-bin discipline); the raw diff
magnitudes are quantization-sensitive and stay test-only.

Scale shape: ONE Arrow mapInPandas pass; per clip the work is
O(n_frames · pixels) with only two decoded frames held at a time; output
is clip-sized (counts + a bounded cut-index list), so downstream joins
never touch payloads."""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T


def scene_cuts(
    df: DataFrame,
    threshold: float = 0.2,
    payload_col: str = "payload",
) -> DataFrame:
    """Per clip: ``n_frames`` (int), ``n_cuts`` (int — frame transitions
    whose mean |Δluma|/255 exceeds ``threshold``) and ``cut_indices``
    (array<int> — the index of the FIRST frame of each new scene, ordered).
    A clip with fewer than 2 frames has zero cuts by definition."""
    from ..functions.jpegcodec import decode_jpeg
    from .multimodal import _parse_avi_frames

    keep = [f for f in df.schema.fields if f.name != payload_col]
    schema = T.StructType(
        keep
        + [
            T.StructField("n_frames", T.IntegerType()),
            T.StructField("n_cuts", T.IntegerType()),
            T.StructField("cut_indices", T.ArrayType(T.IntegerType())),
        ]
    )
    keep_names = [f.name for f in keep]
    thr = float(threshold)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                frames = _parse_avi_frames(bytes(row[payload_col]))
                cuts = []
                prev = None
                for i, blob in enumerate(frames):
                    # identical consecutive payloads decode identically:
                    # skip the second decode, the diff is exactly 0
                    if prev is not None and blob == prev[0]:
                        prev = (blob, prev[1])
                        continue
                    img = decode_jpeg(blob).astype(np.float64)
                    if prev is not None:
                        a = prev[1]
                        if a.shape == img.shape:
                            score = float(np.abs(img - a).mean() / 255.0)
                        else:
                            score = 1.0  # geometry change is always a cut
                        if score > thr:
                            cuts.append(i)
                    prev = (blob, img)
                rec = {k: row[k] for k in keep_names}
                rec["n_frames"] = len(frames)
                rec["n_cuts"] = len(cuts)
                rec["cut_indices"] = cuts
                out.append(rec)
            yield pd.DataFrame(out, columns=[f.name for f in schema.fields])

    return df.mapInPandas(run, schema)
