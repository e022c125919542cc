"""Savitzky–Golay smoothing in pure NumPy (W6).

Equivalent to scipy.signal.savgol_filter(x, window_length, polyorder) with its
default mode='interp' (the call shape the reference uses for velocity
smoothing, /root/reference/unravel/soccer/dataset/kloppy_polars.py:313-380):
interior points are the least-squares polynomial fit evaluated at the window
center (a convolution), edge points re-fit the polynomial to the first/last
full window and evaluate it at the edge offsets.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np


@lru_cache(maxsize=32)
def _center_kernel(window_length: int, polyorder: int) -> np.ndarray:
    half = window_length // 2
    pos = np.arange(-half, half + 1, dtype=float)
    A = pos[:, None] ** np.arange(polyorder + 1)[None, :]
    # fitted value at the window center is the constant coefficient
    return np.linalg.pinv(A)[0]


@lru_cache(maxsize=32)
def _edge_matrices(window_length: int, polyorder: int):
    """(A, pinv(A)) for the edge re-fit — cached: the grouped kernels call
    savgol_filter once per (small) group, and recomputing two pinvs per
    call dominated the per-group cost (1500 groups at sf0.1)."""
    pos = np.arange(window_length, dtype=float)
    A = pos[:, None] ** np.arange(polyorder + 1)[None, :]
    return A, np.linalg.pinv(A)


def savgol_filter(x: np.ndarray, window_length: int, polyorder: int) -> np.ndarray:
    x = np.asarray(x, dtype=float)
    n = len(x)
    if n < window_length:
        return x.copy()
    if window_length % 2 != 1:
        raise ValueError("window_length must be odd")
    if polyorder >= window_length:
        raise ValueError("polyorder must be less than window_length")

    half = window_length // 2
    kernel = _center_kernel(window_length, polyorder)
    out = np.empty_like(x)
    out[half : n - half] = np.convolve(x, kernel[::-1], mode="valid")

    # mode='interp': polynomial fit over the first/last window, evaluated at
    # the uncovered edge offsets
    A, pinvA = _edge_matrices(window_length, polyorder)
    head_coef = pinvA @ x[:window_length]
    out[:half] = A[:half] @ head_coef
    tail_coef = pinvA @ x[n - window_length :]
    out[n - half :] = A[half + 1 :] @ tail_coef
    return out


def savgol_by_key(
    df,
    key_col: str,
    order_cols,
    value_col: str,
    out_cols,
    window_length: int,
    polyorder: int,
    ndigits: int,
    n_buckets: int = 32,
):
    """Per-key Savitzky–Golay smoothing as a BUCKETED grouped kernel.

    ``groupBy(key).applyInPandas`` pays ~ms of Arrow slicing + pandas
    construction per GROUP — at 1.5k small series that overhead was ~5 s,
    dwarfing the actual math. Grouping by ``key % n_buckets`` instead gives
    one kernel call per bucket; inside, rows sort by (key, *order_cols) and
    numpy boundary detection walks the per-key series — identical per-series
    arithmetic, ~50x fewer crossings. Returns ``out_cols + [value_smooth]``
    (value_smooth rounded to ``ndigits``)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    schema = T.StructType(
        [df.schema[c] for c in out_cols]
        + [T.StructField("value_smooth", T.DoubleType())]
    )

    def kernel(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values([key_col, *order_cols], kind="stable")
        keys = pdf[key_col].to_numpy()
        vals = pdf[value_col].to_numpy(dtype=float)
        out = np.empty(len(pdf))
        bounds = np.flatnonzero(np.r_[True, keys[1:] != keys[:-1], True])
        for s, e in zip(bounds[:-1], bounds[1:]):
            out[s:e] = savgol_filter(vals[s:e], window_length, polyorder)
        res = pdf[list(out_cols)].copy()
        res["value_smooth"] = out.round(ndigits)
        return res

    bucketed = df.withColumn(
        "_b", (F.abs(F.hash(F.col(key_col))) % n_buckets).cast("long")
    )
    return bucketed.groupBy("_b").applyInPandas(
        lambda pdf: kernel(pdf.drop(columns=["_b"])), schema
    )
