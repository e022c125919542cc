"""Savitzky–Golay smoothing in pure NumPy (W6).

Equivalent to scipy.signal.savgol_filter(x, window_length, polyorder) with its
default mode='interp' (the call shape the reference uses for velocity
smoothing, /root/reference/unravel/soccer/dataset/kloppy_polars.py:313-380):
interior points are the least-squares polynomial fit evaluated at the window
center (a convolution), edge points re-fit the polynomial to the first/last
full window and evaluate it at the edge offsets.
"""

from __future__ import annotations

import numpy as np


def _center_kernel(window_length: int, polyorder: int) -> np.ndarray:
    half = window_length // 2
    pos = np.arange(-half, half + 1, dtype=float)
    A = pos[:, None] ** np.arange(polyorder + 1)[None, :]
    # fitted value at the window center is the constant coefficient
    return np.linalg.pinv(A)[0]


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
    pos = np.arange(window_length, dtype=float)
    A = pos[:, None] ** np.arange(polyorder + 1)[None, :]
    pinvA = np.linalg.pinv(A)
    head_coef = pinvA @ x[:window_length]
    out[:half] = A[:half] @ head_coef
    tail_coef = pinvA @ x[n - window_length :]
    out[n - half :] = A[half + 1 :] @ tail_coef
    return out
