"""Interval (range) join — batch and stream-stream.

`interval_join` answers "left events joined to right events of the same key
within a trailing time window" (attribution, sessional context). The same
expression runs:

- **batch**: equi-join on the key with the range as a join condition — Spark
  plans SortMergeJoin on the key and evaluates the range predicate inside
  the join, so there is exactly one shuffle per side and never a cross
  product;
- **streaming**: a watermarked stream-stream inner join; the range condition
  bounds the join state (Spark evicts right-side rows older than
  left.watermark − window), which is what makes the join runnable forever.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_ts: str,
    right_ts: str,
    window: str = "30 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """left ⋈ right on keys with right_ts ∈ [left_ts − window, left_ts].

    Column names of `left`/`right` must not collide except for the keys.
    On streaming inputs both sides get watermarks (required for state
    eviction in stream-stream joins)."""
    if left.isStreaming or right.isStreaming:
        left = left.withWatermark(left_ts, watermark)
        right = right.withWatermark(right_ts, watermark)
    cond = None
    for k in keys:
        c = left[k] == right[k]
        cond = c if cond is None else cond & c
    rng = (right[right_ts] >= left[left_ts] - F.expr(f"INTERVAL {window}")) & (
        right[right_ts] <= left[left_ts]
    )
    joined = left.join(right, cond & rng, "inner")
    # de-duplicate key columns (keep left's)
    for k in keys:
        joined = joined.drop(right[k])
    return joined
