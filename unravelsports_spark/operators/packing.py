"""Sequence packing: assign documents to fixed-token-budget bins — the step
that turns a filtered corpus into training sequences.

Formulation: within each ``by`` group, documents are ordered deterministically
(``order_col``) and binned by the START offset of each doc in the
concatenated token stream: ``bin = floor((cumsum(tokens) − tokens) /
budget)``. One window cumsum per group — a single shuffle, no sequential
driver loop, and an exact DuckDB oracle (same SQL window). This is
streaming-concatenation packing (documents may straddle a boundary and get
truncated/continued by the tokenizer downstream), not bin packing — the
greedy first-fit variant is inherently sequential and belongs in the
tokenizer, not the engine.

Skew note: one giant group serializes its window; pack per (source,
shard) — any deterministic sub-key — when a single group exceeds ~10^8 docs.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    budget: int,
    token_col: str = "n_tokens",
    order_col: str = "doc_id",
    by: Sequence[str] = ("source",),
    out: str = "bin",
) -> DataFrame:
    if budget <= 0:
        raise ValueError("budget must be positive")
    w = Window.partitionBy(*by).orderBy(order_col)
    start = F.sum(token_col).over(w) - F.col(token_col)
    return df.withColumn(out, F.floor(start / budget).cast("long"))
