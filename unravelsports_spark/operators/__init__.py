"""Operator package. Shared micro-contracts live here.

``require_new_column`` is the one rule every column-appending text-stage
operator shares (ADVICE r11 #3, single-sourced per r12 review pass 1 #7):
fail LOUD at call time when the output column already exists — appending a
duplicate field name surfaces later as an obscure ambiguous-reference
AnalysisException far from the cause.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def require_new_column(df: DataFrame, out_col: str) -> None:
    """Raise ValueError when ``out_col`` is already a column of ``df``."""
    if out_col in df.columns:
        raise ValueError(
            f"out_col {out_col!r} is already a column of the input frame"
        )
