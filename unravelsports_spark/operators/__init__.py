"""Operator package. Shared micro-contracts live here.

``require_new_column`` is the one rule every column-appending text-stage
operator shares (ADVICE r11 #3, single-sourced per r12 review pass 1 #7):
fail LOUD at call time when the output column already exists — appending a
duplicate field name surfaces later as an obscure ambiguous-reference
AnalysisException far from the cause.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame

#: the portable whitespace class — Java's \\s includes U+000B, RE2's does
#: not (the htmltext r12 finding), so every cross-engine regex spells the
#: class explicitly. ONE copy (r13 review pass 19: filtering/sitemap/
#: htmltext each carried a set-identical spelling with differing char
#: order; a portability correction must reach all consumers at once).
#: Character order matches htmltext's original certified spelling.
PORTABLE_WS = " \\t\\n\\x0b\\f\\r"


def require_new_column(df: DataFrame, out_col: str) -> None:
    """Raise ValueError when ``out_col`` is already a column of ``df``."""
    if out_col in df.columns:
        raise ValueError(
            f"out_col {out_col!r} is already a column of the input frame"
        )


def precondition_filter(df: DataFrame, cond: Column, msg: str) -> DataFrame:
    """Row-level precondition tripwire (the releasediff/robots shape,
    single-sourced per r13 review pass 8 #3): passes every row unchanged
    while ``cond`` holds, throws the query loudly at the first violating
    row. The guard rides a FILTER — never a projected column — because a
    Filter predicate is evaluated for every row no matter what the caller
    projects, whereas a guarded column vanishes under column pruning (the
    r13 review pass 1 #2 lesson). ``cond`` must not contain a bare window
    expression (materialize it to a column first — windows are illegal in
    WHERE); assert_true yields NULL on success → coalesce(…, true)."""
    from pyspark.sql import functions as F

    guard = F.assert_true(cond, F.lit(msg))
    return df.where(F.coalesce(guard.cast("boolean"), F.lit(True)))
