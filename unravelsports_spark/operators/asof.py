"""As-of join (J8): for each left row, the most recent right row at or before
its timestamp, per key.

Spark has no native as-of join (reference nearest-frame lookup:
graph_converter.py:910-931 uses search_sorted). The classic distributed
formulation: union both sides with a tag, one window pass per key ordered by
(ts, tag) carrying the last seen right-side value forward, then keep left
rows. One shuffle on the key — no range cross-join blowup, skew-safe under
AQE."""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: Sequence[str],
    value_cols: Sequence[str],
    suffix: str = "_right",
) -> DataFrame:
    """left ⟕ most-recent right (right.on <= left.on) per `by` keys.
    `value_cols` are carried from the right side as `<col><suffix>`."""
    by = list(by)
    lcols = left.columns
    tagged_left = left.select(
        *by, F.col(on).alias("_ts"), F.lit(1).alias("_side"),
        *[F.col(c) for c in lcols if c not in by and c != on],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_rv_{c}") for c in value_cols],
    )
    tagged_right = right.select(
        *by, F.col(on).alias("_ts"), F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c not in by and c != on],
        *[F.col(c).alias(f"_rv_{c}") for c in value_cols],
    )
    unioned = tagged_left.unionByName(tagged_right)
    # right rows (side 0) sort before left rows at equal timestamps → a right
    # row at exactly left.ts matches (<= semantics)
    w = (
        Window.partitionBy(*by)
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for c in value_cols:
        unioned = unioned.withColumn(
            f"_rv_{c}", F.last(f"_rv_{c}", ignorenulls=True).over(w)
        )
    out = unioned.filter(F.col("_side") == 1).drop("_side")
    out = out.withColumnRenamed("_ts", on)
    for c in value_cols:
        out = out.withColumnRenamed(f"_rv_{c}", f"{c}{suffix}")
    return out
