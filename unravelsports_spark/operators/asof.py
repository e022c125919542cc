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
    direction: str = "backward",
    tolerance=None,
) -> DataFrame:
    """left ⟕ nearest right per `by` keys; `value_cols` are carried from the
    right side as `<col><suffix>`.

    direction (polars/pandas join_asof surface):
      - ``backward`` (default): most recent right with right.on <= left.on
      - ``forward``: earliest right with right.on >= left.on
      - ``nearest``: whichever of the two is closer (ties → backward)

    ``tolerance``: max |left.on − right.on| (same units as `on`, which must be
    numeric/orderable with subtraction, e.g. epoch millis); matches farther
    away become nulls. Still one shuffle: nearest runs the same single-pass
    carry twice over one union, never a range join."""
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction must be backward|forward|nearest, got {direction!r}")
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
    unioned = tagged_left.unionByName(tagged_right).withColumn(
        "_rts", F.when(F.col("_side") == 0, F.col("_ts"))
    )
    carried = dict.fromkeys(["b", "f"])
    if direction in ("backward", "nearest"):
        # right rows (side 0) sort before left rows at equal timestamps → a
        # right row at exactly left.ts matches (<= semantics)
        wb = (
            Window.partitionBy(*by)
            .orderBy("_ts", "_side")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        for c in ["_rts", *value_cols]:
            src = c if c == "_rts" else f"_rv_{c}"
            unioned = unioned.withColumn(f"_b_{src}", F.last(src, ignorenulls=True).over(wb))
    if direction in ("forward", "nearest"):
        wf = (
            Window.partitionBy(*by)
            .orderBy(F.col("_ts").desc(), "_side")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        for c in ["_rts", *value_cols]:
            src = c if c == "_rts" else f"_rv_{c}"
            unioned = unioned.withColumn(f"_f_{src}", F.last(src, ignorenulls=True).over(wf))

    out = unioned.filter(F.col("_side") == 1).drop("_side")
    if direction == "backward":
        pick = {c: F.col(f"_b__rv_{c}") for c in value_cols}
        mts = F.col("_b__rts")
    elif direction == "forward":
        pick = {c: F.col(f"_f__rv_{c}") for c in value_cols}
        mts = F.col("_f__rts")
    else:
        db = F.col("_ts") - F.col("_b__rts")
        df_ = F.col("_f__rts") - F.col("_ts")
        use_b = F.col("_f__rts").isNull() | (F.col("_b__rts").isNotNull() & (db <= df_))
        pick = {
            c: F.when(use_b, F.col(f"_b__rv_{c}")).otherwise(F.col(f"_f__rv_{c}"))
            for c in value_cols
        }
        mts = F.when(use_b, F.col("_b__rts")).otherwise(F.col("_f__rts"))
    if tolerance is not None:
        within = F.abs(F.col("_ts") - mts) <= tolerance
        pick = {c: F.when(within, v) for c, v in pick.items()}
    for c in value_cols:
        out = out.withColumn(f"{c}{suffix}", pick[c])
    out = out.withColumnRenamed("_ts", on)
    drop = [c for c in out.columns if c.startswith(("_b_", "_f_", "_rts", "_rv_"))]
    return out.drop(*drop)
