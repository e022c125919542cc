"""Privacy release audits beyond k-anonymity (engine addition §2.12; built
round 10, driver registration round 11).

:func:`~unravelsports_spark.operators.filtering.k_anonymity_report` (r9)
measures equivalence-class SIZE — how many rows share each quasi-identifier
combination. Size alone is not enough for release gating: a class of 50
rows whose sensitive attribute is the SAME value for all 50 leaks that
value to anyone who can place a person in the class (the homogeneity
attack l-diversity exists to flag — Machanavajjhala et al. 2007). This
module adds that second axis.

Scale shape (both reports): the same two-phase map-side-combinable rollup
discipline as k_anonymity_report / d_cdc_chunks — one corpus-sized shuffle
on (quasi..., sensitive), then class- and histogram-sized aggregations; no
windows, no joins, no Expand (a COUNT(DISTINCT) inside the class agg would
triple rows through the exchange — the distinct collapses in phase 1
instead). The output is a tiny histogram that never itself leaks a
quasi-identifier combination.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def l_diversity_report(
    df: DataFrame, quasi_cols: list, sensitive_col: str, l: int = 3
) -> DataFrame:
    """Distinct-l-diversity audit: group rows into quasi-identifier
    equivalence classes and report, per DISTINCT-SENSITIVE-VALUE COUNT
    (the class's l), how many classes and rows sit at that l and whether
    it violates the ``l`` threshold.

    Output: (l_distinct, n_classes, n_rows, at_risk) ordered by
    l_distinct. ``at_risk`` rows are re-identifiable by homogeneity even
    when their class passes k-anonymity.

    Plan: phase 1 collapses (quasi..., sensitive) duplicates —
    map-side-combinable, the only corpus-sized shuffle; phase 2 reduces
    each class to (l = COUNT(*), rows = SUM(cnt)); phase 3 is the
    histogram. NULL sensitive values count as one distinct value (an
    unknown diagnosis is still a homogeneous leak if it is all the class
    contains)."""
    qs = [F.col(c) for c in quasi_cols]
    per_value = df.groupBy(*qs, F.col(sensitive_col)).agg(
        F.count("*").alias("_cnt")
    )
    per_class = per_value.groupBy(*qs).agg(
        F.count("*").alias("l_distinct"), F.sum("_cnt").alias("_rows")
    )
    return (
        per_class.groupBy("l_distinct")
        .agg(
            F.count("*").alias("n_classes"),
            F.sum("_rows").alias("n_rows"),
        )
        .select(
            "l_distinct",
            "n_classes",
            "n_rows",
            (F.col("l_distinct") < int(l)).alias("at_risk"),
        )
        .orderBy("l_distinct")
    )
