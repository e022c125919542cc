"""Privacy release audits beyond k-anonymity (engine addition §2.12; built
round 10, driver registration round 11).

:func:`~unravelsports_spark.operators.filtering.k_anonymity_report` (r9)
measures equivalence-class SIZE — how many rows share each quasi-identifier
combination. Size alone is not enough for release gating: a class of 50
rows whose sensitive attribute is the SAME value for all 50 leaks that
value to anyone who can place a person in the class (the homogeneity
attack l-diversity exists to flag — Machanavajjhala et al. 2007). This
module adds that second axis, and (r12) the third:
:func:`t_closeness_report`, which catches the SKEW leg l-diversity
misses — distinct values whose distribution still concentrates on one.

Scale shape: every report starts from the same two-phase map-side-
combinable collapse as k_anonymity_report / d_cdc_chunks — ONE
corpus-sized shuffle on (quasi..., sensitive), then class-sized work.
The k-anon/l-div rollups stay join-free and window-free end to end (a
COUNT(DISTINCT) inside the class agg would triple rows through the
exchange — the distinct collapses in phase 1 instead);
:func:`t_closeness_report` additionally builds a classes×m value grid
from broadcast-sized pieces with one class-partitioned window cumsum —
still nothing corpus-sized beyond the phase-1 exchange (r12 review pass
2 #3 scoped this paragraph). Every output is a tiny histogram that never
itself leaks a quasi-identifier combination.
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


def t_closeness_report(
    df: DataFrame,
    quasi_cols: list,
    sensitive_col: str,
    t_ppm: int = 150_000,
) -> DataFrame:
    """t-closeness audit (Li, Li & Venkatasubramanian 2007 — the third
    privacy axis; built r12, driver registration queued r13): l-diversity
    counts distinct sensitive values but misses SKEW — a class whose
    values are {low, low, …, low, high} is "diverse" yet still tells an
    attacker the person is almost certainly low. t-closeness bounds the
    EARTH MOVER'S DISTANCE between each class's sensitive-value
    distribution and the GLOBAL distribution; for an ordered numeric
    attribute with equal-step ground distance,
    ``EMD = (1/(m-1)) · Σ_i |cum(P)_i − cum(Q)_i|`` over the m ordered
    values.

    Exactness contract: the EMD is computed in INTEGER arithmetic —
    per position, ``|cumC_i·G − cumG_i·C|`` (class/global cumulative
    counts cross-multiplied; decimal(38,0) products, so no overflow until
    38 digits) — then floored once onto a parts-per-million grid:
    ``emd_ppm = (Σ … · 1_000_000) div ((m−1)·C·G)``. Every engine
    reproduces that bit-for-bit (positive integer div), so the report is
    oracle-certifiable; ``at_risk`` is DEFINED on the ppm projection
    (``emd_ppm > t_ppm``), deterministic rather than ε-close. A corpus
    with m == 1 sensitive value is trivially 0-close (guarded — no
    division by m−1 = 0).

    NULL contract: rows with a NULL sensitive value are EXCLUDED from
    both distributions (a NULL has no position in the ordered domain, and
    engines disagree on NULL sort placement — letting it through would
    silently flip cumulative sums between engines). Audit NULL leakage
    with :func:`l_diversity_report`, which counts NULL as a value.

    Output: (emd_decile, at_risk, n_classes, n_rows) ordered by decile —
    the histogram of classes per 10%-EMD bucket (decile = emd_ppm div
    100_000), flagged against ``t_ppm``. Tiny, and never itself leaks a
    quasi-identifier combination.

    NULL QUASI-identifier values form their own equivalence class, like
    the sibling audits (null-SAFE join keys throughout — a null-unsafe
    grid join would give every NULL-keyed class zero matched counts and
    an impossible >100% EMD; r12 review pass 2 #1, regression-pinned).

    Plan: one corpus-sized shuffle on (quasi…, sensitive) — the same
    phase-1 collapse as l_diversity_report; EVERYTHING downstream derives
    from that class-sized frame (per-class totals, the global
    distribution, its totals — never a second corpus scan; r12 review
    pass 2 #2); the global distribution and totals are BROADCAST (m rows
    / 1 row); the dense class×value grid is classes·m rows with ONE
    window cumsum partitioned by class; then class- and histogram-sized
    aggregations. No Expand, no corpus-sized join."""
    import functools

    from pyspark.sql import Window

    # internal-alias collision guard (ADVICE r12 #3): the grid build
    # rejoins pv under fresh aliases; a caller column named like one of
    # them (e.g. a quasi column literally called '_c' or '_gv') would
    # raise AnalysisException — or worse, silently misjoin the grid.
    # Fail loud at call time instead (the require_new_column discipline).
    # casefolded compare (r13 review #5): Spark resolves column names
    # case-insensitively by default, so '_V' collides with '_v' just as
    # surely — note _c/_C and _g/_G etc. therefore fold to one entry each
    reserved = {
        "_v", "_c", "_gv", "_gc", "_g", "_cumg", "_m",
        "_vb", "_cback", "_c0", "_cumc", "_num", "_cc", "_gg", "_mm",
        "_rows",
    } | {f"_qb{i}" for i in range(len(quasi_cols))}
    clashes = {
        c for c in list(quasi_cols) + [sensitive_col] if c.lower() in reserved
    }
    if clashes:
        raise ValueError(
            "t_closeness_report: column name(s) collide with internal "
            f"aliases: {sorted(clashes)} — rename the input column(s)"
        )

    qs = [F.col(c) for c in quasi_cols]
    rows = df.where(F.col(sensitive_col).isNotNull())
    # phase 1: the ONE corpus-sized collapse; everything below reuses it
    pv = rows.groupBy(*qs, F.col(sensitive_col).alias("_v")).agg(
        F.count("*").alias("_c")
    )
    per_class = pv.groupBy(*qs).agg(F.sum("_c").alias("_C"))
    # global ordered distribution + totals from the CLASS-SIZED pv (fresh
    # aliases: per_class/pv_back share pv's lineage, and reusing pv's
    # attribute ids across the self-joins below trips AMBIGUOUS_REFERENCE)
    gcnt = (
        pv.select(F.col("_v").alias("_gv"), F.col("_c").alias("_gc"))
        .groupBy("_gv")
        .agg(F.sum("_gc").alias("_g"))
    )
    wg = Window.orderBy("_gv").rowsBetween(Window.unboundedPreceding, 0)
    gdist = gcnt.select("_gv", F.sum("_g").over(wg).alias("_cumg"))
    gtot = gcnt.agg(F.sum("_g").alias("_G"), F.count("*").alias("_m"))
    # dense grid: every class × every global value (absent values carry
    # cnt 0 — the cumulative sums need them) + the 1-row totals, all
    # broadcast; ONE window cumsum per class. per_class derives FROM pv
    # (class-sized input), so joining pv back is a self-join: every
    # rejoined column re-enters under a FRESH alias (AMBIGUOUS_REFERENCE
    # otherwise — found the hard way in r12), and the quasi keys join
    # NULL-SAFELY so a NULL-keyed class matches its own counts.
    pv_back = pv.select(
        *[F.col(c).alias(f"_qb{i}") for i, c in enumerate(quasi_cols)],
        F.col("_v").alias("_vb"),
        F.col("_c").alias("_cback"),
    )
    back_cond = functools.reduce(
        lambda a, b: a & b,
        [F.col(c).eqNullSafe(F.col(f"_qb{i}")) for i, c in enumerate(quasi_cols)]
        + [F.col("_gv") == F.col("_vb")],  # _v is filtered non-null above
    )
    grid = (
        per_class.join(F.broadcast(gdist))
        .join(F.broadcast(gtot))
        .join(pv_back, back_cond, "left")
        .withColumn("_c0", F.coalesce(F.col("_cback"), F.lit(0)))
    )
    wc = (
        Window.partitionBy(*quasi_cols)
        .orderBy("_gv")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    dec = "decimal(38,0)"
    grid = grid.withColumn("_cumc", F.sum("_c0").over(wc))
    term = F.abs(
        F.col("_cumc").cast(dec) * F.col("_G").cast(dec)
        - F.col("_cumg").cast(dec) * F.col("_C").cast(dec)
    )
    per_class_emd = grid.groupBy(*qs).agg(
        F.sum(term).alias("_num"),
        F.max("_C").alias("_Cc"),
        F.max("_G").alias("_Gg"),
        F.max("_m").alias("_mm"),
    )
    ppm = F.when(F.col("_mm") <= 1, F.lit(0).cast("long")).otherwise(
        F.expr(
            "cast((_num * cast(1000000 as decimal(38,0))) div "
            "(cast(_mm - 1 as decimal(38,0)) * cast(_Cc as decimal(38,0))"
            " * cast(_Gg as decimal(38,0))) as long)"
        )
    )
    per_class_emd = per_class_emd.select(
        F.col("_Cc").alias("_rows"), ppm.alias("emd_ppm")
    )
    # at_risk is PER CLASS (emd_ppm > t_ppm), then the histogram groups by
    # (decile, at_risk) — a threshold off a decile boundary must split the
    # bucket, not mislabel half of it
    return (
        per_class_emd.select(
            F.expr("emd_ppm div 100000").alias("emd_decile"),
            (F.col("emd_ppm") > int(t_ppm)).alias("at_risk"),
            "_rows",
        )
        .groupBy("emd_decile", "at_risk")
        .agg(F.count("*").alias("n_classes"), F.sum("_rows").alias("n_rows"))
        .orderBy("emd_decile", "at_risk")
    )
