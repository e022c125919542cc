"""Corpus mixture resampling: hit a target domain distribution (e.g. 40%
web / 30% code / 30% books) by computing per-domain Bernoulli keep-rates and
sampling deterministically by content hash.

This is the standard "data mixture" step before LLM pretraining: given
observed per-domain counts and a target share vector, each domain keeps
``rate_d = min(1, target_d * T / n_d)`` where T is the largest total corpus
size achievable without upsampling any domain (T = min_d n_d / target_d).

Everything is engine-exact: rates are carried as ppm integers (the double →
bigint truncation is the same IEEE operation in Spark and DuckDB), and the
keep decision compares ``md5(text) mod 1e6 < rate_ppm`` — no RNG, fully
reproducible, and re-runnable incrementally (a new shard of data gets the
same verdicts for existing rows).

Scale notes: the per-domain counts are a tiny aggregate (one row per domain)
broadcast back onto the fact table — the corpus itself never shuffles; the
sample is a pure filter evaluated in whole-stage codegen at scan time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..cache import tracked_persist

PPM = 1_000_000


def _hash_ppm(col) -> F.Column:
    """Uniform [0, 1e6) integer from md5 — bit-identical across engines."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("bigint") % PPM


def mixture_rates(
    df: DataFrame,
    targets: dict[str, float],
    domain_col: str = "source",
    persist: bool = True,
) -> DataFrame:
    """Per-domain keep-rates (ppm) for the largest downsample-only corpus
    matching ``targets`` (shares summing to 1). Domains absent from
    ``targets`` get rate 0. Returns (domain, n_docs, target_ppm, rate_ppm).

    Cache contract (ADVICE r4): with ``persist=True`` the per-domain counts
    are ``tracked_persist``-ed, and SOMEONE must eventually call
    ``unravelsports_spark.cache.release_tracked()`` — the plan harness does
    it per query, the test suite per test. A caller invoking this
    repeatedly outside that harness (e.g. per micro-batch in an ingest
    loop) should pass ``persist=False`` to avoid accumulating cached
    relations; the cost is one extra scan-and-aggregate of ``df`` per
    consumer branch.
    """
    # one row per domain — persisted so every consumer branch (the T-total
    # min, the rate projection, and a caller that builds rates twice, e.g.
    # rates-report + sample in one query) reads one InMemoryRelation instead
    # of re-scanning and re-aggregating the corpus per branch (the r2/r3
    # single-lineage fix pattern; was 4 corpus scans in t_domain_mixture)
    counts = df.groupBy(domain_col).agg(F.count("*").alias("n_docs"))
    if persist:
        counts = tracked_persist(counts)
    tgt = F.create_map(*[x for k, v in targets.items() for x in (F.lit(k), F.lit(float(v)))])
    counts = counts.withColumn("_target", F.coalesce(tgt[F.col(domain_col)], F.lit(0.0)))
    # T = min over targeted domains of n_d / target_d  (cross-joined 1-row agg
    # so the whole computation stays one lazy plan; the agg input is one row
    # per domain, not per doc)
    t_total = (
        counts.filter(F.col("_target") > 0)
        .select(F.min(F.col("n_docs") / F.col("_target")).alias("_t"))
    )
    return (
        counts.crossJoin(F.broadcast(t_total))
        .withColumn(
            "rate_ppm",
            F.least(
                F.lit(PPM).cast("bigint"),
                (F.col("_target") * F.col("_t") / F.col("n_docs") * PPM).cast("bigint"),
            ),
        )
        .withColumn("target_ppm", (F.col("_target") * PPM).cast("bigint"))
        .select(domain_col, "n_docs", "target_ppm", "rate_ppm")
    )


def sample_mixture(
    df: DataFrame,
    targets: dict[str, float],
    domain_col: str = "source",
    text_col: str = "text",
    rates: DataFrame | None = None,
) -> DataFrame:
    """Deterministically sample ``df`` to the target mixture: broadcast-join
    the per-domain rates and keep rows whose content-hash ppm falls under the
    domain's rate. Adds ``rate_ppm`` to the output. Pass a precomputed
    :func:`mixture_rates` frame as ``rates`` when the caller also reports on
    it — sharing one rates lineage keeps the whole job at the two-scan
    minimum (one tiny domain-column pass for counts, one full pass to
    sample)."""
    if rates is None:
        rates = mixture_rates(df, targets, domain_col)
    rates = rates.select(domain_col, "rate_ppm")
    return (
        df.join(F.broadcast(rates), domain_col)
        .filter(_hash_ppm(text_col) < F.col("rate_ppm"))
    )
