"""URL-frontier politeness planning (engine addition §2.12; built round
13, driver registration queued r14 as `t_frontier_plan`) — the second
half of the crawl-compliance pair VERDICT r12 named (robots.txt filtering
+ frontier scheduling): a polite crawler fetches at most ``per_host_limit``
URLs from one host per scheduling WAVE, so the frontier planner's job is
to assign every URL a (wave, slot) such that no (host, wave) cell exceeds
the limit and the assignment is REPRODUCIBLE across runs and retries.

Spark-first shape (pure Catalyst, exactly SQL-certifiable):
- ONE shuffle on the canonical host (the row_number window); wave =
  (rank−1) div limit, slot = (rank−1) mod limit — closed-form from the
  per-host rank, no iteration, no driver state;
- the within-host order is DETERMINISTIC: explicit priority first (when
  given), then md5(url) — content-keyed like o13_reservoir_sample, so a
  re-run, a retry, or a differently-partitioned input produces the
  identical plan (a nondeterministic frontier breaks resumable crawls);
- hosts ride :func:`~unravelsports_spark.operators.filtering.
  canonical_host`, the SAME identity the robots filter keys on — a URL
  pair that one operator treats as same-host never splits in the other.

At 100 TB: the window is the only corpus exchange and it partitions by
host, the natural crawl key. A pathologically hot host (one domain =
half the corpus) makes one heavy partition — same caveat as any per-host
operator; shard such hosts upstream or cap them with a WHERE on wave.

Ties to the reference: none (beyond-reference pipeline surface); the
window + closed-form arithmetic idiom follows plans/relational.py's
w3_rank_topk / t_sequence_packing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def frontier_plan(
    urls: DataFrame,
    per_host_limit: int,
    url_col: str = "url",
    priority_col: str | None = None,
) -> DataFrame:
    """Annotate ``urls`` with (``host``, ``wave``, ``slot``): slot <
    per_host_limit within every (host, wave), waves dense from 0 per
    host, order = priority DESC (when given) then md5(url). A NULL or
    non-URL row groups under the empty host '' — schedule or drop it
    explicitly downstream. PRECONDITION (enforced loud): urls are
    DISTINCT — duplicate rows (or more than one NULL) tie on every sort
    key and would make the assignment nondeterministic."""
    from . import precondition_filter, require_new_column
    from .filtering import url_canonical_host

    if per_host_limit < 1:
        raise ValueError(f"per_host_limit must be >= 1, got {per_host_limit}")
    for col in ("host", "wave", "slot", "_rk", "_fdup"):
        require_new_column(urls, col)
    host = url_canonical_host(F.col(url_col))  # the shared identity
    order = (
        [F.col(priority_col).desc()] if priority_col else []
    ) + [F.md5(F.col(url_col)).asc()]
    w = Window.partitionBy("host").orderBy(*order)
    n = int(per_host_limit)
    hosted = urls.withColumn("host", F.coalesce(host, F.lit("")))
    ranked = hosted.withColumn(
        "_rk", (F.row_number().over(w) - 1).cast("long")
    )
    # reproducibility PRECONDITION, enforced loud (r13 review pass 14 #1:
    # two rows with the IDENTICAL url — including multiple NULLs — tie on
    # every sort key, so row_number would assign their waves arbitrarily,
    # exactly the resumable-crawl breakage the module exists to prevent;
    # a crawler fetches each URL once, so duplicates mean a broken
    # frontier build: exact_dedup/distinct upstream). The count window
    # keys (host, url) and sits ABOVE the rank window: duplicates always
    # share a host, and hashpartitioning(host) already satisfies
    # clustering on (host, url), so the tripwire reuses the ONE exchange
    # (plan-guarded) instead of adding a url-keyed shuffle.
    ranked = precondition_filter(
        ranked.withColumn(
            "_fdup",
            F.count("*").over(Window.partitionBy("host", F.col(url_col))),
        ),
        F.col("_fdup") == 1,
        "frontier_plan precondition: duplicate url rows (or multiple "
        "NULL urls) make the (wave, slot) assignment nondeterministic — "
        "dedupe the frontier upstream (exact_dedup / distinct)",
    ).drop("_fdup")
    return (
        # integer div, not float-divide-and-cast — exact at any rank
        ranked.withColumn("wave", F.expr(f"_rk div {n}"))
        .withColumn("slot", F.expr(f"_rk % {n}"))
        .drop("_rk")
    )


def frontier_summary(planned: DataFrame) -> DataFrame:
    """The schedule audit: per wave — URLs, distinct hosts, and the max
    slot actually used (must stay < per_host_limit). Tiny output, one
    combinable rollup."""
    return (
        planned.groupBy("wave")
        .agg(
            F.count("*").alias("n_urls"),
            F.countDistinct("host").alias("n_hosts"),
            F.max("slot").alias("max_slot"),
        )
        .orderBy("wave")
    )


def allocate_crawl_budget(
    hosts: DataFrame,
    total_budget: int,
    weight_col: str = "weight",
    cap_col: str | None = None,
    host_col: str = "host",
) -> DataFrame:
    """Apportion a global per-cycle fetch budget across hosts (r14) — the
    quota step between recrawl priorities and the frontier: a crawl cycle
    has a total page budget; each host deserves a share proportional to
    its WEIGHT (page count, overdue mass, quality score in ppm — any
    non-negative integer measure), and the allocation must be exact
    (sums to the budget), deterministic, and engine-portable.

    Hamilton/largest-remainder apportionment in pure integer arithmetic:
    base_h = (B·w_h) div W, and the R = B − Σ base leftover units go to
    the R largest remainders ((B·w_h) mod W), ties broken by host name —
    a closed-form method (no iteration, no floats, no divisor search),
    so the DuckDB twin is hash-exact. With ``cap_col`` (per-host
    ceiling, e.g. the host's actual URL count) the apportioned value
    clips to the cap; clipped surplus is NOT redistributed in-pass
    (re-run on the uncapped remainder when the surplus matters — one
    pass stays closed-form, the documented trade).

    Output: (host, weight, budget[, cap]); Σ budget = total_budget when
    no cap clips (audit with one agg). PRECONDITIONS, loud: weights
    non-negative with a positive total (apportioning zero mass is caller
    error), one row per host, and B·w_h must fit int64 — enforced via
    the shared tripwire on w_h ≤ 2⁶² div B (at the documented operating
    sizes — budgets ≤ 10⁹ pages, ppm weights — the headroom is ×4000).

    At 100 TB: a naive global row_number over remainders would
    single-reduce the whole hosts table, so the leftover units land via
    the t_shard_manifest two-level pattern — 256 fixed remainder
    buckets counted with one combinable aggregate (256 rows to the
    driver), the bucket holding the R-th boundary found there, and the
    rank read from a window PARTITIONED BY BUCKET (256 independent
    in-partition sorts — every bucket still sorts its own rows, but no
    single reducer ever sees the table); buckets above the boundary
    take their +1 with no rank consulted. A degenerate remainder
    distribution (most hosts in one bucket) concentrates that bucket's
    sort in one partition — the frontier's hot-host caveat, documented
    not hidden. Weight totals are bounded to 2⁵⁵ (loud) so the bucket
    arithmetic stays inside int64.
    """
    from ..cache import tracked_persist
    from . import precondition_filter, require_new_column

    if total_budget < 0:
        raise ValueError(f"total_budget must be >= 0, got {total_budget}")
    # every temp actually created below is guarded (r14 review-3 #1: the
    # first list checked a never-created '_wsum' and missed three real
    # temps, the exact silent-overwrite class require_new_column exists
    # to make loud)
    for col in ("budget", "_base", "_rem", "_rbk", "_rrk", "_plus", "_hn"):
        require_new_column(hosts, col)
    b = int(total_budget)
    w = F.col(weight_col).cast("long")
    guarded = precondition_filter(
        hosts,
        w.isNotNull() & (w >= 0) & ((b == 0) | (w <= (2**62) // max(b, 1))),
        "allocate_crawl_budget precondition: weights must be non-negative "
        f"integers with B*w inside int64 (B={b})",
    )
    if cap_col is not None:
        # a negative cap would emit a negative fetch quota; NULL cap =
        # uncapped is the DOCUMENTED semantic (least() skips NULLs), so
        # only genuinely negative values trip (r14 review-3 #3)
        guarded = precondition_filter(
            guarded,
            F.col(cap_col).isNull() | (F.col(cap_col) >= 0),
            "allocate_crawl_budget precondition: caps must be "
            "non-negative (NULL = uncapped)",
        )
    guarded = precondition_filter(
        guarded.withColumn(
            "_hn", F.count("*").over(Window.partitionBy(host_col))
        ),
        F.col("_hn") == 1,
        "allocate_crawl_budget precondition: one row per host — duplicate "
        "host rows double-count their weight; aggregate upstream",
    ).drop("_hn")
    # persisted: the totals/bucket collects below AND the caller's
    # consumption all read this frame — without it every action re-scans
    # the input and re-runs the tripwire window, and a nondeterministic
    # source could diverge between the driver's W snapshot and the final
    # plan (r14 review-3 #4); released at the usual query boundary
    guarded = tracked_persist(guarded)
    totals = guarded.agg(F.sum(w).alias("W")).first()
    W = int(totals["W"] or 0)
    if W <= 0:
        raise ValueError(
            "allocate_crawl_budget: total weight must be positive "
            f"(got {W}) — apportioning zero mass is caller error"
        )
    if W > (2**55):
        # the bucket expression multiplies remainders (< W) by 256; the
        # per-host tripwire bounds B*w but not the TOTAL (r14 review-3
        # #2: three huge legal weights overflowed _rem*256 negative and
        # silently misrouted the leftover units). Scale weights down —
        # ppm-style measures keep W far below this.
        raise ValueError(
            f"allocate_crawl_budget: total weight {W} > 2^55 — the "
            "remainder bucketing would overflow int64; rescale weights"
        )
    base = F.expr(f"({b} * CAST({weight_col} AS BIGINT)) div {W}")
    rem = F.expr(f"({b} * CAST({weight_col} AS BIGINT)) % {W}")
    # 256 fixed remainder buckets (rem in [0, W)): the R-th-largest
    # boundary is located from a 256-row combinable count, never a
    # global sort (see docstring)
    bucket = F.expr(f"(_rem * 256) div {W}")
    with_parts = (
        guarded.withColumn("_base", base)
        .withColumn("_rem", rem)
        .withColumn("_rbk", bucket)
    )
    # ONE combinable pass yields both the leftover and the bucket counts
    # (r14 review-3 #5: separate agg + groupBy actions scanned twice)
    stats = with_parts.groupBy("_rbk").agg(
        F.count("*").alias("c"), F.sum("_base").alias("sb")
    ).collect()
    leftover = b - sum(int(r["sb"] or 0) for r in stats)
    out = with_parts
    if leftover > 0:
        counts = {r["_rbk"]: r["c"] for r in stats}
        cum, q = 0, -1
        for bk in sorted(counts, reverse=True):
            if cum + counts[bk] >= leftover:
                q = bk
                break
            cum += counts[bk]
        # buckets above q take their +1 with no rank consulted; bucket
        # q's rank comes from a window PARTITIONED BY BUCKET — 256
        # independent in-partition sorts (the point: no single global
        # reducer), though every bucket's rows do sort within their
        # partition; only bucket q's ranks are read
        in_q = F.col("_rbk") == q
        rrk = F.row_number().over(
            Window.partitionBy("_rbk").orderBy(
                F.col("_rem").desc(), F.col(host_col).asc()
            )
        )
        need = leftover - cum
        out = out.withColumn("_rrk", rrk).withColumn(
            "_plus",
            F.when(F.col("_rbk") > q, F.lit(1))
            .when(in_q & (F.col("_rrk") <= need), F.lit(1))
            .otherwise(F.lit(0)),
        )
    else:
        out = out.withColumn("_plus", F.lit(0))
    out = out.withColumn(
        "budget", F.col("_base") + F.col("_plus").cast("long")
    ).drop("_base", "_rem", "_rbk", "_rrk", "_plus")
    if cap_col is not None:
        out = out.withColumn(
            "budget", F.least(F.col("budget"), F.col(cap_col).cast("long"))
        )
    return out
