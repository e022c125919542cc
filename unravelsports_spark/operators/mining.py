"""Pattern-mining operators over transactional tables (engine additions,
SURVEY §2.12 — round-8 build, registered as driver queries in round 9):

- ``frequent_pairs``: frequent co-occurring item pairs with support
  filtering (the 2-itemset slice of market-basket / FP-growth analysis,
  exact and SQL-oracle-checkable — higher-order itemsets compose by
  joining pairs on a shared transaction, same shape).
- ``transition_counts``: first-order state-transition matrix over ordered
  per-key event sequences (the Markov-chain / user-path analysis rollup).

Both are exact-integer outputs, deterministic under any row order, and
shaped for 100 TB:

- ``frequent_pairs`` never builds an all-pairs product: the self-join
  meets inside one transaction, so a transaction with k items emits
  k·(k−1)/2 pair rows — bounded by the basket size (TPC-H: ≲7 lines per
  order), not the catalog. The (transaction, item) distinct and the pair
  count both combine map-side.
- ``transition_counts`` is one lag window per key (the w11 exchange
  shape) feeding a map-side-combinable count; no self-join, no collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def frequent_pairs(
    df: DataFrame,
    txn_col: str,
    item_col: str,
    min_support: int = 2,
    top: int | None = None,
    max_basket: int | None = None,
) -> DataFrame:
    """(item_a, item_b, n_txns) for unordered item pairs co-occurring in at
    least ``min_support`` transactions; ``item_a < item_b`` canonicalizes
    the pair. ``top`` keeps the most frequent pairs via a
    TakeOrderedAndProject heap (ties broken by the pair), never a global
    sort.

    ``max_basket`` is the skew guard (VERDICT r8 #4): pair fan-out is
    k·(k−1)/2 per transaction, so ONE malformed transaction with 10⁵ items
    in a 100 TB log would emit ~5·10⁹ rows onto a single join key. With a
    cap, transactions with more distinct items are dropped BEFORE the
    self-join (a map-side-combinable count + a broadcast-ready semi
    filter), bounding every txn's emission at cap·(cap−1)/2. Dropping —
    not truncating — keeps the output exact over the retained baskets
    (a truncated basket would systematically under-count its pairs).

    The distinct (txn, item) table is tracked_persist-ed: it feeds the
    guard aggregate AND both sides of the self-join, and without the
    cache each consumer re-runs the corpus scan + distinct end-to-end
    (r9 review finding — the d_jaccard capped-shingle discipline). The
    guard's count stage materializes the cache before the join stage
    reads it; the query-boundary eviction releases it."""
    from ..cache import tracked_persist

    ti = tracked_persist(
        df.select(
            F.col(txn_col).alias("_t"), F.col(item_col).alias("_i")
        ).distinct()
    )
    if max_basket is not None:
        ok = (
            ti.groupBy("_t")
            .agg(F.count("*").alias("_k"))
            .filter(F.col("_k") <= int(max_basket))
            .select("_t")
        )
        ti = ti.join(ok, "_t", "left_semi")
    a, b = ti.alias("a"), ti.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a._t") == F.col("b._t")) & (F.col("a._i") < F.col("b._i")),
        )
        .groupBy(
            F.col("a._i").alias("item_a"), F.col("b._i").alias("item_b")
        )
        .agg(F.count("*").alias("n_txns"))
        .filter(F.col("n_txns") >= min_support)
    )
    if top is not None:
        return pairs.orderBy(
            F.col("n_txns").desc(), "item_a", "item_b"
        ).limit(top)
    return pairs


def transition_counts(
    df: DataFrame,
    key_col: str,
    state_col: str,
    ts_col: str,
    id_col: str | None = None,
) -> DataFrame:
    """(from_state, to_state, n_transitions) over each key's event sequence
    ordered by (ts, id) — the ``id_col`` tie-break makes the matrix exact
    under timestamp collisions (the w11/a22 ordering discipline). Counts
    every consecutive pair, including self-transitions (A→A), so row sums
    equal events-per-key − 1."""
    order = [F.col(ts_col)] + ([F.col(id_col)] if id_col else [])
    w = Window.partitionBy(key_col).orderBy(*order)
    seq = df.select(
        F.col(key_col).alias("_k"),
        F.col(state_col).alias("_s"),
        F.lag(F.col(state_col)).over(w).alias("_prev"),
    )
    return (
        seq.filter(F.col("_prev").isNotNull())
        .groupBy(
            F.col("_prev").alias("from_state"), F.col("_s").alias("to_state")
        )
        .agg(F.count("*").alias("n_transitions"))
    )


def rolling_zscore_anomalies(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    window_days: int = 7,
    threshold: float = 3.0,
    min_history: int = 3,
) -> DataFrame:
    """Daily-count anomaly detection per key: each (key, day) count is
    scored against the trailing ``window_days`` OBSERVED days' mean/stddev
    (a ROWS frame over the key's activity days, current day excluded —
    the detector must not see the point it judges; for a key with gap
    days the baseline therefore spans more calendar time than
    ``window_days``, which is the intended behavior for sparse keys — a
    calendar-bounded baseline would have no history at all for them).
    Days with |count − mean| > threshold·std flag as anomalies; days with
    fewer than ``min_history`` trailing observations or zero variance
    never flag (cold-start / constant series guard).

    Output: (key, day_ms, n_events, mean_prev, std_prev, zscore,
    is_anomaly) with floats rounded to 6 (the cross-engine float
    discipline; mean/std/z are the only non-integers).

    Scale shape: the event log reduces to per-(key, day) counts FIRST
    (one map-side-combinable shuffle); the rolling window then runs over
    that tiny table partitioned BY KEY — a bounded rows-frame window, no
    self-join, no global sort. Observed days only (a silent day
    contributes no row — matching the SQL twin exactly; gap-filling is
    w9_interpolate_gaps' job)."""
    day = F.date_trunc("day", F.col(ts_col)).cast("date")
    counts = (
        df.select(F.col(key_col).alias("_k"), day.alias("_day"))
        .groupBy("_k", "_day")
        .agg(F.count("*").alias("n_events"))
    )
    w = (
        Window.partitionBy("_k")
        .orderBy("_day")
        .rowsBetween(-int(window_days), -1)
    )
    stats = counts.select(
        "_k",
        "_day",
        "n_events",
        F.count("n_events").over(w).alias("_n_prev"),
        F.round(F.avg("n_events").over(w), 6).alias("mean_prev"),
        F.round(F.coalesce(F.stddev_samp("n_events").over(w), F.lit(0.0)), 6).alias(
            "std_prev"
        ),
    )
    z = F.round(
        (F.col("n_events") - F.col("mean_prev")) / F.col("std_prev"), 6
    )
    scored = stats.select(
        F.col("_k").alias(key_col),
        F.unix_millis(F.col("_day").cast("timestamp")).alias("day_ms"),
        "n_events",
        "mean_prev",
        "std_prev",
        F.when(
            (F.col("_n_prev") >= min_history) & (F.col("std_prev") > 0), z
        ).alias("zscore"),
    )
    return scored.withColumn(
        "is_anomaly",
        F.coalesce(F.abs(F.col("zscore")) > F.lit(float(threshold)), F.lit(False)),
    )
