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
) -> DataFrame:
    """(item_a, item_b, n_txns) for unordered item pairs co-occurring in at
    least ``min_support`` transactions; ``item_a < item_b`` canonicalizes
    the pair. ``top`` keeps the most frequent pairs via a
    TakeOrderedAndProject heap (ties broken by the pair), never a global
    sort."""
    ti = df.select(
        F.col(txn_col).alias("_t"), F.col(item_col).alias("_i")
    ).distinct()
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
