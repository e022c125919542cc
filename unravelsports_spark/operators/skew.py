"""Skew mitigation: salted aggregation and salted broadcast-side join.

AQE's skew-join splitting (on in session.py) covers sort-merge joins at
runtime; these helpers cover the two cases AQE cannot fix:

- `salted_agg`: a hot grouping key (one team, one game, one language
  dominating a 100 TB corpus) overloads a single reducer. Two-phase
  aggregation over (key, salt) then key re-aggregates partial results —
  correct for any commutative-associative aggregate list.
- `salted_explode_join`: a broadcast-unfriendly dimension with hot keys:
  replicate each dim row `n_salts` times, salt the fact side uniformly, join
  on (key, salt) so one hot key spreads over n_salts reducers.

Salt is `pmod(hash(unique_col), n)` when a unique column exists (stable,
shuffle-free) or `floor(rand(seed) * n)` otherwise.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int, unique_col: str | None = None, seed: int = 7):
    salt = (
        F.pmod(F.hash(F.col(unique_col)), F.lit(n_salts))
        if unique_col is not None
        else F.floor(F.rand(seed) * n_salts).cast("int")
    )
    return df.withColumn("_salt", salt)


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    partial_aggs: Sequence[Column],
    final_aggs: Sequence[Column],
    n_salts: int = 16,
    unique_col: str | None = None,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    `partial_aggs` run per (keys, salt); `final_aggs` merge the partials per
    keys (e.g. partial `sum(x) as s` → final `sum(s) as total`). Spark's
    hash-agg already does map-side partial aggregation, so this only wins
    when a single key's *reduce* side is the bottleneck — i.e. true key skew,
    not just large groups.
    """
    salted = with_salt(df, n_salts, unique_col)
    partial = salted.groupBy(*keys, "_salt").agg(*partial_aggs)
    return partial.groupBy(*keys).agg(*final_aggs)


def salted_explode_join(
    fact: DataFrame,
    dim: DataFrame,
    on: Sequence[str],
    n_salts: int = 16,
    how: str = "inner",
    seed: int = 7,
) -> DataFrame:
    """Join where `dim`'s hot keys would skew a shuffle join: replicate dim
    across all salts (explode — dim must be the small side), salt fact
    uniformly, join on keys + salt."""
    dim_rep = dim.withColumn("_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))).withColumn(
        "_salt", F.col("_salt").cast("int")
    )
    fact_s = with_salt(fact, n_salts, seed=seed)
    out = fact_s.join(dim_rep, [*on, "_salt"], how)
    return out.drop("_salt")
