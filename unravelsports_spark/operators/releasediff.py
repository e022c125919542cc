"""Corpus release diff (engine addition §2.12; built round 12, driver
registration queued r13 as `d_release_diff`) — the release-auditing stage
between two corpus versions: before shipping release N+1, a training-data
team answers "what changed since N" (docs added / removed / modified /
unchanged, and how much text moved, per source). Without it a pipeline
regression — a filter silently eating a source, an extraction change
rewriting half the corpus — ships unnoticed; with it the release note is
a query.

Spark-first shape (pure Catalyst, exactly SQL-certifiable):
- each side reduces to (id, source, fingerprint, chars) AT THE SCAN — the
  md5 fingerprint replaces carrying text through the join, so the one
  shuffle moves ~50 bytes/doc regardless of document size (the
  operators/dedup.py fingerprint discipline);
- ONE full-outer join on the id (both sides hash-partition the same key —
  co-partitioned, no broadcast needed at any scale; at 100 TB bucket both
  releases by id and the exchange disappears);
- status is a null/fingerprint case projection; the report is one
  map-side-combinable rollup per (source, status).

Contract notes:
- PRECONDITION: the id is UNIQUE and NON-NULL within each release (the
  documents-table invariant). SELF-ENFORCED since r13 (VERDICT r12 #4):
  a duplicated or NULL id fails the query LOUDLY via an assert_true
  tripwire folded into each side's projection — it would otherwise fan
  out through the full-outer join and silently inflate the counts (a
  NULL id never matches its counterpart under SQL join semantics and
  would report an unchanged doc as one added + one removed). The
  tripwire is free at scale: its per-id count window needs exactly the
  hashpartitioning+sort the join needs, so the exchange is reused
  (plan-guarded). Clean releases first with exact_dedup / a
  ``groupBy(id).count()`` audit when the invariant isn't guaranteed.
- "modified" means the FINGERPRINT changed (byte-level). Pair with
  textnorm + extract_html_text upstream when semantic identity should
  survive cosmetic change — the same reasoning as the dedup keys.
- a doc whose SOURCE changed but text didn't reports as modified=False
  under its NEW source (the join is by id; source is an attribute). The
  report takes source from the side that has it (new wins when both do).
- NULL text fingerprints as the sentinel ``'null'`` (never a valid md5
  hex), so NULL↔''-and-anything-else transitions ALL report as modified
  — a doc whose text went NULL is reported, never a silent dropout and
  never conflated with an empty document (r12 review: a plain
  coalesce-to-'' fingerprint made ''↔NULL invisible).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _keyed(df: DataFrame, id_col: str, source_col: str, text_col: str, tag: str):
    t = F.col(text_col)
    # md5 propagates NULL, coalesced to the 'null' sentinel (not a valid
    # md5 hex): distinct from md5('') so ''↔NULL is a modification, and
    # non-null so the join's added/removed detection stays sound
    fp = F.coalesce(F.md5(t), F.lit("null"))
    keyed = df.select(
        F.col(id_col).alias("_id"),
        F.col(source_col).alias(f"_src_{tag}"),
        fp.alias(f"_fp_{tag}"),
        F.length(F.coalesce(t, F.lit(""))).alias(f"_chars_{tag}"),
    )
    # precondition tripwire (VERDICT r12 #4, the q1 assert_true shape): a
    # duplicated or NULL id now fails LOUD instead of fanning out through
    # the full-outer join and silently inflating the release note. FREE at
    # scale: the per-id count window requires hashpartitioning(_id) + sort
    # by _id — exactly the distribution and ordering the SortMergeJoin
    # needs anyway, so EnsureRequirements reuses the one exchange/sort pair
    # per side (plan-guarded in tests: still exactly 2 exchanges). The
    # guard rides a FILTER, not a projected column (r13 review #2: a guard
    # folded into _chars_{tag} vanished under column pruning the moment a
    # caller selected only doc_id/status — a Filter predicate is evaluated
    # for every row no matter what the caller projects). assert_true
    # yields NULL on the happy path → coalesce(…, true) passes every row;
    # a violation throws before the join ever fans out.
    from . import precondition_filter

    counted = keyed.withColumn(
        "_dupcnt", F.count("*").over(Window.partitionBy("_id"))
    )
    return precondition_filter(
        counted,
        F.col("_id").isNotNull() & (F.col("_dupcnt") == 1),
        f"release_diff precondition: duplicate or NULL {tag}-release "
        f"id — audit id uniqueness upstream (groupBy(id).count() or "
        f"exact_dedup) before diffing",
    ).drop("_dupcnt")


def release_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-doc diff of two releases: (doc_id, source, status,
    chars_old, chars_new) with status ∈ added | removed | modified |
    unchanged. One co-partitioned full-outer join on the id; fingerprints
    computed at the scan so text never shuffles."""
    o = _keyed(old, id_col, source_col, text_col, "old")
    n = _keyed(new, id_col, source_col, text_col, "new")
    j = o.join(n, "_id", "full_outer")
    status = (
        F.when(F.col("_fp_old").isNull(), F.lit("added"))
        .when(F.col("_fp_new").isNull(), F.lit("removed"))
        .when(F.col("_fp_old") == F.col("_fp_new"), F.lit("unchanged"))
        .otherwise(F.lit("modified"))
    )
    return j.select(
        F.col("_id").alias(id_col),
        F.coalesce(F.col("_src_new"), F.col("_src_old")).alias(source_col),
        status.alias("status"),
        F.coalesce(F.col("_chars_old"), F.lit(0)).alias("chars_old"),
        F.coalesce(F.col("_chars_new"), F.lit(0)).alias("chars_new"),
    )


def release_diff_report(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """The release note: per (source, status) — n_docs, chars_old,
    chars_new, chars_delta — ordered for the certified hash. Tiny output
    (sources × 4 rows); one combinable rollup over :func:`release_diff`."""
    d = release_diff(old, new, id_col, source_col, text_col)
    return (
        d.groupBy(source_col, "status")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("chars_old").alias("chars_old"),
            F.sum("chars_new").alias("chars_new"),
            F.sum(F.col("chars_new") - F.col("chars_old")).alias("chars_delta"),
        )
        .orderBy(source_col, "status")
    )
