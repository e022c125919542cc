"""Boilerplate line removal (engine addition §2.12; built round 11, driver
registration round 12) — the jusText/CCNet-class structural cleaning stage:
lines that repeat across many documents of one source (navigation menus,
footers, cookie banners, license headers) are template text, not content.
Web-crawl pipelines strip them BEFORE fingerprinting and quality scoring —
left in, boilerplate inflates near-dup similarity between unrelated pages
of a site (every pair shares the footer shingles) and drags quality
signals toward the template.

Detection rule (the CCNet paragraph-dedup recipe, applied at line
granularity per source): a line is boilerplate when it appears in at
least ``max(min_docs, ceil(min_frac · n_docs(source)))`` DISTINCT
documents of its source. Content lines are document-specific, so their
doc-frequency is ~1; template lines track the source's size.

Scale shape (pure Catalyst — no UDF anywhere):
- doc-frequency: one explode + a DISTINCT (source, line, doc) collapse +
  a combinable count — the two-phase discipline, no Expand from a
  COUNT(DISTINCT) aggregate.
- flags: joined to per-source doc totals (broadcast — one row per
  source); the flag table is boilerplate-sized, BROADCAST back to the
  exploded corpus, so stripping adds zero shuffles beyond the per-doc
  reassembly aggregate.
- reassembly: collect_list of (pos, line) structs with boilerplate lines
  nulled out (collect_list drops nulls), array_sort for in-doc order,
  concat_ws — deterministic under any partitioning.

NULL-text contract (ADVICE r11 #2, pinned in tests): a document whose
``text_col`` is NULL produces ZERO exploded lines (``split(NULL)`` is
NULL and ``posexplode`` of NULL yields no rows), so it VANISHES from
every output here — no flags contribution, no per-doc counters row. The
DuckDB twin agrees exactly (``string_split(NULL)`` unnests to nothing),
which is what makes the silent drop easy to miss. Callers whose corpus
can carry NULL text and who need those docs in the accounting must
``coalesce(text, '')`` BEFORE calling (an empty-string doc yields one
empty line and a counters row); the registered query's corpus is
NULL-free by construction (``concat_ws`` never returns NULL).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _sep_pattern(sep: str) -> str:
    """``F.split`` takes a REGEX while the DuckDB twin's ``string_split``
    is literal — a separator like ``.`` would silently desynchronize the
    engines (and split on everything). Escape to literal semantics;
    ``\\n``/``\\t`` pass through (regex-identical and more readable in
    plans)."""
    return sep if sep in ("\n", "\t") else re.escape(sep)


def line_doc_freq(
    docs: DataFrame,
    id_col: str = "doc_id",
    source_col: str = "source",
    text_col: str = "text",
    sep: str = "\n",
) -> DataFrame:
    """(source, line, doc_freq): in how many DISTINCT documents of its
    source each line appears. Two-phase: distinct triples first (map-side
    combinable), then a plain count — never COUNT(DISTINCT)'s Expand."""
    lines = docs.select(
        F.col(source_col).alias("source"),
        F.col(id_col).alias("_id"),
        F.explode(F.split(F.col(text_col), _sep_pattern(sep))).alias("line"),
    )
    return (
        lines.distinct()
        .groupBy("source", "line")
        .agg(F.count("*").alias("doc_freq"))
    )


def boilerplate_flags(
    docs: DataFrame,
    min_frac: float = 0.3,
    min_docs: int = 5,
    id_col: str = "doc_id",
    source_col: str = "source",
    text_col: str = "text",
    sep: str = "\n",
) -> DataFrame:
    """The per-source boilerplate line set: doc_freq ≥ max(min_docs,
    ceil(min_frac · n_docs)). Totals broadcast (one row per source); the
    output is template-sized."""
    freq = line_doc_freq(docs, id_col, source_col, text_col, sep)
    tot = docs.groupBy(F.col(source_col).alias("source")).agg(
        F.count("*").alias("_n_docs")
    )
    thr = F.greatest(
        F.lit(int(min_docs)), F.ceil(F.lit(float(min_frac)) * F.col("_n_docs"))
    )
    return (
        freq.join(F.broadcast(tot), "source")
        .where(F.col("doc_freq") >= thr)
        .select("source", "line", "doc_freq")
    )


def strip_boilerplate(
    docs: DataFrame,
    flags: DataFrame,
    id_col: str = "doc_id",
    source_col: str = "source",
    text_col: str = "text",
    sep: str = "\n",
) -> DataFrame:
    """Per document: ``lines_before``, ``lines_after``, ``raw_chars``
    (= Σ len(line) + lines_before − 1 for a 1-char separator — the exact
    pre-strip text length), and ``clean_text`` (non-boilerplate lines in
    original order, ''-valued when every line was template). The flag
    join is BROADCAST (template-sized right side); the only corpus-sized
    exchange is the per-doc reassembly aggregate."""
    if len(sep) != 1:
        raise ValueError("strip_boilerplate assumes a 1-char separator")
    lines = docs.select(
        F.col(id_col).alias("_id"),
        F.col(source_col).alias("source"),
        F.posexplode(F.split(F.col(text_col), _sep_pattern(sep))).alias("pos", "line"),
    )
    flagged = lines.join(
        F.broadcast(flags.select("source", "line").withColumn("_bp", F.lit(True))),
        ["source", "line"],
        "left",
    )
    keep_struct = F.when(F.col("_bp").isNull(), F.struct("pos", "line"))
    return (
        flagged.groupBy(F.col("_id").alias(id_col), "source")
        .agg(
            F.count("*").alias("lines_before"),
            F.sum(F.col("_bp").isNull().cast("long")).alias("lines_after"),
            (F.sum(F.length("line")) + F.count("*") - 1).alias("raw_chars"),
            F.concat_ws(
                sep,
                F.transform(
                    F.array_sort(F.collect_list(keep_struct)), lambda x: x["line"]
                ),
            ).alias("clean_text"),
        )
    )
