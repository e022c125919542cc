"""Corpus-filtering operators for training-data pipelines: repetition-based
quality signals (the Gopher/MassiveText family of filters), PII scrubbing,
URL normalization/domain extraction, and benchmark-contamination detection.

All pure Catalyst (whole-stage codegen, no Python in the hot path); regex
patterns are restricted to the syntax Java regex and RE2/DuckDB share, so
every operator has an exact DuckDB oracle (plans/pipeline.py).

Scale posture: repetition stats are per-row folds (no shuffle); PII/URL ops
are projections; contamination is a shingle semi-join — the benchmark side is
tiny (broadcast), the corpus side streams.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import doc_shingles

#: conservative patterns valid in both Java regex (Spark) and RE2 (DuckDB)
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+?[0-9][0-9()\-. ]{6,}[0-9]"


def _tokens(text_col) -> F.Column:
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.split(F.trim(F.lower(c)), r"\s+")


def with_repetition_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style repetition signals, per document:

    - ``dup_token_ratio``: 1 − distinct/total tokens;
    - ``top_bigram_ratio``: occurrences of the most frequent word 2-gram over
      all 2-grams — computed as the longest equal-run in the SORTED gram list
      via a single ``aggregate`` fold (runs of equals in a sorted list ARE the
      frequencies), so the whole signal is one projection, no shuffle, no UDF.
    """
    toks = _tokens(text_col)
    n = F.size(toks)
    dup_ratio = F.when(n > 0, F.round(1 - F.size(F.array_distinct(toks)) / n, 6)).otherwise(0.0)

    idx = F.when(n >= 2, F.sequence(F.lit(0), n - 2)).otherwise(F.array().cast("array<int>"))
    grams = F.array_sort(F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, 2))))
    zero = F.struct(
        F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
    )
    run = F.aggregate(
        grams,
        zero,
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                acc["best"],
                F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    top_ratio = F.when(F.size(grams) > 0, F.round(run / F.size(grams), 6)).otherwise(0.0)
    return df.withColumn("dup_token_ratio", dup_ratio).withColumn("top_bigram_ratio", top_ratio)


def scrub_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Redact emails/phone numbers; adds ``n_emails`` / ``n_phones`` counts
    (measured BEFORE redaction) and rewrites ``text_col`` with ``<EMAIL>`` /
    ``<PHONE>`` placeholders. Order matters: emails first, so the phone
    pattern cannot eat digit runs inside already-redacted spans."""
    c = F.col(text_col)
    df = df.withColumn("n_emails", F.size(F.regexp_extract_all(c, F.lit(EMAIL_RE), F.lit(0))))
    df = df.withColumn(
        "n_phones",
        F.size(
            F.regexp_extract_all(
                F.regexp_replace(c, EMAIL_RE, "<EMAIL>"), F.lit(PHONE_RE), F.lit(0)
            )
        ),
    )
    scrubbed = F.regexp_replace(
        F.regexp_replace(c, EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
    )
    return df.withColumn(text_col, scrubbed)


def with_url_parts(df: DataFrame, url_col: str = "url") -> DataFrame:
    """``domain`` (lowercased host) + ``url_norm`` (scheme+host lowercased,
    query/fragment stripped, trailing slash trimmed) — the canonical key for
    URL-level dedup. Regex-based so the DuckDB oracle is identical
    (Spark's parse_url has no DuckDB twin)."""
    c = F.col(url_col)
    host = F.lower(F.regexp_extract(c, r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)", 1))
    path = F.regexp_extract(c, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+([^?#]*)", 1)
    scheme = F.lower(F.regexp_extract(c, r"^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    norm = F.concat(
        scheme, F.lit("://"), host, F.regexp_replace(path, r"/+$", "")
    )
    return df.withColumn("domain", host).withColumn("url_norm", norm)


def contaminated_docs(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
) -> DataFrame:
    """Docs sharing at least one word n-gram with the benchmark set (the
    standard decontamination screen). Shingle the benchmark (tiny → its
    distinct hash set broadcasts), semi-join the corpus shingles, return
    distinct contaminated ids. One shuffle for the corpus distinct; the join
    is broadcast."""
    bench = doc_shingles(benchmark, id_col=id_col, text_col=text_col, n=n).select(
        "shingle_hash"
    ).distinct()
    corp = doc_shingles(corpus, id_col=id_col, text_col=text_col, n=n)
    return (
        corp.join(F.broadcast(bench), on="shingle_hash", how="left_semi")
        .select(id_col)
        .distinct()
    )
