"""CSV corpus source/sink (engine addition §2.1 surface; built round 11,
driver registration queued r13) — the other interchange format crawl and
annotation pipelines ship documents in (metadata dumps, spreadsheet
exports, label vendor returns). Spark-first like sources/jsonl.py:

- :func:`write_csv`: `df.write.csv` with RFC-4180 quoting — quote and
  ESCAPE are both `"` (doubled-quote escaping), not Spark's backslash
  default, so the shards are readable by DuckDB/pandas/Excel and survive
  embedded commas and quotes byte-exactly. One shard per partition.
- :func:`read_csv`: explicit schema (never the double-scan inference pass)
  in PERMISSIVE mode with a `_corrupt_record` quarantine — a malformed
  line (bad number, broken quoting) surfaces whole instead of failing the
  job or vanishing. :func:`~unravelsports_spark.sources.jsonl.
  quarantine_counts` works on the result unchanged (same column contract).

Scale caveat the API makes explicit: records with EMBEDDED NEWLINES need
``multi_line=True``, and multiLine CSV parses each FILE as one unsplittable
unit (the parser cannot resync mid-file), so a 100 TB export that needs it
should prefer JSONL (sources/jsonl.py) or many small shards. The default
(multi_line=False) keeps every shard line-splittable — newline-free
corpora (or JSON-escaped text columns) pay nothing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from .jsonl import DOC_SCHEMA  # the shared (doc_id, source, text) contract

#: RFC-4180 dialect: doubled-quote escaping, header row per shard.
#: ignore*WhiteSpace are EXPLICIT on both sides because their defaults
#: disagree (write trims boundary whitespace by default, read does not) —
#: found by the round-trip oracle: '  padded ends  ' lost its trailing
#: spaces and flipped the fingerprint sum.
_CSV_OPTS = {
    "header": "true",
    "quote": '"',
    "escape": '"',
    "ignoreLeadingWhiteSpace": "false",
    "ignoreTrailingWhiteSpace": "false",
}


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Write as sharded RFC-4180 CSV (one file per partition, header per
    shard, doubled-quote escaping)."""
    df.write.mode(mode).options(**_CSV_OPTS).csv(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType = DOC_SCHEMA,
    multi_line: bool = False,
) -> DataFrame:
    """Schema'd PERMISSIVE read with a quarantine column: well-formed rows
    parse into ``schema``; a malformed line surfaces whole in
    ``_corrupt_record`` with NULL data columns. ``multi_line=True`` only
    for records with embedded newlines (see the module scale caveat)."""
    full = T.StructType(
        schema.fields + [T.StructField("_corrupt_record", T.StringType())]
    )
    return (
        spark.read.schema(full)
        .options(**_CSV_OPTS)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .option("multiLine", str(bool(multi_line)).lower())
        .csv(path)
    )
