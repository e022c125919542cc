"""Boilerplate line removal (operators/boilerplate.py) — built round 11,
driver registration round 12 (the r11 window is slot-exact at 47 p0 + the
three stale rows-only checks). BOILERPLATE_SQL verified here is the r12
`t_boilerplate_strip` oracle; `_boilerplate_query` is the query shape that
will move to the plans registry at registration."""

from pyspark.sql import functions as F

from .conftest import SF_CORRECT

# the exact SQL twin for the r12 `t_boilerplate_strip` registration —
# per-source footer injected into ~half of each source's docs — keyed by
# (doc_id // 20) % 2 because source IS doc_id % 20, so plain parity would be
# constant per source (found the hard way: src1 got zero footers) — and a
# unique note into the rest (doc-frequency 1, must never flag); the
# fingerprint sum pins the exact reassembled bytes
BOILERPLATE_SQL = """
    WITH aug AS (
      SELECT doc_id, source,
             text || chr(10) ||
             CASE WHEN (doc_id // 20) % 2 = 0
                  THEN 'visit the ' || source || ' portal today'
                  ELSE 'unique note ' || CAST(doc_id AS VARCHAR) END AS text
      FROM documents),
    lines AS (
      SELECT doc_id, source, parts[u.i] AS line, u.i AS pos
      FROM (SELECT doc_id, source, string_split(text, chr(10)) AS parts FROM aug),
           unnest(range(1, len(parts) + 1)) AS u(i)),
    freq AS (
      SELECT source, line, COUNT(*) AS doc_freq
      FROM (SELECT DISTINCT source, line, doc_id FROM lines) GROUP BY 1, 2),
    tot AS (SELECT source, COUNT(*) AS n_docs FROM aug GROUP BY 1),
    bp AS (SELECT f.source, f.line FROM freq f JOIN tot t USING (source)
           WHERE doc_freq >= GREATEST(5, CAST(CEIL(0.3 * n_docs) AS BIGINT))),
    flagged AS (
      SELECT l.doc_id, l.source, l.line, l.pos,
             (b.line IS NOT NULL) AS is_bp
      FROM lines l LEFT JOIN bp b ON l.source = b.source AND l.line = b.line),
    per_doc AS (
      SELECT doc_id, source,
             COUNT(*) AS lines_before,
             SUM(CASE WHEN is_bp THEN 0 ELSE 1 END) AS lines_after,
             SUM(length(line)) + COUNT(*) - 1 AS raw_chars,
             COALESCE(string_agg(CASE WHEN is_bp THEN NULL ELSE line END,
                                 chr(10) ORDER BY pos), '') AS clean_text
      FROM flagged GROUP BY 1, 2)
    SELECT source, COUNT(*) AS n_docs,
           CAST(SUM(lines_before) AS BIGINT) AS lines_before,
           CAST(SUM(lines_after) AS BIGINT) AS lines_after,
           CAST(SUM(raw_chars) AS BIGINT) AS chars_before,
           CAST(SUM(length(clean_text)) AS BIGINT) AS chars_after,
           CAST(SUM(CAST(('0x' || substring(md5(clean_text), 1, 8)) AS BIGINT))
             AS BIGINT) AS fp_sum
    FROM per_doc GROUP BY source
"""


def _boilerplate_query(spark, sf_dir):
    """The r12 t_boilerplate_strip query shape: footer injection in
    Catalyst, flags at min_frac=0.3/min_docs=5, strip, per-source rollup
    with the reassembled-bytes fingerprint sum inside the hash."""
    from unravelsports_spark.operators.boilerplate import (
        boilerplate_flags,
        strip_boilerplate,
    )
    from unravelsports_spark.session import read_table

    docs = read_table(spark, sf_dir, "documents")
    footer = F.when(
        F.expr("(doc_id div 20) % 2 = 0"),
        F.concat(F.lit("visit the "), F.col("source"), F.lit(" portal today")),
    ).otherwise(F.concat(F.lit("unique note "), F.col("doc_id").cast("string")))
    aug = docs.select(
        "doc_id", "source", F.concat_ws("\n", "text", footer).alias("text")
    )
    stripped = strip_boilerplate(aug, boilerplate_flags(aug))
    fp = F.conv(F.substring(F.md5("clean_text"), 1, 8), 16, 10).cast("long")
    return stripped.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("lines_before").alias("lines_before"),
        F.sum("lines_after").alias("lines_after"),
        F.sum("raw_chars").alias("chars_before"),
        F.sum(F.length("clean_text")).alias("chars_after"),
        F.sum(fp).alias("fp_sum"),
    )


def test_boilerplate_strip_matches_duckdb(spark, duck):
    got = sorted(map(tuple, _boilerplate_query(spark, SF_CORRECT).collect()))
    want = sorted(map(tuple, duck.execute(BOILERPLATE_SQL).fetchall()))
    assert got == want and len(got) == 20
    # the footer must genuinely be detected and removed in every source
    for src, n_docs, before, after, *_ in got:
        assert before - after > 0, (src, before, after)


def test_flags_threshold_and_uniqueness(spark):
    """A footer in 6/8 docs of a source is flagged (≥ max(5, ceil(2.4)));
    one in 4/8 is not (< 5); unique lines never flag; a second source's
    docs never contribute to the first's threshold."""
    from unravelsports_spark.operators.boilerplate import boilerplate_flags

    rows = []
    for i in range(8):
        foot = "shared footer" if i < 6 else "rare footer"
        sub = "subfooter" if i < 4 else "other"
        rows.append((i, "A", f"body {i}\n{foot}\n{sub}"))
    for i in range(8, 12):
        rows.append((i, "B", "body\nshared footer"))  # only 4 B-docs: < min_docs
    df = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    flags = {(r["source"], r["line"]) for r in boilerplate_flags(df).collect()}
    assert ("A", "shared footer") in flags
    assert ("A", "rare footer") not in flags  # 2 docs < 5
    assert ("A", "subfooter") not in flags  # 4 docs < min_docs=5
    assert ("B", "shared footer") not in flags  # 4 B docs < 5
    assert not any(line.startswith("body") for _, line in flags)


def test_strip_preserves_order_and_empty_docs(spark):
    """Kept lines stay in original order; a document that is ALL template
    strips to '' (and still appears in the output with its counters)."""
    from unravelsports_spark.operators.boilerplate import strip_boilerplate

    docs = spark.createDataFrame(
        [
            (0, "A", "first\nFOOT\nsecond\nthird"),
            (1, "A", "FOOT"),
        ],
        ["doc_id", "source", "text"],
    )
    flags = spark.createDataFrame([("A", "FOOT", 9)], ["source", "line", "doc_freq"])
    got = {r["doc_id"]: r for r in strip_boilerplate(docs, flags).collect()}
    assert got[0]["clean_text"] == "first\nsecond\nthird"
    assert (got[0]["lines_before"], got[0]["lines_after"]) == (4, 3)
    assert got[0]["raw_chars"] == len("first\nFOOT\nsecond\nthird")
    assert got[1]["clean_text"] == "" and got[1]["lines_after"] == 0


def test_null_text_docs_vanish_from_accounting(spark):
    """The NULL-text contract (ADVICE r11 #2): a NULL-text doc yields zero
    exploded lines and so appears in NEITHER flags nor per-doc output —
    while a ''-text doc yields one empty line and a counters row. Callers
    needing NULL docs in the accounting coalesce first; this pins both
    sides of that boundary so the silent drop can't go unnoticed."""
    from pyspark.sql import types as T

    from unravelsports_spark.operators.boilerplate import (
        boilerplate_flags,
        strip_boilerplate,
    )

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("source", T.StringType()),
            T.StructField("text", T.StringType()),
        ]
    )
    docs = spark.createDataFrame(
        [(0, "A", "body\nFOOT"), (1, "A", None), (2, "A", "")], schema
    )
    flags = spark.createDataFrame([("A", "FOOT", 9)], ["source", "line", "doc_freq"])
    got = {r["doc_id"]: r for r in strip_boilerplate(docs, flags).collect()}
    assert set(got) == {0, 2}  # doc 1 (NULL text) vanished
    assert (got[2]["lines_before"], got[2]["clean_text"]) == (1, "")
    # and the NULL doc contributes nothing to doc-frequency either:
    n_docs_seen = {
        r["source"]: r["doc_freq"]
        for r in boilerplate_flags(docs, min_frac=0.0, min_docs=1)
        .where(F.col("line") == "body")
        .collect()
    }
    assert n_docs_seen == {"A": 1}


def test_plan_no_expand_broadcast_flags(spark):
    """Scale shape: the doc-frequency path has no Expand (two-phase
    distinct-then-count, never COUNT(DISTINCT)); the flag join back onto
    the exploded corpus is a BroadcastHashJoin."""
    from unravelsports_spark.operators.boilerplate import (
        boilerplate_flags,
        strip_boilerplate,
    )
    from unravelsports_spark.session import read_table

    docs = read_table(spark, SF_CORRECT, "documents")
    out = strip_boilerplate(docs, boilerplate_flags(docs))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in plan
    assert "BroadcastHashJoin" in plan
